"""Deterministic hashed bag-of-words text embeddings.

The classic signed-feature-hashing trick (Weinberger et al. 2009, the
fastText input layer): every token hashes to one of ``dim`` buckets with
a +/-1 sign, a document's vector is the L2-normalized signed bucket-count
vector. Inner products then approximate token-overlap similarity, which
is exactly what embedding-based near-dedup needs — so this module turns
any text column into an ``array<double>`` that the ANN / SemDeDup stack
(:mod:`functions.similarity`, :mod:`functions.cluster`) can consume with
NO external model, at crawl scale.

Pinned contract (engine-independent; a SQL oracle reproduces it exactly):

- tokens: the module rule shared with :mod:`functions.text` — trim +
  lower + split on ``\\s+``; NULL/blank text -> NULL embedding and
  ``n_tokens`` 0;
- bucket(t)  = first 28 bits of md5(t) (7 hex chars) mod ``dim``;
- sign(t)    = +1 if the 8th hex nibble of md5(t) is even else -1;
- v[b]       = sum of sign(t) over tokens with bucket(t) = b (raw
  counts, so repeated tokens accumulate);
- embedding  = v / ||v||_2, each component rounded to 6 decimals; a
  zero-norm v (signs cancelled exactly) stays the all-zero vector.

Scale shape: the whole computation is ONE Exchange-free projection —
the signed bucket accumulation runs in-row with higher-order functions
(O(n_tokens * dim) codegen work per row, no explode, no shuffle, no
UDF), so embedding a 100-TB corpus is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hashed_ngram_embedding(df: DataFrame, text_col: str,
                           out_col: str = "embedding",
                           dim: int = 64) -> DataFrame:
    """Attach the pinned hashed bag-of-words embedding of ``text_col``.

    STAGED projection (the repo-wide lesson — Catalyst does not CSE a
    multi-referenced subexpression, and CollapseProject keeps stages
    apart when the staged alias is non-cheap and referenced more than
    once): stage 1 trims/lowers once, stage 2 builds the signed bucket
    accumulator once (hash staged once per token inside the lambda
    chain), stage 3 its norm once, stage 4 normalizes — so the
    O(n_tokens * dim) accumulator is computed exactly once per row."""
    if dim < 1:
        raise ValueError("hashed_ngram_embedding: dim must be >= 1")
    if out_col in df.columns:
        raise ValueError(f"hashed_ngram_embedding: column {out_col!r} exists")
    zeros = F.array_repeat(F.lit(0.0), dim)
    s1 = df.withColumn("__hne_t", F.trim(F.lower(F.col(text_col))))
    hashes = F.transform(F.split(F.col("__hne_t"), r"\s+"),
                         lambda tok: F.md5(tok))
    pairs = F.transform(
        hashes,
        lambda h: F.struct(
            (F.conv(F.substring(h, 1, 7), 16, 10).cast("bigint")
             % dim).alias("b"),
            F.when(
                F.conv(F.substring(h, 8, 1), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)).alias("s"),
        ),
    )
    s2 = s1.withColumn(
        "__hne_acc",
        F.aggregate(
            pairs,
            zeros,
            lambda a, p: F.transform(
                a,
                lambda v, i: v + F.when(p["b"] == i.cast("bigint"),
                                        p["s"]).otherwise(F.lit(0.0)),
            ),
        ),
    )
    s3 = s2.withColumn(
        "__hne_norm",
        F.sqrt(F.aggregate(F.col("__hne_acc"), F.lit(0.0),
                           lambda s, v: s + v * v)),
    )
    acc, norm = F.col("__hne_acc"), F.col("__hne_norm")
    out = F.when(
        F.col(text_col).isNull() | (F.col("__hne_t") == ""), F.lit(None)
    ).when(norm == 0.0, acc).otherwise(
        F.transform(acc, lambda v: F.round(v / norm, 6))
    )
    return s3.withColumn(out_col, out).drop("__hne_t", "__hne_acc",
                                            "__hne_norm")


def semantic_dedup_text(df: DataFrame, id_col: str, text_col: str,
                        dim: int = 64, k: int = 8, iters: int = 1,
                        tau: float = 0.9,
                        score_col: str | None = None) -> DataFrame:
    """End-to-end SemDeDup over RAW TEXT: hashed embeddings (this module)
    -> k-means clusters -> within-cluster cosine drops
    (:func:`functions.cluster.semantic_dedup`). Rows with NULL/blank text
    never enter the pair space (absent content is not duplication
    evidence) and are always kept. The embedding column is internal —
    the output is the input rows that survive."""
    from nail_parquet_spark.functions.cluster import semantic_dedup

    emb = hashed_ngram_embedding(df, text_col, out_col="__emb", dim=dim)
    with_vec = emb.filter(F.col("__emb").isNotNull())
    kept_ids = semantic_dedup(
        with_vec, id_col, "__emb", k=k, iters=iters, tau=tau,
        score_col=score_col,
    ).select(F.col(id_col).alias("__keep"))
    no_vec = df.join(
        emb.filter(F.col("__emb").isNull()).select(id_col),
        id_col, "left_semi",
    )
    survivors = df.join(
        kept_ids, df[id_col] == F.col("__keep"), "left_semi")
    return survivors.unionByName(no_vec)
