"""Hashed linear text classification — the fastText-style model-based
quality filter modern web pipelines (CCNet, DCLM, FineWeb-Edu) run after
rule-based gating: score = sigmoid(bias + mean over tokens of w[h(token)])
with hashed bag-of-words features.

The model is DATA, not code: a weights table (feature_id, weight) trained
offline lands as a DataFrame (parquet/CSV), so serving is pure Spark —
tokenize (split), hash each token into the feature space, join the
broadcast weights, and aggregate per document. No Python in the hot
path, no UDF: one in-partition explode, one broadcast hash join, one
doc-keyed partial aggregate.

The feature hash is part of the MODEL CONTRACT (training and serving
must produce identical ids in any language), so it is pinned to the
md5-derived 28-bit rule the dedup/mixing stack already uses —
``('0x'||substr(md5(token),1,7)) % dim`` — reproducible in Spark, DuckDB,
Python, or a trainer's own code, unlike engine-private hashes.

At 100 TB the weights side is tiny (2^18-2^22 rows) and broadcast
explicitly; the fact side never shuffles except the final doc-keyed
combine, which partial-aggregates map-side. Out-of-vocabulary hashes
contribute 0 via the left join's null-coalesce — identical to a dense
weight vector with zeros.

Pinned scoring contract (mirrored by the DuckDB oracle): tokens are the
lowercased whitespace-split non-empty pieces; feature id =
conv(substr(md5(token),1,7), 16, 10) % dim; logit = bias + sum(w)/n_tokens
(mean pooling; empty docs score sigmoid(bias)); score = 1/(1+exp(-logit)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hashed_features(col, dim: int):
    """Array of feature ids for a text column: lowercased whitespace
    tokens -> 28-bit md5 prefix mod dim (the pinned portable rule).
    In-row, codegen-friendly."""
    toks = F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")
    return F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 1, 7), 16, 10)
            .cast("long"),
            F.lit(dim)))


def linear_text_classifier(df: DataFrame, id_col: str, text_col: str,
                           weights: DataFrame, dim: int,
                           bias: float = 0.0,
                           feature_col: str = "feature_id",
                           weight_col: str = "weight") -> DataFrame:
    """Score every document with a hashed linear model: returns
    ``(id_col, n_tokens, logit, score)``. ``weights`` holds one row per
    trained feature (``feature_id`` in [0, dim), ``weight`` double);
    absent features weigh 0. Duplicate feature rows are summed (so a
    sharded weights export needs no pre-merge).

    Scale shape: explode is in-partition; the ONLY shuffles are the
    broadcast of the (deduplicated) weights table and the doc-keyed
    sum/count combine. A document's score is invariant to row layout and
    partitioning — mean pooling over a multiset.
    """
    w = (weights.groupBy(F.col(feature_col).alias("__f"))
         .agg(F.sum(F.col(weight_col).cast("double")).alias("__w")))
    feats = df.select(
        F.col(id_col).alias("__doc"),
        F.explode_outer(hashed_features(F.col(text_col), dim)).alias("__f"),
    )
    scored = (feats.join(F.broadcast(w), "__f", "left")
              .groupBy("__doc")
              .agg(F.count("__f").alias("n_tokens"),
                   F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("__s")))
    logit = F.lit(float(bias)) + F.when(
        F.col("n_tokens") > 0, F.col("__s") / F.col("n_tokens")).otherwise(0.0)
    return scored.select(
        F.col("__doc").alias(id_col), "n_tokens",
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
    )


def classify_filter(df: DataFrame, id_col: str, text_col: str,
                    weights: DataFrame, dim: int, bias: float = 0.0,
                    threshold: float = 0.5, keep_score: bool = False) -> DataFrame:
    """Keep documents scoring ``>= threshold`` (cardinality-preserving
    left_semi against the scored projection; requires unique ids like
    every id-keyed operator here). ``keep_score=True`` joins the score
    back instead (inner join, same cardinality under unique ids)."""
    s = linear_text_classifier(df, id_col, text_col, weights, dim, bias)
    kept = s.filter(F.col("score") >= threshold)
    if keep_score:
        return df.join(kept.select(id_col, "score"), id_col)
    return df.join(kept.select(id_col), id_col, "left_semi")
