"""Byte-pair-encoding subword tokenizer: distributed corpus statistics,
classic merge training, and a dictionary-join encoder.

The two-level design keeps 100-TB corpora tractable:

* TRAIN — corpus-scale work is ONE :func:`~nail_parquet_spark.functions.
  text.vocabulary` aggregate (explode + groupBy); the merge loop then runs
  driver-side over the bounded (word, count) table, exactly how the
  published BPE recipes train (Sennrich et al. 2016 operate on a word-
  frequency dict, not the raw corpus). ``max_words`` bounds the driver
  pull explicitly (top by count, ties lexicographic — deterministic).

* ENCODE — per-word BPE is applied only to the corpus' DISTINCT words
  (another aggregate, dimension-scale), producing a word -> subword-array
  dictionary that broadcast-joins back onto the exploded corpus. A word
  occurring a billion times BPE-encodes once. No per-row Python ever sees
  corpus rows; the merge loop touches only the distinct-word table, whose
  size the merges themselves bound.

Pinned tokenizer contract (the module rule everywhere in this package):
words are trim + lower + split \\s+; each word's symbols start as its
unicode CHARACTERS plus a trailing end-of-word marker ``</w>``; merges
apply in rank order, left-to-right within the word. Merge selection is
max pair count, ties broken by the lexicographically smallest (left,
right) pair — fully deterministic for a fixed corpus.

Reference scope note: the reference has no tokenizer (its text ops are
whole-value, src/commands/*.rs); this is a beyond-reference
training-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def _merge_word(symbols: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply ranked merges greedily (lowest rank first) to one symbol list."""
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols = (symbols[:best_i]
                   + [symbols[best_i] + symbols[best_i + 1]]
                   + symbols[best_i + 2:])
    return symbols


def bpe_train(df: DataFrame, id_col: str, text_col: str,
              num_merges: int = 1000, min_pair_freq: int = 2,
              max_words: int = 65536) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns a merges
    DataFrame (rank int, left string, right string) — the portable model
    artifact (write it with sources.io.write_data, feed it back to
    :func:`bpe_encode`). Stops early when no pair reaches
    ``min_pair_freq``."""
    from nail_parquet_spark.functions.text import vocabulary

    vocab = (
        vocabulary(df, id_col, text_col)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(max_words)
        .select("token", "tf")
        .collect()
    )
    words: list[tuple[list[str], int]] = [
        (list(r["token"]) + [EOW], int(r["tf"])) for r in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        left, right = best[0]
        merges.append((left, right))
        fused = left + right
        new_words = []
        for syms, freq in words:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, freq))
        words = new_words
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string")


def bpe_encode(df: DataFrame, merges: DataFrame, id_col: str,
               text_col: str) -> DataFrame:
    """Tokenize ``text_col`` into BPE subwords under a trained merges
    table: (id, tokens array<string>, n_tokens). Empty/NULL text ->
    empty array, n_tokens 0.

    Scale shape: merges (the model, <= num_merges rows) collect to a rank
    dict; the corpus' DISTINCT words (ONE aggregate) BPE-encode once each
    inside a mapInArrow kernel over the distinct-word table only; the
    word -> subwords dictionary then broadcast-joins onto the exploded
    corpus and ONE doc-keyed groupBy rebuilds per-doc token sequences in
    word order. Corpus bytes never meet Python."""
    import pyarrow as pa

    ranks = {(r["left"], r["right"]): int(r["rank"]) for r in merges.collect()}
    t = F.trim(F.lower(F.col(text_col)))
    words_expr = F.when(
        F.col(text_col).isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    toks = (
        df.select(F.col(id_col).alias("__doc"), words_expr.alias("__w"))
        .select("__doc", F.posexplode("__w").alias("__pos", "__word"))
    )
    distinct_words = toks.select("__word").distinct()

    def enc(batches):
        for b in batches:
            col = b.column("__word")
            out = []
            for w in col.to_pylist():
                out.append(_merge_word(list(w) + [EOW], ranks))
            yield pa.record_batch(
                [col, pa.array(out, type=pa.list_(pa.string()))],
                names=["__word", "__sub"])

    sub_schema = "__word string, __sub array<string>"
    word_dict = distinct_words.mapInArrow(enc, sub_schema)
    per_doc = (
        toks.join(F.broadcast(word_dict), "__word")
        .groupBy("__doc")
        .agg(F.expr(
            "flatten(transform(array_sort(collect_list(struct(__pos, __sub))),"
            " s -> s.__sub))").alias("tokens"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__doc"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("tokens"), F.array().cast("array<string>"))
            .alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
    )
