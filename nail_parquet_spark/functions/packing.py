"""Token-budget shard packing for training-data export.

A tokenizer-bound training job consumes the corpus as shards of roughly
equal token mass, in a stable order. This module assigns every document a
``shard_id`` so that consecutive documents (by an explicit order column)
fill ~``shard_tokens``-token shards.

Pinned rule (the oracle-exact one): ``shard_id = floor(exclusive_prefix_sum
(tokens) / shard_tokens)``. Unlike a greedy fill that resets its counter at
each boundary, the floor rule lets a straddling document's overflow carry
into the next shard's budget, so every shard's token mass lies within one
max-document of the budget and the long-run average is exactly
``shard_tokens`` — and the whole assignment is one arithmetic expression
over a prefix sum, reproducible by any SQL engine.

Scale: the prefix sum is rowid.with_exclusive_prefix_sum — range-bucketed
partitioned windows plus a driver-collected O(#buckets) offset table.
No single-partition window anywhere, so the pack runs at 100 TB exactly
like it runs at 100 MB.

Determinism contract: ``order_col`` must be UNIQUE (a doc id). Ties would
make the prefix sum — and therefore shard membership — depend on the
arbitrary tie order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nail_parquet_spark.rowid import with_exclusive_prefix_sum


def pack_shards(df: DataFrame, token_col: str, shard_tokens: int,
                order_col: str, out_col: str = "shard_id",
                materialize: bool = False) -> DataFrame:
    """Assign each row a shard id so consecutive rows (by ``order_col``)
    fill ~``shard_tokens``-token shards (pinned floor rule, module doc).

    ``materialize=True`` pins a snapshot first — required when ``df`` is
    not a pure function of the data (same contract as rowid helpers)."""
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    pre = with_exclusive_prefix_sum(df, order_col, token_col, "__tok_before",
                                    materialize=materialize)
    return pre.withColumn(
        out_col, F.floor(F.col("__tok_before") / F.lit(shard_tokens)).cast("long")
    ).drop("__tok_before")


def shard_stats(packed: DataFrame, token_col: str,
                shard_col: str = "shard_id") -> DataFrame:
    """Per-shard manifest: doc count + token mass. ONE hash-aggregate on
    the shard key — the writer's work list (one task per shard downstream,
    or a repartition(shard_col) for the actual export)."""
    return packed.groupBy(shard_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
