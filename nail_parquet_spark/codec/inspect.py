"""Inspect surface over encoded blocks — the distributed analogue of
`nail metadata` (/root/reference/src/commands/metadata.rs:45-401) and
`nail size` (/root/reference/src/commands/size.rs:23-190).

Where the reference dumps a parquet footer, these are plain DataFrame
aggregations over the blocks table, so they scale with the data and stay
queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def metadata_summary(blocks: DataFrame) -> DataFrame:
    """Per-column rollup: blocks, rows, bytes, ratio, codecs, null/distinct.

    Parity: per-column chunk report of `nail metadata --column-chunks`
    (metadata.rs:217-273) + encoding-usage aggregate (metadata.rs:318-357).
    """
    return (
        blocks.groupBy("column")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n_rows").alias("n_values"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.round(F.sum("raw_bytes") / F.sum("enc_bytes"), 4).alias("ratio"),
            F.array_sort(F.collect_set("codec")).alias("codecs"),
            F.sum("null_count").alias("null_count"),
            F.max("distinct_est").alias("max_block_distinct"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
        .orderBy("column")
    )


def size_summary(blocks: DataFrame) -> DataFrame:
    """Table-level totals (nail size parity, exact instead of heuristic).

    ``bloom_bytes`` reports the opt-in equality-index overhead separately:
    blooms are droppable metadata (pruning falls back to zone maps), so
    they stay out of enc_bytes/ratio — the codec's job — and are surfaced
    here so the trade is visible."""
    aggs = [
        F.countDistinct("part_id", "block_id").alias("n_blocks"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.round(F.sum("raw_bytes") / F.sum("enc_bytes"), 4).alias("ratio"),
    ]
    if "bloom" in blocks.columns:
        aggs.append(F.coalesce(F.sum(F.length("bloom")), F.lit(0)).alias("bloom_bytes"))
    return blocks.agg(*aggs)


def encoding_usage(blocks: DataFrame) -> DataFrame:
    """% of blocks per (column, codec) — metadata.rs:318-357 parity."""
    from pyspark.sql import Window

    w = Window.partitionBy("column")
    return (
        blocks.groupBy("column", "codec")
        .agg(F.count("*").alias("n_blocks"), F.sum("enc_bytes").alias("enc_bytes"))
        .withColumn("pct_blocks", F.round(100 * F.col("n_blocks") / F.sum("n_blocks").over(w), 2))
        .orderBy("column", "codec")
    )
