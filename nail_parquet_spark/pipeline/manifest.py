"""Per-partition lineage manifests + metrics rollup (north rule: 'writes
per-partition lineage manifests and codec/ratio/throughput metrics').

A manifest row is derivable from the blocks table itself (blocks ARE the
ground truth); this module materializes the rollup and stamps lineage
(input identifier, job id, wall time) so a resume can decide what is done
without scanning payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MANIFEST_COLS = [
    "part_id", "n_blocks", "n_rows", "raw_bytes", "enc_bytes", "ratio",
    "codec_map", "null_count",
]


def partition_manifest(blocks: DataFrame, lineage: dict | None = None) -> DataFrame:
    """One row per encoder partition: sizes, ratio, codec-per-column map."""
    per_col = blocks.groupBy("part_id", "column").agg(
        F.first("codec").alias("codec"),
        F.sum("n_rows").alias("col_rows"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("enc_bytes").alias("enc"),
        F.sum("null_count").alias("nulls"),
        F.countDistinct("block_id").alias("nb"),
    )
    m = per_col.groupBy("part_id").agg(
        F.max("nb").alias("n_blocks"),
        F.max("col_rows").alias("n_rows"),
        F.sum("raw").alias("raw_bytes"),
        F.sum("enc").alias("enc_bytes"),
        F.round(F.sum("raw") / F.sum("enc"), 4).alias("ratio"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("column", "codec")))
        ).alias("codec_map"),
        F.sum("nulls").alias("null_count"),
    )
    for k, v in (lineage or {}).items():
        m = m.withColumn(k, F.lit(v))
    return m


def metrics_rollup(manifest: DataFrame) -> DataFrame:
    """Job-level metrics row (throughput fields filled by the caller that
    owns the wall clock)."""
    return manifest.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.round(F.sum("raw_bytes") / F.sum("enc_bytes"), 4).alias("ratio"),
    )
