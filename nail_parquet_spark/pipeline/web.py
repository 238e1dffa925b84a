"""The end-to-end web-table encode pipeline (north-star shape): salted
repartition on url-host -> sortWithinPartitions(host, warc_ts) for
compression locality (nail optimize --sort-by analogue, optimize.rs:144-172)
-> per-column encode with auto-selection -> blocks + manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nail_parquet_spark.codec.encode import encode_table
from nail_parquet_spark.pipeline.manifest import partition_manifest
from nail_parquet_spark.pipeline.partition import host_of, salted_repartition_by_host


def encode_web_pipeline(
    df: DataFrame,
    n_partitions: int | None = None,
    codecs: dict[str, str] | None = None,
    policy: str = "balanced",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    lineage: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (blocks, manifest) for a web-shaped table.

    Host-sorted partitions make lang runs contiguous (RLE) and warc_ts
    deltas small (delta_bitpack) while the salt bound keeps the hottest
    domain from creating stragglers.
    """
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = salted_repartition_by_host(df, n_partitions, url_col=url_col)
    part = part.withColumn("__h", host_of(url_col)).sortWithinPartitions(
        "__h", ts_col
    ).drop("__h")
    blocks = encode_table(part, codecs=codecs, policy=policy)
    manifest = partition_manifest(blocks, lineage=lineage)
    return blocks, manifest
