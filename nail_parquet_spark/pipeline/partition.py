"""Skew-aware partitioning for hot-domain web data (SURVEY.md §4.3).

Common-Crawl hosts are Zipfian: a naive repartition("host") makes one task
carry the hottest domain (straggler at 1000 executors). The salt-bucket
count per host comes from a frequency pre-pass over the data — hot hosts are
split across ceil(count/target) buckets, cold hosts keep salt 0 — so every
output partition carries a bounded row count while same-host rows stay
mostly co-located (good for warc_ts delta encoding and dictionary reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOST_RE = r"^[a-z]+://([^/]+)"


def host_of(url_col: str = "url"):
    return F.regexp_extract(F.col(url_col), HOST_RE, 1)


def host_frequency(df: DataFrame, url_col: str = "url",
                   sample_fraction: float | None = None) -> DataFrame:
    """Frequency pre-pass; at very large scale run it on a sample and scale
    counts back up (skew detection needs ranks, not exact counts)."""
    base = df.sample(fraction=sample_fraction, seed=7) if sample_fraction else df
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    return (
        base.select(host_of(url_col).alias("host"))
        .groupBy("host")
        .agg((F.count(F.lit(1)) * scale).cast("long").alias("n_rows"))
    )


def salted_repartition_by_host(
    df: DataFrame,
    n_partitions: int,
    url_col: str = "url",
    target_rows_per_bucket: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Repartition by (host, salt) with data-driven salt bucket counts."""
    total = df.count()
    if target_rows_per_bucket is None:
        target_rows_per_bucket = max(1, (total // n_partitions) or 1)

    freq = host_frequency(df, url_col, sample_fraction)
    hot = freq.filter(F.col("n_rows") > target_rows_per_bucket).select(
        "host",
        F.ceil(F.col("n_rows") / target_rows_per_bucket).cast("int").alias("n_buckets"),
    )
    out = df.withColumn("__host", host_of(url_col)).join(
        F.broadcast(hot), F.col("__host") == hot["host"], "left"
    )
    salt = F.when(
        F.col("n_buckets").isNotNull(),
        F.pmod(F.xxhash64(F.col(url_col)), F.col("n_buckets")),
    ).otherwise(F.lit(0))
    out = out.withColumn("__salt", salt.cast("int")).drop("host", "n_buckets")
    return out.repartition(n_partitions, "__host", "__salt").drop("__host", "__salt")
