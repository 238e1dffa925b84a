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


def filter_and_encode_web_pipeline(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    rules: dict | None = None,
    n_partitions: int | None = None,
    codecs: dict[str, str] | None = None,
    policy: str = "balanced",
    lineage: dict | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Quality-gate then encode: apply the composed Gopher rule filter on
    ``text_col`` (functions/quality.gopher_filter, url as the doc id — one
    projection + one doc-id-keyed join, no extra full-table shuffle beyond
    the salted repartition that follows), encode only the surviving pages,
    and report the rejects.

    Returns (blocks, manifest, rejected) where rejected carries
    (url, n_words, n_fail) for audit/lineage. The manifest's lineage dict
    gains quality_rules so a 100-TB run records WHICH thresholds shaped the
    output."""
    from nail_parquet_spark.functions.quality import GOPHER_RULES, gopher_filter

    verdict = gopher_filter(df, url_col, text_col, rules=rules)
    # left_semi, not inner: a URL re-crawled k times yields k verdict rows,
    # and an inner join would emit k*k copies of each kept page (ADVICE r4)
    keep = df.join(verdict.filter("passes").select(url_col), url_col, "left_semi")
    rejected = (verdict.filter(~F.col("passes"))
                .select(url_col, "n_words", "n_fail"))
    eff = dict(GOPHER_RULES)
    if rules:
        eff.update(rules)
    import json

    # lineage values are stamped via F.lit -> the rule map rides as JSON
    lin = dict(lineage or {})
    lin["quality_rules"] = json.dumps({k: eff[k] for k in sorted(eff)})
    blocks, manifest = encode_web_pipeline(
        keep, n_partitions=n_partitions, codecs=codecs, policy=policy,
        url_col=url_col, ts_col=ts_col, lineage=lin)
    return blocks, manifest, rejected


