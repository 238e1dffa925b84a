"""heavy_hitters: distributed Misra-Gries candidates + exact verify.

The operator's contract is UNCONDITIONAL exactness (the sketch is only a
shuffle optimization), so every test compares against the plain exact
groupBy top-k under the pinned tie rule — including adversarial partition
layouts and flat distributions that force the guard fallback.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.sketch import (
    heavy_hitters,
    heavy_hitters_oracle_sql,
)


def exact_topk(df, col, k):
    return (df.filter(F.col(col).isNotNull())
            .groupBy(col).agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), F.col(col).asc())
            .limit(k).collect())


def test_skewed_strings(spark):
    # zipf-ish: value i appears 1000//(i+1) times
    rows = [(f"host{i}",) for i in range(40) for _ in range(1000 // (i + 1))]
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = heavy_hitters(df, "v", k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exact_topk(df, "v", 5)]


def test_flat_distribution_guard_fallback(spark):
    # every value appears exactly once: k-th count (1) can never beat
    # n/(c+1) -> the guard must fall back to the full exact groupBy and
    # the result must STILL be the exact top-k (all-ties, value-asc order)
    df = spark.createDataFrame([(i,) for i in range(500)], "v long") \
        .repartition(7)
    got = heavy_hitters(df, "v", k=4, capacity=4).collect()
    assert [tuple(r) for r in got] == [(0, 1), (1, 1), (2, 1), (3, 1)]


def test_adversarial_partition_layout(spark):
    # the heavy value is CONCENTRATED in one partition while every other
    # partition is full of decoys — the union-of-summaries guarantee must
    # still surface it
    heavy = [("HH", 0)] * 400
    decoys = [(f"d{i}", i % 6 + 1) for i in range(600)]
    df = (spark.createDataFrame(heavy + decoys, "v string, p int")
          .repartition(7, "p").drop("p"))
    got = heavy_hitters(df, "v", k=1).collect()
    assert got[0]["v"] == "HH" and got[0]["count"] == 400


def test_nulls_excluded_and_ties(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",), (None,), (None,), (None,), ("c",)],
        "v string")
    got = heavy_hitters(df, "v", k=3).collect()
    assert [tuple(r) for r in got] == [("a", 2), ("b", 2), ("c", 1)]


def test_matches_duckdb_oracle_on_documents(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [tuple(r) for r in heavy_hitters(df, "lang", k=3).collect()]
    want = duckdb.sql(heavy_hitters_oracle_sql(
        "'/root/testdata/sf0.001/documents.parquet'", "lang", 3)).fetchall()
    assert got == want


def test_empty_and_validation(spark):
    df = spark.createDataFrame([], "v string")
    assert heavy_hitters(df, "v", k=3).collect() == []
    with pytest.raises(ValueError, match="no such column"):
        heavy_hitters(df, "w", k=3)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "v", k=0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "v", k=5, capacity=2)
    fdf = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="type"):
        heavy_hitters(fdf, "v", k=1)


def test_partitioning_independence(spark):
    rows = [(f"k{i % 17}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "v string")
    a = [tuple(r) for r in heavy_hitters(df.coalesce(1), "v", k=6).collect()]
    b = [tuple(r) for r in heavy_hitters(df.repartition(16), "v", k=6).collect()]
    assert a == b == [tuple(r) for r in exact_topk(df, "v", 6)]
