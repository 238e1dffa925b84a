"""Unit tests for the windowless row-numbering/prefix-sum machinery that
select/drop rows, id columns, tail, and spearman ranks are built on."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.rowid import (
    with_exclusive_prefix_sum,
    with_row_id,
    with_row_number_by,
)


def test_row_id_contiguous_over_partitions(spark):
    df = spark.range(0, 1000).repartition(7)
    got = sorted(r["_row_id"] for r in with_row_id(df).collect())
    assert got == list(range(1, 1001))


def test_row_number_by_matches_sort_order(spark):
    df = spark.createDataFrame(
        [(x,) for x in [30, 10, 20, 50, 40, 20]], "v int"
    ).repartition(3)
    rows = with_row_number_by(df, "v").orderBy("__rn").collect()
    assert [r["v"] for r in rows] == [10, 20, 20, 30, 40, 50]
    assert [r["__rn"] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_row_number_by_large_no_gaps(spark):
    df = spark.range(0, 5000).select((F.col("id") % 97).alias("k")).repartition(8)
    out = with_row_number_by(df, "k")
    ns = sorted(r["__rn"] for r in out.collect())
    assert ns == list(range(1, 5001))


def test_exclusive_prefix_sum(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 5), ("c", 1), ("d", 10)], "k string, n int"
    ).repartition(3)
    got = {r["k"]: r["__before"] for r in
           with_exclusive_prefix_sum(df, "k", "n").collect()}
    assert got == {"a": 0, "b": 5, "c": 7, "d": 8}


def test_empty_inputs(spark):
    empty = spark.range(0).select(F.col("id").alias("v"))
    assert with_row_id(empty).count() == 0
    assert with_row_number_by(empty, "v").count() == 0


def test_row_number_by_nulls_first(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (None,), (1,)], "v int"
    ).repartition(2)
    rows = with_row_number_by(df, "v").orderBy("__rn").collect()
    # NULLs number first (Spark ascending default), then values in order
    assert [r["v"] for r in rows[2:]] == [1, 5]
    assert sorted(r["__rn"] for r in rows) == [1, 2, 3, 4]
    assert all(r["v"] is None for r in rows[:2])


def test_row_number_by_deterministic_across_executions(spark):
    """The numbering plan executes twice internally (counts + output) and
    callers may evaluate the result repeatedly — ids must be stable."""
    df = spark.range(0, 2000).select((F.col("id") * 37 % 1000).alias("v")).repartition(5)
    out = with_row_number_by(df, "v")
    a = sorted((r["v"], r["__rn"]) for r in out.collect())
    b = sorted((r["v"], r["__rn"]) for r in out.collect())
    assert sorted(rn for _, rn in a) == list(range(1, 2001))
    # same multiset of (value, id) pairs on re-execution
    assert [v for v, _ in a] == [v for v, _ in b]


def test_materialize_pins_nondeterministic_input(spark):
    """A plan that returns different rows per execution (un-ordered limit
    over a shuffle) gets pinned by materialize=True so the counts job and
    the output job agree — exactly-once, gap-free numbering."""
    df = (
        spark.range(0, 5000)
        .select((F.col("id") * 7919 % 5000).alias("v"))
        .repartition(8)
        .limit(1000)  # which 1000 rows is execution-dependent
    )
    out = with_row_number_by(df, "v", materialize=True)
    rows = out.collect()
    assert sorted(r["__rn"] for r in rows) == list(range(1, 1001))
    ids = with_row_id(df, materialize=True).collect()
    assert sorted(r["_row_id"] for r in ids) == list(range(1, 1001))
