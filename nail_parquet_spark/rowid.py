"""Deterministic row ids (SURVEY.md §4.3).

Every reference feature built on ``ROW_NUMBER() OVER ()`` (row select/drop,
search --rows, id, dedup keep-first/last: /root/reference/src/commands/
select.rs:190, drop.rs:77, search.rs:215, id.rs:54, dedup.rs:93) assumes a
stable file order. Spark has none, so we materialize ``_row_id`` explicitly:
partition-local index + exclusive prefix sum of partition sizes. The result
is deterministic for a fixed input layout (same files, same splits).

The prefix sum is computed driver-side from the per-partition counts —
O(#partitions) rows collected, the same metadata scale AQE ships to the
driver — so NO stage anywhere uses a single-partition (global) window: the
per-partition numbering window partitions by partition id, and the offsets
arrive via a broadcast join. ``test_plans.py`` gates this property for every
registered query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ROW_ID = "_row_id"


def _offset_numbered(base: DataFrame, local_order, col: str) -> DataFrame:
    """Number rows 1..N in (partition id, local_order) order.

    base must already carry __pid and any ordering columns. Partition sizes
    are collected to the driver (one long per partition) and joined back as
    a broadcast exclusive prefix sum."""
    w_local = Window.partitionBy("__pid").orderBy(*local_order)
    base = base.withColumn("__local", F.row_number().over(w_local))
    sizes = base.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    off = 0
    offsets = []
    for r in sorted(sizes, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], off))
        off += r["__n"]
    spark = base.sparkSession
    odf = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    out = base.join(F.broadcast(odf), "__pid")
    return out.withColumn(col, (F.col("__off") + F.col("__local")).cast("long")).drop(
        "__pid", "__local", "__off"
    )


def with_row_id(df: DataFrame, col: str = ROW_ID) -> DataFrame:
    """Stable 1-based row id in the input's partition/arrival order."""
    if col in df.columns:
        return df
    base = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    return _offset_numbered(base, [F.col("__mid")], col).drop("__mid")


def with_exclusive_prefix_sum(df: DataFrame, order_col: str, value_col: str,
                              col: str = "__before") -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order_col`` order, without
    a single-partition window: range-repartition on the key, local running
    sum per partition, plus driver-collected per-partition totals."""
    base = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = base.withColumn("__lcum", F.coalesce(F.sum(value_col).over(w), F.lit(0)))
    totals = base.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    off = 0
    offsets = []
    for r in sorted(totals, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], off))
        off += r["__t"] or 0
    odf = base.sparkSession.createDataFrame(offsets or [(0, 0)], "__pid int, __off bigint")
    out = base.join(F.broadcast(odf), "__pid")
    return out.withColumn(col, F.col("__off") + F.col("__lcum")).drop(
        "__pid", "__lcum", "__off"
    )


def with_row_number_by(df: DataFrame, order_col: str, col: str = "__rn") -> DataFrame:
    """Global 1-based row_number ordered by ``order_col`` WITHOUT a
    single-partition window: range-repartition on the key (range partitions
    are totally ordered), sort within partitions, then apply the same
    partition-offset prefix sum. Ties order arbitrarily, matching
    row_number's nondeterministic tie-break."""
    base = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    return _offset_numbered(base, [F.col(order_col)], col)
