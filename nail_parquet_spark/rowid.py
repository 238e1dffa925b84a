"""Deterministic row ids (SURVEY.md §4.3).

Every reference feature built on ``ROW_NUMBER() OVER ()`` (row select/drop,
search --rows, id, dedup keep-first/last: /root/reference/src/commands/
select.rs:190, drop.rs:77, search.rs:215, id.rs:54, dedup.rs:93) assumes a
stable file order. Spark has none, so we materialize ``_row_id`` explicitly:
partition-local index + exclusive prefix sum of partition sizes. The result
is deterministic for a fixed input layout (same files, same splits) and
never funnels data through the driver (the offsets table is tiny and
broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ROW_ID = "_row_id"


def with_row_id(df: DataFrame, col: str = ROW_ID) -> DataFrame:
    if col in df.columns:
        return df
    base = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    w_local = Window.partitionBy("__pid").orderBy("__mid")
    base = base.withColumn("__local", F.row_number().over(w_local))
    sizes = base.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
    out = base.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
    return out.withColumn(col, (F.col("__off") + F.col("__local")).cast("long")).drop(
        "__pid", "__mid", "__local", "__off"
    )


def order_window(order_col: str = ROW_ID) -> Window:
    """A global window ordered by the explicit row id (single-partition for
    the final numbering stage — fine for the small outputs it's used on;
    large-table call sites should partition first)."""
    return Window.orderBy(F.col(order_col))
