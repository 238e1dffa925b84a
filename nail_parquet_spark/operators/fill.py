"""Imputation: fill value / mean / median / mode / forward / backward
(SURVEY.md §2.11).

forward/backward fill replaces the reference's collect-and-scan
(fill.rs:325-567) with real frame-spec windows — last(ignorenulls) over an
explicit row order. For partition-scalable ffill pass ``partition_by`` (e.g.
a host or session key) so the window never becomes single-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nail_parquet_spark.rowid import ROW_ID, with_row_id


def fill_value(df: DataFrame, columns: list[str], value) -> DataFrame:
    return df.fillna({c: value for c in columns})


def fill_stat(df: DataFrame, columns: list[str], stat: str = "mean") -> DataFrame:
    """mean / median(approx) / mode, computed in one pass then coalesced
    (fill.rs:155-311)."""
    aggs = []
    for c in columns:
        if stat == "mean":
            aggs.append(F.avg(c).alias(c))
        elif stat == "median":
            aggs.append(F.percentile_approx(c, 0.5).alias(c))
        elif stat == "mode":
            aggs.append(F.mode(c).alias(c))
        else:
            raise ValueError(stat)
    vals = df.agg(*aggs).collect()[0].asDict()
    out = df
    for c in columns:
        if vals[c] is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(vals[c])))
    return out


def fill_directional(df: DataFrame, columns: list[str], direction: str = "forward",
                     order_col: str | None = None,
                     partition_by: list[str] | None = None) -> DataFrame:
    base = with_row_id(df) if order_col is None else df
    oc = order_col or ROW_ID
    w = Window.partitionBy(*(partition_by or [])).orderBy(F.col(oc))
    if direction == "forward":
        w = w.rowsBetween(Window.unboundedPreceding, 0)
        fn = lambda c: F.last(F.col(c), ignorenulls=True).over(w)  # noqa: E731
    elif direction == "backward":
        w = w.rowsBetween(0, Window.unboundedFollowing)
        fn = lambda c: F.first(F.col(c), ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(direction)
    out = base
    for c in columns:
        out = out.withColumn(c, fn(c))
    if order_col is None:
        out = out.orderBy(ROW_ID).drop(ROW_ID)
    return out
