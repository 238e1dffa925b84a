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


def fill_stat_grouped(df: DataFrame, columns: list[str], group_by: list[str],
                      stat: str = "mean", fallback_global: bool = True) -> DataFrame:
    """Group-wise imputation — beyond the reference's grand aggregates
    (fill.rs:155-311 computes ONE value per column): each NULL is filled
    with its GROUP's mean / exact median (lower interpolation, the
    cross-engine-portable convention) / mode (ties broken by smallest
    value), which is what imputation over heterogeneous corpora actually
    wants (per-language, per-host, per-category).

    Scale shape: one groupBy over the grouping keys per statistic
    (partial map-side aggregation; median/mode stay keyed aggregations,
    never a global window or driver pull), broadcast back when the group
    dimension is small — Spark's AQE picks broadcast vs shuffle join on
    its own here. All-NULL groups fall back to the GLOBAL statistic (one
    scalar agg) when ``fallback_global`` — the same coalesce chain the
    grand fill uses; pass False to leave them NULL.
    """
    if stat == "mean":
        agg = lambda c: F.avg(c)  # noqa: E731
    elif stat == "median":
        # continuous (interpolating) median — matches DuckDB's median()
        agg = lambda c: F.median(c)  # noqa: E731
    elif stat == "mode":
        # NOT F.mode: its tie-break is engine-internal. Deterministic mode
        # = per (group, value) counts -> min struct(-count, value), i.e.
        # highest count, ties to the SMALLEST value — SQL-reproducible.
        agg = None
    else:
        raise ValueError(stat)
    if agg is not None:
        stats = df.groupBy(*group_by).agg(
            *[agg(c).alias(f"__fill_{c}") for c in columns])
    else:
        stats = None
        for c in columns:
            vc = (df.filter(F.col(c).isNotNull())
                  .groupBy(*group_by, c)
                  .agg(F.count(F.lit(1)).alias("__n"))
                  .groupBy(*group_by)
                  .agg(F.min(F.struct((-F.col("__n")).alias("nn"),
                                      F.col(c).alias("v"))).alias("__k"))
                  .select(*group_by, F.col("__k.v").alias(f"__fill_{c}")))
            stats = vc if stats is None else stats.join(vc, group_by, "outer")
    out = df.join(stats, group_by, "left")
    if fallback_global:
        if agg is not None:
            glob = df.agg(*[agg(c).alias(c) for c in columns]).collect()[0].asDict()
        else:
            glob = {}
            for c in columns:
                r = (df.filter(F.col(c).isNotNull()).groupBy(c)
                     .agg(F.count(F.lit(1)).alias("__n"))
                     .orderBy(F.col("__n").desc(), F.col(c).asc())
                     .limit(1).collect())
                glob[c] = r[0][c] if r else None
    else:
        glob = {c: None for c in columns}
    for c in columns:
        filled = F.coalesce(F.col(c), F.col(f"__fill_{c}"))
        if glob[c] is not None:
            filled = F.coalesce(filled, F.lit(glob[c]))
        out = out.withColumn(c, filled).drop(f"__fill_{c}")
    return out
