"""Deterministic row ids (SURVEY.md §4.3).

Every reference feature built on ``ROW_NUMBER() OVER ()`` (row select/drop,
search --rows, id, dedup keep-first/last: /root/reference/src/commands/
select.rs:190, drop.rs:77, search.rs:215, id.rs:54, dedup.rs:93) assumes a
stable file order. Spark has none, so we materialize ``_row_id`` explicitly:
partition-local index + exclusive prefix sum of partition sizes. The result
is deterministic for a fixed input layout (same files, same splits).

The prefix sum is computed driver-side from per-bucket counts —
O(#buckets) rows collected, the same metadata scale AQE ships to the
driver — so NO stage anywhere uses a single-partition (global) window.

Determinism note: these helpers execute the input plan MORE THAN ONCE (a
bounded boundary sample via limit() — pushdown reads only a few splits —
then the counts job, then the numbered output), so every intermediate must
be a PURE FUNCTION of the data. ``repartitionByRange`` is NOT — its range
boundaries come from a sampler seeded by the RDD id, which differs between
executions — so ordering-based numbering buckets rows with an explicit
literal-boundary expression instead: boundary quality only affects balance,
never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ROW_ID = "_row_id"


def _materialize(df: DataFrame) -> DataFrame:
    """Pin a possibly-nondeterministic plan so the multi-execution numbering
    sequence sees ONE consistent dataset. ``localCheckpoint`` truncates the
    lineage and stores the computed partitions, so the boundary sample, the
    counts job, and the numbered output all read the same rows."""
    return df.localCheckpoint(eager=True)


def with_row_id(df: DataFrame, col: str = ROW_ID,
                materialize: bool = False) -> DataFrame:
    """Stable 1-based row id in the input's partition/arrival order.

    Executes the input plan more than once (counts job + output job), so
    ``df`` must be a pure function of the data — true for file scans and
    deterministic transformations. For plans that can return different rows
    per execution (round-robin ``repartition``, un-ordered ``limit``,
    ``sample``/``rand`` downstream of a shuffle), pass ``materialize=True``
    to pin one snapshot first; otherwise ids can be wrong or duplicated."""
    if col in df.columns:
        return df
    if materialize:
        df = _materialize(df)
    base = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    w_local = Window.partitionBy("__pid").orderBy("__mid")
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
        "__pid", "__mid", "__local", "__off"
    )


def _range_boundaries(df: DataFrame, order_col: str, n_parts: int,
                      sample_cap: int = 100_000) -> list:
    """Literal split points for ``order_col`` from a bounded driver sample.

    The boundaries are baked into the plan as literals, so bucketing is a
    pure function of the value — identical across plan re-executions. A
    biased sample only skews partition balance, never numbering."""
    if n_parts <= 1:
        return []
    vals = [
        r[0]
        for r in df.select(order_col)
        .where(F.col(order_col).isNotNull())
        .limit(sample_cap)
        .collect()
    ]
    if not vals:
        return []
    vals.sort()
    step = len(vals) / n_parts
    bounds: list = []
    for i in range(1, n_parts):
        b = vals[min(int(i * step), len(vals) - 1)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def _bucket_expr(order_col: str, bounds: list) -> F.Column:
    """0-based bucket index: #boundaries strictly below the value. NULLs
    land in bucket 0 (Spark's default NULLS FIRST ascending order)."""
    c = F.col(order_col)
    if not bounds:
        return F.lit(0)
    e = F.lit(0)
    for b in bounds:
        e = e + F.when(c > F.lit(b), 1).otherwise(0)
    return F.when(c.isNull(), F.lit(0)).otherwise(e)


def _bucket_offset_numbered(df: DataFrame, order_col: str, col: str,
                            value_col: str | None = None) -> DataFrame:
    """Shared core: bucket by literal boundaries, number/sum locally within
    each bucket (a PARTITIONED window), add the exclusive prefix over bucket
    totals (driver-collected, O(#buckets)).

    value_col=None -> global 1-based row_number in order_col order;
    value_col=X    -> exclusive running sum of X in order_col order.

    Executes the input plan THREE times (boundary sample, per-bucket counts,
    numbered output) — callers with nondeterministic inputs must pass
    ``materialize=True`` on the public wrappers."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    bounds = _range_boundaries(df, order_col, n_parts)
    base = df.withColumn("__b", _bucket_expr(order_col, bounds))
    w = Window.partitionBy("__b").orderBy(order_col)
    if value_col is None:
        base = base.withColumn("__local", F.row_number().over(w).cast("long"))
        agg = F.count(F.lit(1)).alias("__n")
    else:
        wf = w.rowsBetween(Window.unboundedPreceding, -1)
        base = base.withColumn(
            "__local", F.coalesce(F.sum(value_col).over(wf), F.lit(0)).cast("long")
        )
        agg = F.sum(value_col).alias("__n")
    sizes = base.groupBy("__b").agg(agg).collect()
    off = 0
    offsets = []
    for r in sorted(sizes, key=lambda r: r["__b"]):
        offsets.append((r["__b"], off))
        off += r["__n"] or 0
    odf = spark.createDataFrame(offsets or [(0, 0)], "__b int, __off long")
    out = base.join(F.broadcast(odf), "__b")
    return out.withColumn(col, F.col("__off") + F.col("__local")).drop(
        "__b", "__local", "__off"
    )


def with_row_number_by(df: DataFrame, order_col: str, col: str = "__rn",
                       materialize: bool = False) -> DataFrame:
    """Global 1-based row_number ordered by ``order_col`` WITHOUT a
    single-partition window. Ties order arbitrarily, matching row_number's
    nondeterministic tie-break; NULLs number first (Spark sort default).

    ``df`` must be deterministic across executions (see module docstring);
    pass ``materialize=True`` to pin a snapshot of a nondeterministic plan
    before the multi-execution numbering sequence."""
    if materialize:
        df = _materialize(df)
    return _bucket_offset_numbered(df, order_col, col, value_col=None)


def with_exclusive_prefix_sum(df: DataFrame, order_col: str, value_col: str,
                              col: str = "__before",
                              materialize: bool = False) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order_col`` order, without
    a single-partition window (range-bucketed partitioned windows + a
    driver-collected per-bucket prefix).

    Same determinism contract as :func:`with_row_number_by`."""
    if materialize:
        df = _materialize(df)
    return _bucket_offset_numbered(df, order_col, col, value_col=value_col)
