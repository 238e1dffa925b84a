"""Event-funnel / cohort-retention / OLAP-rollup / time-series analytics.

Beyond the reference surface (nail-parquet has no event analytics); these are
the standard product-analytics shapes a warehouse team runs next to the
training-data pipeline, expressed as pure Catalyst plans:

- ``funnel``: ordered step conversion — per-user earliest qualifying time per
  step, chained keyed joins (every shuffle is on the user key; events are
  scanned once per step with the ``event_type`` predicate pushed to the
  scan). No collect, no window over the whole table.
- ``retention``: cohort = first-activity period per user; one aggregate for
  cohorts, one distinct-activity aggregate, one keyed join.
- ``grouping_sets``: ROLLUP / CUBE with ``grouping_id`` — Spark's native
  ``df.rollup/cube`` (partial aggregation map-side, one Exchange).
- ``resample``: fixed-width time buckets per key with gap filling; the dense
  grid is generated per key via ``sequence``+``explode`` (rows are created
  executor-side, never on the driver) and left-joined to the aggregates.
- ``topk_per_group`` / ``sample_per_group``: per-key window rank with a
  total order (deterministic under any partitioning / layout).

All functions stay JVM-side end-to-end — no Python UDFs.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window, functions as F


def _epoch_seconds(col):
    """Fractional epoch seconds for either TIMESTAMP or TIMESTAMP_NTZ input.

    NTZ casts through LTZ using the session timezone, which this engine pins
    to UTC (session.py) — the same naive-as-UTC reading DuckDB's ``epoch()``
    uses, so bucket values agree across engines."""
    return col.cast("timestamp_ltz").cast("double")


def _funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str,
    ts_col: str,
    type_col: str,
    within_seconds: int | None,
) -> DataFrame:
    """Per-user earliest qualifying time per funnel step: one row per
    step-1 user with columns __t1..__tk (NULL where the user never
    converted). Shared by ``funnel`` and ``funnel_durations``; every join
    in the chain is keyed on ``user_col`` so Spark reuses one partitioning."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    base = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(t).alias("__t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"__t{i - 1}"
        ev = df.filter(F.col(type_col) == step).select(u.alias(user_col), t.alias("__ts"))
        cond = F.col("__ts") >= F.col(prev)
        if within_seconds is not None:
            cond = cond & (
                _epoch_seconds(F.col("__ts"))
                <= _epoch_seconds(F.col(prev)) + F.lit(float(within_seconds))
            )
        nxt = (
            ev.join(base.select(user_col, prev).filter(F.col(prev).isNotNull()), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"__t{i}"))
        )
        base = base.join(nxt, user_col, "left")
    return base


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-step funnel: for each step i, count users whose earliest
    qualifying event of ``steps[i]`` occurs at-or-after their step-(i-1)
    time (and within ``within_seconds`` of it, if given).

    Returns one row per step: (step, event_type, users), where ``users`` is
    monotonically non-increasing down the funnel.

    Scale shape: a chain of len(steps)-1 inner joins, all keyed on
    ``user_col`` — Spark co-partitions every stage on the same key, so after
    the first Exchange the join chain reuses the partitioning. Each step's
    event scan pushes ``type_col = step`` to the source (partition/zone-map
    prunable). The per-user state is one timestamp per step — O(#users ×
    #steps), never materialized on the driver.
    """
    base = _funnel_times(df, steps, user_col, ts_col, type_col, within_seconds)
    counts = base.agg(
        *[F.count(F.col(f"__t{i}")).alias(f"__c{i}") for i in range(1, len(steps) + 1)]
    )
    # one explode over a struct array, NOT a union of per-step selects:
    # each union branch carried its own copy of the whole join-chain +
    # aggregate subtree (plan-size and, when exchange reuse misses, full
    # re-execution per step); the explode evaluates the 1-row aggregate
    # once and emits the same rows in the same order
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"__c{i}").cast("long").alias("users"),
        )
        for i, step in enumerate(steps, start=1)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def funnel_durations(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert statistics per funnel transition: for every step
    i >= 2, the distribution of (step-i time − step-(i−1) time) in seconds
    over the users who converted.

    Returns one row per transition:
    (step, event_type, converted, avg_seconds, p<q>_seconds..., max_seconds)
    with the duration stats rounded to 6 decimals (microsecond timestamps).
    Percentiles are exact linear-interpolated (SQL percentile_cont — the
    same rule DuckDB's quantile_cont applies), not approximate, so results
    are layout-independent.

    Scale shape: the per-user step-time chain is the funnel's own (keyed
    joins on ``user_col`` only), and every stat here is ONE aggregate over
    that frame — no window, no second scan of the events table.
    """
    if len(steps) < 2:
        raise ValueError("funnel_durations needs at least two steps")
    base = _funnel_times(df, steps, user_col, ts_col, type_col, within_seconds)
    aggs = []
    for i in range(2, len(steps) + 1):
        d = _epoch_seconds(F.col(f"__t{i}")) - _epoch_seconds(F.col(f"__t{i - 1}"))
        aggs.append(F.count(F.col(f"__t{i}")).alias(f"__n{i}"))
        aggs.append(F.round(F.avg(d), 6).alias(f"__avg{i}"))
        for q in percentiles:
            aggs.append(
                F.round(F.percentile(d, F.lit(float(q))), 6).alias(f"__p{i}_{int(q * 100)}")
            )
        aggs.append(F.round(F.max(d), 6).alias(f"__max{i}"))
    stats = base.agg(*aggs)
    rows = []
    # explode-of-structs instead of a union of per-transition selects —
    # same single-evaluation reasoning as funnel() above
    for i, step in enumerate(steps[1:], start=2):
        cols = [
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"__n{i}").cast("long").alias("converted"),
            F.col(f"__avg{i}").alias("avg_seconds"),
        ]
        for q in percentiles:
            pname = f"p{int(q * 100)}_seconds"
            cols.append(F.col(f"__p{i}_{int(q * 100)}").alias(pname))
        cols.append(F.col(f"__max{i}").alias("max_seconds"))
        rows.append(F.struct(*cols))
    return stats.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Daily cohort retention: cohort_date = each user's first active day;
    for every (cohort_date, offset_days) count the distinct users active
    exactly offset_days after their cohort day.

    Returns (cohort_date, offset_days, users). Offset 0 is the cohort size.

    Scale shape: distinct (user, day) activity (one Exchange), per-user min
    reused from the same aggregate (no second scan), then a count-distinct
    keyed by (cohort, offset). All shuffles carry (user, date) pairs only.
    """
    day = F.to_date(F.col(ts_col)).alias("__day")
    active = df.select(F.col(user_col).alias("__u"), day).distinct()
    cohort = active.groupBy("__u").agg(F.min("__day").alias("__cohort"))
    joined = active.join(cohort, "__u").withColumn(
        "offset_days", F.datediff(F.col("__day"), F.col("__cohort")).cast("long")
    )
    if max_offset_days is not None:
        joined = joined.filter(F.col("offset_days") <= max_offset_days)
    return (
        joined.groupBy(F.col("__cohort").alias("cohort_date"), "offset_days")
        .agg(F.count_distinct(F.col("__u")).alias("users"))
    )


def grouping_sets(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    mode: str = "rollup",
) -> DataFrame:
    """ROLLUP / CUBE aggregation with a ``grouping_id`` disambiguator.

    ``aggs`` maps output name -> (fn, column) with fn in
    count|sum|avg|min|max. ``grouping_id`` uses Spark's bit encoding (bit i
    set = keys[i] rolled up), which matches DuckDB/ANSI GROUPING_ID.

    Scale shape: Spark expands the grouping sets BEFORE the Exchange and
    partially aggregates map-side, so the shuffle carries one partial row
    per (input-partition, grouping-set, key) — same cost class as a plain
    groupBy per set, in one pass over the data.
    """
    fns = {"count": F.count, "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
    exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in fns:
            raise ValueError(f"unsupported agg fn {fn!r}")
        exprs.append(fns[fn](F.col(col)).alias(out))
    if mode == "rollup":
        grouped = df.rollup(*keys)
    elif mode == "cube":
        grouped = df.cube(*keys)
    else:
        raise ValueError(f"mode must be rollup|cube, got {mode!r}")
    return grouped.agg(F.grouping_id().cast("long").alias("grouping_id"), *exprs)


def resample(
    df: DataFrame,
    ts_col: str,
    every_seconds: int,
    keys: list[str] | None = None,
    value_col: str | None = None,
    fill_gaps: bool = True,
) -> DataFrame:
    """Fixed-width time-bucket aggregation with optional gap filling.

    Buckets are epoch-second multiples of ``every_seconds`` (floor), emitted
    as a ``bucket`` long column — timezone-free and join-stable. Output is
    (keys..., bucket, n_events[, sum_value]); with ``fill_gaps`` every key
    gets a dense bucket range from its own min to max bucket, missing
    buckets carrying n_events=0 and NULL sum.

    Scale shape: one groupBy for the aggregates, one tiny per-key min/max
    aggregate, then ``sequence``+``explode`` generates the dense grid on the
    executors (never the driver) and a keyed left join attaches the
    aggregates. Grid size is bounded by (range/every) per key — guard with a
    coarser ``every_seconds`` for sparse keys, same rule as any gap-fill.
    """
    keys = list(keys or [])
    bucket = (F.floor(_epoch_seconds(F.col(ts_col)) / every_seconds) * every_seconds).cast(
        "long"
    ).alias("bucket")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("sum_value"))
    agg = df.groupBy(*keys, bucket).agg(*aggs)
    if not fill_gaps:
        return agg
    rng = agg.groupBy(*keys).agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
    grid = rng.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.lit(every_seconds))).alias("bucket"),
    )
    out = grid.join(agg, keys + ["bucket"], "left").withColumn(
        "n_events", F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
    )
    return out


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Exact top-k rows per group by ``order_col``.

    A deterministic total order is required for stable results: pass
    ``tiebreak_col`` (e.g. a unique id) to break value ties; without it,
    ties at the k-th value are layout-dependent, so we raise.

    Scale shape: one Exchange on the group key, per-partition sort,
    row_number — the canonical per-group top-k; with AQE skew handling a hot
    group splits automatically (rank still correct because the sort is
    within the logical partition).
    """
    if tiebreak_col is None:
        raise ValueError("tiebreak_col is required for deterministic top-k")
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Deterministic exact-k sample per group: rank rows within each group
    by ``md5(id)`` and keep the k smallest — a seeded-by-content reservoir
    that is independent of partitioning, layout, and run order (same
    contract as ``sample_random``'s hash variant, per group).

    Scale shape: identical to ``topk_per_group`` — one Exchange on the
    group key, per-partition sort by the hash, row_number cutoff.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
