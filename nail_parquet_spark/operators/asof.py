"""Temporal joins Spark has no built-in operator for: as-of join and
bounded range (interval) join.

Beyond the reference surface (nail-parquet has no temporal joins); these are
the standard training-data-pipeline shapes for aligning event streams to
slowly-changing facts. Both are expressed as pure Catalyst plans — one
shuffle each, no cross join, no Python in the hot path — so they hold at
100 TB:

- ``asof_join``: union-tag + per-key window ``last(ignorenulls)`` — the
  classic scalable as-of (one Exchange on the key, one in-partition sort).
  Equivalent semantics to DuckDB/pandas ``ASOF JOIN`` (backward/forward).
- ``range_join``: coarse-bucket expansion of the interval side, equi-join on
  (key, bucket), exact residual filter — the bounded-fanout rewrite of an
  interval join (what Databricks' range-join optimization does under the
  hood), instead of the O(n·m) BroadcastNestedLoopJoin Spark would pick for
  a raw BETWEEN predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the single right row
    with the greatest ``right_ts <= left_ts`` (backward) or smallest
    ``right_ts >= left_ts`` (forward) within the same key group; left rows
    with no match keep NULLs (left-join semantics).

    Scale shape: union the two tagged sides, shuffle ONCE on the key, sort
    within each partition by (ts, side), and carry the most recent right
    value forward with ``last(..., ignorenulls=True)`` over an unbounded-
    preceding row frame. No per-key collect, no nested-loop join; the only
    skew surface is a single hot key, same as any keyed window.

    Ties (right_ts == left_ts) match unless ``strict`` — the tag sorts the
    right row before (backward) / after (strict) the left row at equal ts.

    Right side must be unique per (key, right_ts); pre-aggregate if not
    (otherwise which duplicate wins is tie-unstable under any engine).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    missing = [c for c in vals if c not in right.columns]
    if missing:
        raise ValueError(f"value_cols not in right side: {missing}")

    ts = "__asof_ts"
    side = "__asof_side"
    # Tag order at equal ts (left rows are tagged 1): non-strict wants the
    # right row BEFORE the left row in scan order so last() sees it (tag 0);
    # strict wants it AFTER so an equal-ts right row is excluded (tag 2).
    right_tag = 2 if strict else 0
    l2 = left.withColumn(ts, F.col(left_ts)).withColumn(side, F.lit(1))
    for c in vals:
        l2 = l2.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    # SQL ASOF semantics: a NULL key or NULL ts never matches. Right rows
    # carrying either would otherwise land in the window partition and leak
    # their values (NULL keys group together under partitionBy; a NULL ts
    # sorts first under ASC and would be carried to every row).
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in keys:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    r2 = r_clean.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(ts),
        F.lit(right_tag).alias(side),
        *[F.col(c).alias(f"__r_{c}") for c in vals],
    )
    left_cols = [c for c in left.columns]
    # Align the union schema: left keeps its own columns, right rows carry
    # NULL for non-key left columns.
    r2 = r2.select(
        *[
            F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        ts, side, *[f"__r_{c}" for c in vals],
    )
    l2 = l2.select(*left_cols, ts, side, *[f"__r_{c}" for c in vals])
    unioned = l2.unionByName(r2)

    # backward: greatest right_ts <= left_ts → scan ascending, carry last.
    # forward: smallest right_ts >= left_ts → scan descending, carry last.
    # Either way the side tag breaks equal-ts ties per the strict flag.
    order = [F.col(ts).asc(), F.col(side).asc()] if direction == "backward" else [
        F.col(ts).desc(), F.col(side).asc()
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in vals:
        out = out.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    out = out.filter(F.col(side) == 1)
    # a NULL left ts compares false against every right ts in SQL — never a
    # match (under DESC NULLS LAST scan order it would otherwise pick one up)
    return out.select(
        *left_cols,
        *[
            F.when(F.col(ts).isNotNull(), F.col(f"__r_{c}")).alias(c)
            for c in vals
        ],
    )


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """asof_join for a dimension-sized right side: collapse the right side
    to ONE row per key holding a ts-sorted array of (ts, values…) structs,
    broadcast it, and pick each left row's match with JVM-side
    filter + get — the left (fact) side is NEVER shuffled. At 100 TB this
    is the shape you want when the right side is a quotes/price/config
    dimension: the union-tag variant shuffles the full fact table on the
    key; this one streams it through a BroadcastHashJoin.

    Per-left-row cost is O(right rows in the key) for the array filter, so
    keep per-key right cardinality bounded (dimension scale). Same
    semantics as asof_join (left-join, ties per ``strict``); same
    uniqueness contract per (key, right_ts)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    vals = value_cols if value_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    packed = right.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(right_ts).alias("__ts"),
                         *[F.col(c) for c in vals])
            )
        ).alias("__asof_arr")
    )
    j = left.join(F.broadcast(packed), on=keys, how="left")
    lts = F.col(left_ts)
    if direction == "backward":
        pred = (lambda s: s["__ts"] < lts) if strict else (lambda s: s["__ts"] <= lts)
        pick_idx = lambda m: F.size(m) - 1  # greatest matching ts (array is sorted)
    else:
        pred = (lambda s: s["__ts"] > lts) if strict else (lambda s: s["__ts"] >= lts)
        pick_idx = lambda m: F.lit(0)  # smallest matching ts
    matches = F.filter(F.col("__asof_arr"), pred)
    pick = F.get(matches, pick_idx(matches))  # NULL when no match / no key
    return j.select(
        *left.columns, *[pick[c].alias(c) for c in vals]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals: ``right_start <= left_point <
    right_end`` within the same key group.

    Scale shape: each right interval explodes into ``ceil(len/bucket)``
    coarse time buckets (``F.sequence`` — JVM-side, no Python), the left
    point maps to one bucket, and an equi-join on (keys…, bucket) replaces
    the nested-loop BETWEEN join Catalyst would otherwise plan. Fanout is
    bounded by interval_length / bucket_seconds — pick ``bucket_seconds``
    near the typical interval length so each interval lands in 1-2 buckets.
    The residual exact BETWEEN filter runs post-join. Matches appearing in
    two buckets are impossible (the point maps to exactly one bucket), so
    no distinct pass is needed.

    Timestamps are compared at microsecond precision (cast to long micros),
    matching Spark/DuckDB timestamp comparison semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = F.lit(int(bucket_seconds))

    def secs(df: DataFrame, c: str):
        # timestamp/timestamp_ntz/date → epoch seconds at µs precision
        # (TIMESTAMP_NTZ has no direct numeric cast in Spark 4)
        t = df.schema[c].dataType.typeName()
        col = F.col(c)
        if t.startswith("timestamp") or t == "date":
            return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
        return col.cast("double")

    l2 = left.withColumn("__pt", secs(left, left_point)).withColumn(
        "__bucket", F.floor(F.col("__pt") / b)
    )
    r2 = (
        right.withColumn("__s", secs(right, right_start))
        .withColumn("__e", secs(right, right_end))
        # empty/inverted intervals can never match (end is exclusive), and
        # F.sequence would otherwise generate a DESCENDING bucket range
        .filter(F.col("__s") < F.col("__e"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / b),
                    # end is exclusive: a point exactly at __e never matches,
                    # but __e may share the floor bucket with points < __e.
                    F.floor(F.col("__e") / b),
                )
            ),
        )
    )
    # Plan aliases so self-joins (left and right derived from the same scan)
    # resolve unambiguously.
    l2, r2 = l2.alias("__rj_l"), r2.alias("__rj_r")
    cond = [F.col(f"__rj_l.{k}") == F.col(f"__rj_r.{k}") for k in keys] + [
        F.col("__rj_l.__bucket") == F.col("__rj_r.__bucket"),
        F.col("__rj_l.__pt") >= F.col("__rj_r.__s"),
        F.col("__rj_l.__pt") < F.col("__rj_r.__e"),
    ]
    joined = l2.join(r2, cond, "inner")
    out_cols = [F.col(f"__rj_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__rj_r.{c}").alias(c) for c in right.columns if c not in keys
    ]
    inner = joined.select(*out_cols)
    if how == "inner":
        return inner
    # left: anti-join the matched left rows back in with NULL right columns.
    # Null-safe equality so NULL-bearing left rows don't leak through the
    # anti join as phantom unmatched copies.
    matched_keys = inner.select(*[F.col(c) for c in left.columns]).distinct()
    anti_cond = None
    for c in left.columns:
        term = left[c].eqNullSafe(matched_keys[c])
        anti_cond = term if anti_cond is None else (anti_cond & term)
    unmatched = left.join(matched_keys, anti_cond, "left_anti")
    for c in right.columns:
        if c not in keys:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return inner.unionByName(unmatched)
