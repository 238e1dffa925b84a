"""Row-shape operators: filter / search / head / tail / sample / shuffle /
split (SURVEY.md §2.3, §2.7, §2.10).

All sampling/shuffling is seeded-deterministic and fully distributed —
replacing the reference's driver-side collect paths (shuffle.rs:33-123,
sample.rs:105-132) with ``rand(seed)`` / hash-based assignment that scales
to any row count.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from nail_parquet_spark.rowid import ROW_ID, with_row_id

_COND_RE = re.compile(r"^\s*([A-Za-z0-9_.]+)\s*(>=|<=|!=|=|>|<)\s*(.*?)\s*$")
_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
}


def _lit_infer(raw: str):
    """Reference literal inference: i64 -> f64 -> string (filter.rs:84-119)."""
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw.strip("'\"")


def parse_conditions(spec: str):
    """'age>25,status=active' -> ANDed Column predicate (filter.rs:62-119)."""
    conds = []
    for part in spec.split(","):
        m = _COND_RE.match(part)
        if not m:
            raise ValueError(f"cannot parse condition '{part}'")
        col, op, raw = m.groups()
        conds.append(_OPS[op](F.col(col), F.lit(_lit_infer(raw))))
    return reduce(lambda a, b: a & b, conds)


def filter_conditions(df: DataFrame, spec: str) -> DataFrame:
    return df.filter(parse_conditions(spec))


def drop_rows_where(df: DataFrame, spec: str) -> DataFrame:
    """Drop rows matching ANDed conditions (drop.rs:88-158)."""
    return df.filter(~parse_conditions(spec))


def _numeric_cols(df: DataFrame) -> list[str]:
    from nail_parquet_spark.operators.agg import numeric_cols

    return numeric_cols(df)


def _string_cols(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t == "string"]


def filter_rows_mode(df: DataFrame, mode: str) -> DataFrame:
    """Row filters no-nan / numeric-only / char-only / no-zeros
    (filter.rs:128-200)."""
    if mode == "no-nan":
        return df.na.drop("any")
    if mode == "numeric-only":
        cols = _numeric_cols(df)
        return df.na.drop("any", subset=cols) if cols else df
    if mode == "char-only":
        conds = [F.col(c).isNotNull() & (F.col(c) != "") for c in _string_cols(df)]
        return df.filter(reduce(lambda a, b: a & b, conds)) if conds else df
    if mode == "no-zeros":
        conds = [F.col(c) != 0 for c in _numeric_cols(df)]
        return df.filter(reduce(lambda a, b: a & b, conds)) if conds else df
    raise ValueError(f"unknown row filter mode '{mode}'")


def search_value(df: DataFrame, value: str, columns: list[str] | None = None,
                 case_insensitive: bool = False, exact: bool = False) -> DataFrame:
    """OR of per-column predicates: strings LIKE %v% / =, numerics = or
    cast-to-string contains (search.rs:59-134)."""
    cols = columns or df.columns
    dt = dict(df.dtypes)
    preds = []
    for c in cols:
        col = F.col(c)
        if dt[c] == "string":
            lhs = F.lower(col) if case_insensitive else col
            v = value.lower() if case_insensitive else value
            preds.append(lhs == v if exact else lhs.contains(v))
        else:
            num = _lit_infer(value)
            if isinstance(num, (int, float)):
                preds.append(col == F.lit(num))
            if not exact:
                preds.append(col.cast("string").contains(value))
    if not preds:
        return df.limit(0)
    return df.filter(reduce(lambda a, b: a | b, preds))


def search_rows(df: DataFrame, value: str, columns: list[str] | None = None,
                case_insensitive: bool = False, exact: bool = False) -> DataFrame:
    """--rows variant: emit (row_number, search_value, matched_columns)
    (search.rs:136-233)."""
    cols = columns or df.columns
    dt = dict(df.dtypes)
    # _row_id is already the contiguous 1..N global number — no extra window
    base = with_row_id(df).withColumn("row_number", F.col(ROW_ID))
    matches = []
    for c in cols:
        col = F.col(c)
        if dt.get(c) == "string":
            lhs = F.lower(col) if case_insensitive else col
            v = value.lower() if case_insensitive else value
            pred = (lhs == v) if exact else lhs.contains(v)
        else:
            s = col.cast("string")
            pred = (s == value) if exact else s.contains(value)
        matches.append(F.when(pred, F.lit(c)))
    arr = F.array_compact(F.array(*matches))
    out = (
        base.withColumn("__m", arr)
        .filter(F.size("__m") > 0)
        .select(
            "row_number",
            F.lit(value).alias("search_value"),
            F.array_join("__m", ",").alias("matched_columns"),
        )
    )
    return out


def head(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def tail(df: DataFrame, n: int, order_col: str | None = None) -> DataFrame:
    """Last n rows in row-id order (tail.rs:17-78 uses total-count offset).

    ``orderBy(desc).limit(n)`` compiles to TakeOrderedAndProject —
    per-partition top-n merged on the driver, no global window."""
    base = with_row_id(df) if order_col is None else df
    oc = order_col or ROW_ID
    out = base.orderBy(F.col(oc).desc()).limit(n).orderBy(F.col(oc))
    return out.drop(ROW_ID) if order_col is None else out


def sample_random(df: DataFrame, n: int, seed: int | None = None) -> DataFrame:
    """Exact-n seeded random sample, distributed (replaces sample.rs:78-132's
    three size-dependent strategies).

    ``orderBy(rand).limit(n)`` compiles to TakeOrderedAndProject (per-
    partition top-n, driver merge) — the previous row_number-over-global-
    window plan funneled the whole table into one task."""
    return df.orderBy(F.rand(seed) if seed is not None else F.rand()).limit(n)


def sample_fraction(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def sample_stratified(df: DataFrame, category: str, n: int, seed: int | None = None) -> DataFrame:
    """Proportional allocation with exact per-category counts via window
    rank over rand (sample.rs:135-267 semantics, distributed)."""
    total = df.count()
    if total == 0:
        return df
    frac = n / total
    w = Window.partitionBy(category).orderBy(F.rand(seed) if seed is not None else F.rand())
    counts = df.groupBy(category).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.withColumn("__take", F.greatest(F.lit(1), F.round(F.col("__cnt") * frac).cast("long")))
    return (
        df.join(F.broadcast(counts), category)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= F.col("__take"))
        .drop("__r", "__cnt", "__take")
    )


def shuffle_rows(df: DataFrame, seed: int | None = None) -> DataFrame:
    """Distributed seeded shuffle (replaces collect-everything
    shuffle.rs:33-123)."""
    return df.orderBy(F.rand(seed) if seed is not None else F.rand())


def split_by_ratio(df: DataFrame, ratios: list[float], seed: int | None = None,
                   stratify_by: str | None = None) -> list[DataFrame]:
    """Cumulative-fraction split on a per-row uniform draw; stratified mode
    ranks within each category so every slice gets its share of each class
    (split.rs:90-264 semantics, distributed and exact-ish)."""
    s = sum(ratios)
    cum = []
    acc = 0.0
    for r in ratios:
        acc += r / s
        cum.append(acc)
    if stratify_by is None:
        tagged = df.withColumn("__u", F.rand(seed) if seed is not None else F.rand())
    else:
        w = Window.partitionBy(stratify_by).orderBy(F.rand(seed) if seed is not None else F.rand())
        cnt = Window.partitionBy(stratify_by)
        tagged = df.withColumn(
            "__u",
            (F.row_number().over(w) - 0.5) / F.count(F.lit(1)).over(cnt),
        )
    out = []
    lo = 0.0
    for hi in cum:
        out.append(tagged.filter((F.col("__u") >= lo) & (F.col("__u") < hi + 1e-12)).drop("__u"))
        lo = hi
    return out


def split_by_group(df: DataFrame, group_col: str, ratios: list[float],
                   seed: int = 0) -> list[DataFrame]:
    """Leakage-safe split: every row sharing a group key lands in the SAME
    slice. Row-level splits leak at training time — near-duplicate pages
    from one site (or one user's events) straddle the train/test boundary
    and inflate eval scores — so web corpora split by host/domain/user.

    The group's uniform draw is pinned and portable (no Spark-private
    hash): ``u = int(md5(group_str || ':' || seed)[:15 hex]) / 2^60`` —
    the same 60-bit md5 lane every other cross-engine operator in this
    repo uses — and the slice is the cumulative-ratio bucket containing
    ``u``. Deterministic across engines, layouts, and partition counts;
    re-running with a different seed re-deals groups. NULL groups take the
    sentinel ``'\\x00'`` string and land together in one slice (pinned).

    Scale shape: a pure per-row projection — no shuffle, no group
    materialization, no window; the group never needs to be collected or
    counted. Slice sizes converge to the ratios in GROUPS (not rows):
    a hot host with millions of pages moves as one unit, which is the
    point.
    """
    if not ratios or any(r <= 0 for r in ratios):
        raise ValueError("split_by_group: ratios must be positive")
    s = float(sum(ratios))
    gs = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(gs, F.lit(":" + str(int(seed)))),
                               "UTF-8")),
                1, 15),
            16, 10,
        ).cast("bigint").cast("double")
        / float(1 << 60)
    )
    tagged = df.withColumn("__u", u)
    out = []
    lo = 0.0
    acc = 0.0
    for i, r in enumerate(ratios):
        acc += r / s
        hi = acc if i < len(ratios) - 1 else 1.0 + 1e-12
        out.append(
            tagged.filter((F.col("__u") >= lo) & (F.col("__u") < hi))
            .drop("__u"))
        lo = acc
    return out


def preview(df: DataFrame, n: int = 10, seed: int | None = None):
    """Seeded random preview rows (preview.rs:42-100, sans TUI)."""
    return sample_random(df, n, seed)
