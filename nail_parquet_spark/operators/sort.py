"""Multi-key sort with per-column strategies (sort.rs:109-428; SURVEY §2.7).

Strategy = a pre-transform expression; the sort itself is Catalyst's —
a range-partitioned global sort, or sortWithinPartitions when the caller
only needs compression locality (nail optimize --sort-by parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FMT_MAP = {
    "yyyy-mm-dd": "yyyy-MM-dd",
    "mm-dd-yyyy": "MM-dd-yyyy",
    "dd-mm-yyyy": "dd-MM-yyyy",
    "yyyy/mm/dd": "yyyy/MM/dd",
    "mm/dd/yyyy": "MM/dd/yyyy",
    "dd/mm/yyyy": "dd/MM/yyyy",
}


def _strategy_expr(col: str, strategy: str, case_insensitive: bool = False,
                   fmt: str | None = None):
    c = F.col(col)
    if strategy in ("auto", "natural"):
        return F.lower(c) if case_insensitive else c
    if strategy == "numeric":
        return c.cast("double")
    if strategy == "alphabetic":
        base = c.cast("string")
        return F.lower(base) if case_insensitive else base
    if strategy == "date":
        spark_fmt = _FMT_MAP.get((fmt or "").lower(), fmt)
        return F.to_date(c.cast("string"), spark_fmt) if spark_fmt else F.to_date(c.cast("string"))
    if strategy == "timestamp":
        return F.to_timestamp(c.cast("string"))
    if strategy == "hour":
        return F.hour(F.to_timestamp(c.cast("string")))
    if strategy == "alphabetic-numeric":
        return F.struct(F.lower(c.cast("string")), c.cast("double"))
    if strategy == "numeric-alphabetic":
        return F.struct(c.cast("double"), F.lower(c.cast("string")))
    raise ValueError(f"unknown sort strategy '{strategy}'")


def sort_by(df: DataFrame, specs: list[dict | str], nulls: str = "last",
            within_partitions: bool = False) -> DataFrame:
    """specs: list of column names or dicts
    {col, desc:bool, strategy, case_insensitive, fmt}.
    nulls: first | last | skip (skip pre-filters null keys, sort.rs:126-137).
    """
    norm = []
    for s in specs:
        if isinstance(s, str):
            desc = s.startswith("-")
            norm.append({"col": s.lstrip("-"), "desc": desc, "strategy": "auto"})
        else:
            norm.append({"strategy": "auto", "desc": False, **s})

    out = df
    if nulls == "skip":
        for s in norm:
            out = out.filter(F.col(s["col"]).isNotNull())

    exprs = []
    for s in norm:
        e = _strategy_expr(s["col"], s.get("strategy", "auto"),
                           s.get("case_insensitive", False), s.get("fmt"))
        if s.get("desc"):
            e = e.desc_nulls_first() if nulls == "first" else e.desc_nulls_last()
        else:
            e = e.asc_nulls_first() if nulls == "first" else e.asc_nulls_last()
        exprs.append(e)
    if within_partitions:
        return out.sortWithinPartitions(*exprs)
    return out.orderBy(*exprs)
