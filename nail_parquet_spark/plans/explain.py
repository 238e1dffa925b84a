"""Plan-inspection helpers: programmatic access to what .explain() prints,
used in tests to assert that filters/projections actually reach the parquet
scan (PushedFilters / ReadSchema) and that small joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def global_windows(df: DataFrame) -> list[str]:
    """Window specs in the optimized plan with an EMPTY partition clause —
    i.e. single-partition (global) windows, the classic 100-TB straggler.

    Parses ``windowspecdefinition(part..., order ASC/DESC..., frame)`` from
    the plan string: args that are neither an ordering (`` ASC``/`` DESC``)
    nor the frame are partition columns; none -> global window."""
    txt = str(df._jdf.queryExecution().optimizedPlan())  # noqa: SLF001
    hits = []
    marker = "windowspecdefinition("
    i = 0
    while True:
        j = txt.find(marker, i)
        if j < 0:
            break
        k = j + len(marker)
        depth = 1
        while k < len(txt) and depth:
            if txt[k] == "(":
                depth += 1
            elif txt[k] == ")":
                depth -= 1
            k += 1
        spec = txt[j + len(marker) : k - 1]
        i = k
        parts = [
            a
            for a in _split_top_level(spec)
            if " ASC" not in a and " DESC" not in a
            and not a.startswith("specifiedwindowframe")
        ]
        if not parts:
            hits.append(spec)
    return hits


def assert_pushdown(df: DataFrame, pushed_filter_frag: str | None = None,
                    read_schema_cols: list[str] | None = None,
                    broadcast: bool = False) -> str:
    """Raise if the physical plan lacks the expected scan-level pushdowns."""
    txt = plan_text(df)
    if pushed_filter_frag and pushed_filter_frag not in txt:
        raise AssertionError(f"filter '{pushed_filter_frag}' not pushed to scan:\n{txt}")
    if read_schema_cols:
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", txt)
        if not m:
            raise AssertionError(f"no ReadSchema in plan:\n{txt}")
        got = {c.split(":")[0] for c in m.group(1).split(",") if c}
        want = set(read_schema_cols)
        if got != want:
            raise AssertionError(f"scan reads {sorted(got)}, expected {sorted(want)}")
    if broadcast and "BroadcastHashJoin" not in txt:
        raise AssertionError(f"expected broadcast join:\n{txt}")
    return txt
