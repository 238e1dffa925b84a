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
