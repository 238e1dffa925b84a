"""Column-shape operators: select / drop / rename / create / id / headers /
schema — the reference's projection surface (SURVEY.md §2.2, §2.12).

Each function is a pure ``DataFrame -> DataFrame`` transform; Catalyst does
projection pushdown, so a select here reaches the parquet scan's ReadSchema.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from nail_parquet_spark.rowid import with_row_id, with_row_number_by


def resolve_column_patterns(columns: list[str], patterns: list[str]) -> list[str]:
    """Reference semantics (select.rs:54-135): exact match first, then
    case-insensitive, then regex when the pattern contains ``* ^ $``.
    De-duplicates preserving first-seen order; unknown pattern -> error."""
    out: list[str] = []
    lower_map = {c.lower(): c for c in columns}
    for pat in patterns:
        pat = pat.strip()
        matched: list[str] = []
        if pat in columns:
            matched = [pat]
        elif pat.lower() in lower_map:
            matched = [lower_map[pat.lower()]]
        elif any(ch in pat for ch in "*^$"):
            rx = re.compile(pat.replace("*", ".*") if "*" in pat and not _looks_regex(pat) else pat)
            matched = [c for c in columns if rx.search(c)]
        if not matched:
            raise ValueError(f"column pattern '{pat}' matched nothing in {columns}")
        out.extend(matched)
    seen: set[str] = set()
    uniq = []
    for c in out:
        if c not in seen:
            seen.add(c)
            uniq.append(c)
    return uniq


def _looks_regex(pat: str) -> bool:
    return any(ch in pat for ch in "^$[](){}\\+?|")


def select_columns(df: DataFrame, patterns: list[str]) -> DataFrame:
    return df.select(*resolve_column_patterns(df.columns, patterns))


def drop_columns(df: DataFrame, patterns: list[str]) -> DataFrame:
    """Complement of select (drop.rs:28-40)."""
    victims = set(resolve_column_patterns(df.columns, patterns))
    return df.select(*[c for c in df.columns if c not in victims])


def parse_row_spec(spec: str) -> list[tuple[int, int]]:
    """'1,3,5-10' -> [(1,1),(3,3),(5,10)], 1-based inclusive (select.rs:137-200)."""
    ranges = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-", 1)
            ranges.append((int(lo), int(hi)))
        else:
            ranges.append((int(part), int(part)))
    return ranges


def _row_spec_cond(ranges: list[tuple[int, int]], col=None):
    col = col if col is not None else F.col("__rn")
    cond = F.lit(False)
    for lo, hi in ranges:
        cond = cond | ((col >= lo) & (col <= hi))
    return cond


def _numbered(df: DataFrame, order_col: str | None) -> DataFrame:
    """1-based global row numbers as __rn, never via a single-partition
    window: _row_id is already contiguous in input order; an explicit
    order_col goes through the range-repartition prefix-sum path."""
    if order_col is None:
        return with_row_id(df, "__rn")
    return with_row_number_by(df, order_col, "__rn")


def select_rows(df: DataFrame, spec: str, order_col: str | None = None) -> DataFrame:
    """Keep 1-based rows by spec, numbering rows deterministically."""
    return (
        _numbered(df, order_col)
        .filter(_row_spec_cond(parse_row_spec(spec)))
        .drop("__rn")
    )


def drop_rows(df: DataFrame, spec: str, order_col: str | None = None) -> DataFrame:
    return (
        _numbered(df, order_col)
        .filter(~_row_spec_cond(parse_row_spec(spec)))
        .drop("__rn")
    )


def rename_columns(df: DataFrame, specs: list[str] | dict[str, str]) -> DataFrame:
    """'before=after' specs with the reference's validations (rename.rs:17-93)."""
    if isinstance(specs, dict):
        mapping = dict(specs)
    else:
        mapping = {}
        for s in specs:
            if "=" not in s:
                raise ValueError(f"rename spec '{s}' must be before=after")
            k, v = s.split("=", 1)
            mapping[k.strip()] = v.strip()
    missing = [k for k in mapping if k not in df.columns]
    if missing:
        raise ValueError(f"columns not found: {missing}")
    targets = list(mapping.values())
    if len(set(targets)) != len(targets):
        raise ValueError("duplicate rename targets")
    conflicts = [v for v in targets if v in df.columns and v not in mapping]
    if conflicts:
        raise ValueError(f"rename targets already exist: {conflicts}")
    return df.withColumnsRenamed(mapping)


def create_columns(df: DataFrame, specs: list[str], row_filter: str | None = None) -> DataFrame:
    """'name=expression' computed columns via SQL expressions (create.rs:30-95);
    optional SQL row filter applied first."""
    out = df
    if row_filter:
        out = out.filter(F.expr(row_filter))
    for s in specs:
        if "=" not in s:
            raise ValueError(f"create spec '{s}' must be name=expression")
        name, expr = s.split("=", 1)
        out = out.withColumn(name.strip(), F.expr(expr))
    return out


def add_id_column(df: DataFrame, name: str = "id", prefix: str = "",
                  order_col: str | None = None) -> DataFrame:
    """CONCAT(prefix, ROW_NUMBER()) prepended; errors if name exists
    (id.rs:41-74)."""
    if name in df.columns:
        raise ValueError(f"column '{name}' already exists")
    base = _numbered(df, order_col)
    rn = F.col("__rn")
    idc = F.concat(F.lit(prefix), rn.cast("string")) if prefix else rn.cast("long")
    out = base.withColumn(name, idc)
    return out.select(name, *[c for c in df.columns if c != name])


def headers(df: DataFrame, pattern: str | None = None) -> list[str]:
    """Column names, optional regex filter (headers.rs:18-69)."""
    if pattern is None:
        return list(df.columns)
    rx = re.compile(pattern)
    return [c for c in df.columns if rx.search(c)]


def schema_rows(df: DataFrame) -> list[dict]:
    """name/type/nullable listing (schema.rs:15-65)."""
    return [
        {"column": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]
