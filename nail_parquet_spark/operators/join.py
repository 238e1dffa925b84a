"""Join / set operators: merge, append, dedup, distinct (SURVEY.md §2.4,
§2.8). Catalyst picks broadcast vs sort-merge; small dimension sides get an
explicit broadcast hint from the caller when known-small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nail_parquet_spark.rowid import ROW_ID, with_row_id


def merge(left: DataFrame, right: DataFrame, key: str, join_type: str = "inner",
          right_prefix: str = "r_", broadcast_right: bool = False) -> DataFrame:
    """Equi-join with the reference's conventions (merge.rs:30-147):
    inner/left/right, key may be 'left_col=right_col'; key resolution is
    case-insensitive; right-side columns get a prefix to avoid collisions.
    Beyond the reference: 'semi'/'anti' (existence filters — the right side
    contributes no columns, so no prefixing happens and the left schema
    passes through unchanged)."""
    if join_type not in ("inner", "left", "right", "semi", "anti"):
        raise ValueError(f"join type '{join_type}' not supported (merge.rs:44-52)")
    if "=" in key:
        lk, rk = key.split("=", 1)
    else:
        lk = rk = key

    def resolve(df: DataFrame, name: str) -> str:
        if name in df.columns:
            return name
        low = {c.lower(): c for c in df.columns}
        if name.lower() in low:
            return low[name.lower()]
        raise ValueError(f"join key '{name}' not found in {df.columns}")

    lk, rk = resolve(left, lk), resolve(right, rk)
    if join_type in ("semi", "anti"):
        r1 = right.select(rk)
        if broadcast_right:
            r1 = F.broadcast(r1)
        return left.join(r1, left[lk] == r1[rk], f"left_{join_type}")
    r2 = right
    for c in right.columns:
        if c != rk:
            r2 = r2.withColumnRenamed(c, f"{right_prefix}{c}")
    if broadcast_right:
        r2 = F.broadcast(r2)
    joined = left.join(r2, left[lk] == r2[rk], join_type)
    if lk == rk:
        joined = joined.drop(r2[rk])
    return joined


def write_bucketed(df: DataFrame, table: str, bucket_col: str | list[str],
                   n_buckets: int = 64, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (and bucket-sorted) table so future equi-joins
    and aggregations on ``bucket_col`` need NO shuffle — the 100-TB answer
    for a fact table joined repeatedly on the same key. Works with Spark's
    built-in catalog; on a cluster this is the same saveAsTable against the
    warehouse/metastore."""
    bcols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.bucketBy(n_buckets, *bcols)
    if sort:
        w = w.sortBy(*bcols)
    w.mode(mode).saveAsTable(table)


def merge_bucketed(spark, left_table: str, right_table: str, key: str,
                   join_type: str = "inner", right_prefix: str = "r_") -> DataFrame:
    """merge() over two co-bucketed catalog tables: when both sides are
    bucketed on their join key with the same bucket count, the physical plan
    has no Exchange (pinned by test_plans.py)."""
    return merge(spark.table(left_table), spark.table(right_table), key,
                 join_type, right_prefix=right_prefix)


def merge_salted(left: DataFrame, right: DataFrame, key: str, salt: int = 8,
                 join_type: str = "inner", right_prefix: str = "r_") -> DataFrame:
    """merge() with explicit key salting for skewed fact-side keys: each
    left row gets a deterministic salt in [0, salt) (hash of the full row,
    so a hot key's rows spread evenly), and the right side is replicated
    ``salt``× so every (key, salt) bucket still finds its match. The
    shuffle key becomes (key, __salt) — a key holding 20% of a 100-TB fact
    table lands on ``salt`` reducers instead of one straggler.

    Use when the right side is too big to broadcast AND AQE's skew-join
    split can't kick in (e.g. the skewed agg-after-join pattern, or
    pre-AQE-partitioned inputs). Inner/left only: each right row exists
    ``salt`` times, so unmatched-right semantics are undefined here.
    Result columns match merge()'s conventions (right gets ``right_prefix``).
    """
    if join_type not in ("inner", "left"):
        raise ValueError("merge_salted supports inner|left joins only")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if "=" in key:
        lk, rk = key.split("=", 1)
    else:
        lk = rk = key
    l2 = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r2 = right
    for c in right.columns:
        if c != rk:
            r2 = r2.withColumnRenamed(c, f"{right_prefix}{c}")
    r2 = r2.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (l2[lk] == r2[rk]) & (l2["__salt"] == r2["__salt"])
    joined = l2.join(r2, cond, join_type).drop(l2["__salt"]).drop(r2["__salt"])
    if lk == rk:
        joined = joined.drop(r2[rk])
    return joined


def append(dfs: list[DataFrame], ignore_schema: bool = False) -> DataFrame:
    """UNION ALL with strict schema check, or --ignore-schema projection onto
    the base schema padding missing columns with typed NULLs
    (append.rs:23-131)."""
    base = dfs[0]
    out = base
    for other in dfs[1:]:
        if ignore_schema:
            proj = []
            other_types = dict(other.dtypes)
            for c, t in base.dtypes:
                if c in other.columns:
                    proj.append(F.col(c).cast(t).alias(c))
                else:
                    proj.append(F.lit(None).cast(t).alias(c))
            out = out.union(other.select(*proj))
        else:
            if [(f.name, f.dataType) for f in base.schema.fields] != [
                (f.name, f.dataType) for f in other.schema.fields
            ]:
                raise ValueError("schemas differ; pass ignore_schema=True (append.rs:41-46)")
            out = out.union(other)
    return out


def dedup_rows(df: DataFrame, subset: list[str] | None = None, keep: str = "first",
               order_col: str | None = None) -> DataFrame:
    """Row dedup keep-first/keep-last by deterministic row order
    (dedup.rs:67-136). keep='any' maps to dropDuplicates (cheapest)."""
    cols = subset or df.columns
    if keep == "any":
        return df.dropDuplicates(cols)
    base = with_row_id(df) if order_col is None else df
    oc = order_col or ROW_ID
    order = F.col(oc).asc() if keep == "first" else F.col(oc).desc()
    w = Window.partitionBy(*cols).orderBy(order)
    out = base.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if order_col is None:
        out = out.orderBy(ROW_ID).drop(ROW_ID)
    return out


def dedup_columns(df: DataFrame, keep: str = "first") -> DataFrame:
    """Drop value-identical columns, keeping first or last occurrence.

    The reference compares collected batches pairwise O(cols² · rows)
    (dedup.rs:138-281); here each column is reduced to one pair of
    order-sensitive aggregate fingerprints in a single distributed pass,
    and only fingerprint-equal columns are dropped.
    """
    cols = df.columns
    dtypes = dict(df.dtypes)
    base = with_row_id(df)
    aggs = []
    for c in cols:
        # the dtype is part of the fingerprint: int 1 and string '1' render
        # identically after cast but are NOT duplicate columns
        canon = F.concat_ws("\x01", F.lit(dtypes[c]), F.col(ROW_ID),
                            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        # accumulate in decimal(38,0): summing 64-bit hashes overflows long
        # under ANSI mode on any real row count
        aggs.append(F.sum(F.xxhash64(canon).cast("decimal(38,0)")).alias(f"h1__{c}"))
        aggs.append(F.sum(F.xxhash64(canon, F.lit(7)).cast("decimal(38,0)")).alias(f"h2__{c}"))
    row = base.agg(*aggs).collect()[0]
    sig = {c: (row[f"h1__{c}"], row[f"h2__{c}"]) for c in cols}
    seen: dict[tuple, str] = {}
    keep_cols = []
    order = cols if keep == "first" else list(reversed(cols))
    for c in order:
        if sig[c] in seen:
            continue
        seen[sig[c]] = c
        keep_cols.append(c)
    if keep == "last":
        keep_cols = [c for c in cols if c in set(keep_cols)]
    return df.select(*keep_cols)


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
