"""KMV (k-minimum-values) distinct-cardinality sketch — mergeable, exact
below k, one narrow scan for any number of columns.

Why the engine needs it: the codec auto-selector (codec/select.py) and the
partition planner key decisions off distinct counts, and at 100 TB an exact
``COUNT(DISTINCT col)`` per candidate column is a full shuffle of every
distinct value PER COLUMN. The KMV estimator (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") answers the same question
from the k smallest hash values: if the k-th smallest of D distinct uniform
hashes lands at fraction f of the hash space, D ~= (k-1)/f, with relative
error ~1/sqrt(k-2) (~3% at k=1024). The reference's stats command
(``src/utils/stats.rs``) computes exact distinct counts only; this is the
beyond-reference scale path.

Execution shape (the 100-TB plan):
- ONE column-pruned scan projects every requested column's 60-bit md5 hash
  JVM-side (no Python sees raw values).
- ONE ``mapInArrow`` pass keeps a per-partition, per-column running set of
  the k smallest DISTINCT hashes (numpy: concat -> np.unique -> truncate),
  emitting <= k rows per (partition, column). No wide shuffle of distinct
  values ever happens — the only Exchange moves <= partitions*k*n_cols
  longs (a few MB at 10k partitions).
- The survivors merge with a tiny distinct + per-column window top-k; any
  hash in the global k-minimum set is necessarily in its own partition's
  k-minimum set, so local-topk -> merge is EXACTLY the global k-minimum
  set — the estimate is deterministic and partitioning-independent
  (pinned by test).

Pinned contract (DuckDB-oracle-exact, tests/test_sketch.py):
- hash: ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT`` — the
  repo-standard 60-bit md5 lane (functions/dedup.py uses the same keys).
  Values hash via their Spark/DuckDB string cast, so the sketch is pinned
  to string/integer/boolean/date columns where the two engines' casts are
  byte-identical; float columns raise (their string forms diverge).
- NULLs are excluded (COUNT(DISTINCT col) semantics).
- n_min = |k-minimum set| (= min(k, D) up to md5 collisions);
  kth = max of the set.
- est_distinct = n_min                              when n_min <  k (exact)
               = (k-1) * pow(2.0, 60) / kth         when n_min == k
  evaluated in that exact IEEE operation order on BOTH sides.
- Two distinct values sharing one 60-bit lane merge (undercount by 1);
  probability ~2^-60 per pair — the accepted md5 trade repo-wide.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window, functions as F

_HASH_SPACE_BITS = 60

_OK_KINDS = {"string", "int", "bigint", "smallint", "tinyint", "boolean",
             "date", "long"}


def _hash_expr(col: str):
    """The pinned 60-bit md5 lane of the column's string cast (JVM-side)."""
    s = F.col(col).cast("string")
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 1, 15), 16, 10) \
        .cast("long")


def kmv_distinct(df: DataFrame, columns: list[str], k: int = 1024) -> DataFrame:
    """Approximate COUNT(DISTINCT) per column from one scan.

    Returns (col_name string, n_min bigint, est_distinct double), one row
    per requested column, ordered deterministically by the caller's sort.
    ``est_distinct`` is exact whenever the column has fewer than ``k``
    distinct values. See the module docstring for the pinned contract.
    """
    if k < 2:
        raise ValueError("kmv_distinct: k must be >= 2")
    if not columns:
        raise ValueError("kmv_distinct: need at least one column")
    types = dict(df.dtypes)
    for c in columns:
        if c not in types:
            raise ValueError(f"kmv_distinct: no such column '{c}'")
        base = types[c].split("(")[0]
        if base not in _OK_KINDS:
            raise ValueError(
                f"kmv_distinct: column '{c}' has type {types[c]}; the pinned "
                "hash contract covers string/integer/boolean/date columns "
                "only (float string casts diverge between engines)")

    hashed = df.select(*[_hash_expr(c).alias(f"h{i}")
                         for i, c in enumerate(columns)])
    n_cols = len(columns)
    out_schema = pa.schema([("cid", pa.int32()), ("h", pa.int64())])

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # running k-minimum DISTINCT set per column for THIS partition
        mins: list[np.ndarray] = [np.empty(0, dtype=np.int64)] * n_cols
        for b in batches:
            for i in range(n_cols):
                # drop nulls BEFORE to_numpy: a nullable int64 column would
                # otherwise convert to float64 and lose 60-bit precision
                v = b.column(i).drop_null().to_numpy(zero_copy_only=False)
                if len(v) == 0:
                    continue
                m = np.unique(np.concatenate([mins[i], v.astype(np.int64)]))
                mins[i] = m[:k]
        cid = np.concatenate([np.full(len(m), i, dtype=np.int32)
                              for i, m in enumerate(mins)]) \
            if n_cols else np.empty(0, np.int32)
        hs = np.concatenate(mins) if n_cols else np.empty(0, np.int64)
        yield pa.RecordBatch.from_arrays(
            [pa.array(cid, pa.int32()), pa.array(hs, pa.int64())],
            schema=out_schema)

    survivors = hashed.mapInArrow(local_topk, schema="cid int, h long")

    w = Window.partitionBy("cid").orderBy("h")
    top = (survivors.distinct()
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= k))
    agg = top.groupBy("cid").agg(F.count("*").alias("n_min"),
                                 F.max("h").alias("kth"))
    name_map = F.map_from_arrays(
        F.array(*[F.lit(i) for i in range(n_cols)]),
        F.array(*[F.lit(c) for c in columns]))
    est = (F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
           .otherwise(F.lit(float(k - 1))
                      * F.pow(F.lit(2.0), F.lit(float(_HASH_SPACE_BITS)))
                      / F.col("kth").cast("double")))
    return (agg.select(name_map[F.col("cid")].alias("col_name"),
                       F.col("n_min"),
                       est.alias("est_distinct"))
            .orderBy("col_name"))


def kmv_oracle_sql(table: str, columns: list[str], k: int = 1024) -> str:
    """The DuckDB twin of :func:`kmv_distinct` — same pinned hash, set rule,
    and IEEE expression order. Used by the entry oracle and the parity
    tests; any drift between this SQL and the Spark path is a bug."""
    branches = "\n      UNION ALL\n".join(
        f"      SELECT DISTINCT '{c}' AS col_name,"
        f" ('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15))::BIGINT AS h"
        f" FROM {table} WHERE {c} IS NOT NULL"
        for c in columns)
    return f"""
        WITH hs AS (
{branches}
        ),
        ranked AS (SELECT col_name, h,
                          row_number() OVER (PARTITION BY col_name ORDER BY h) AS rn
                   FROM hs),
        agg AS (SELECT col_name, count(*) AS n_min, max(h) AS kth
                FROM ranked WHERE rn <= {k} GROUP BY col_name)
        SELECT col_name, n_min,
               CASE WHEN n_min < {k} THEN n_min::DOUBLE
                    ELSE ({k} - 1)::DOUBLE * pow(2.0, 60) / kth::DOUBLE
               END AS est_distinct
        FROM agg ORDER BY col_name"""
