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
import pyarrow.compute as pc
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

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


def _validate_cols(df: DataFrame, cols: list[str], role: str) -> None:
    types = dict(df.dtypes)
    for c in cols:
        if c not in types:
            raise ValueError(f"kmv sketch: no such column '{c}'")
        if types[c].split("(")[0] not in _OK_KINDS:
            raise ValueError(
                f"kmv sketch: {role} column '{c}' has type {types[c]}; the "
                "pinned contract covers string/integer/boolean/date columns "
                "only (float string casts diverge between engines)")


def _adjacent_changed(col: pa.Array) -> np.ndarray:
    """Null-safe bool[n-1]: does row i+1 differ from row i in this column?
    (null vs null = unchanged; null vs value = changed)."""
    n = len(col)
    a, b = col.slice(0, n - 1), col.slice(1)
    neq = pc.fill_null(pc.not_equal(a, b), False)
    flip = pc.xor(pc.is_null(a), pc.is_null(b))
    return np.asarray(pc.or_(neq, flip))


def _group_topk(t: pa.Table, keys: list[str], k: int) -> pa.Table:
    """k smallest DISTINCT ``h`` per key group — one arrow sort plus
    vectorized boundary arithmetic; any total order works for grouping, so
    arrow's native orderings (with nulls at the end) are fine."""
    n = len(t)
    if n == 0:
        return t
    t = t.sort_by([(c, "ascending") for c in keys] + [("h", "ascending")])
    new_grp = np.ones(n, dtype=bool)
    if n > 1:
        changed = np.zeros(n - 1, dtype=bool)
        for c in keys:
            changed |= _adjacent_changed(t.column(c).combine_chunks())
        new_grp[1:] = changed
        # distinct (group, h) pairs: h never null, so plain inequality works
        h = t.column("h").to_numpy()
        t = t.filter(pa.array(new_grp | np.concatenate(
            [[True], h[1:] != h[:-1]])))
        # recompute group starts on the surviving rows
        n = len(t)
        new_grp = np.ones(n, dtype=bool)
        if n > 1:
            changed = np.zeros(n - 1, dtype=bool)
            for c in keys:
                changed |= _adjacent_changed(t.column(c).combine_chunks())
            new_grp[1:] = changed
    starts = np.flatnonzero(new_grp)
    counts = np.diff(np.append(starts, n))
    rank = np.arange(n) - np.repeat(starts, counts)
    return t.filter(pa.array(rank < k))


def kmv_distinct_by(df: DataFrame, keys: list[str], value: str,
                    k: int = 1024) -> DataFrame:
    """Approximate ``COUNT(DISTINCT value)`` per key group — e.g. distinct
    URLs per host over a crawl — without shuffling every distinct value.

    Same pinned KMV contract as :func:`kmv_distinct`, applied per group:
    one ``mapInArrow`` pass keeps the k smallest distinct value hashes per
    (partition, group), so the only Exchange carries <= partitions*k rows
    PER GROUP (vs the full distinct (key, value) shuffle of an exact
    grouped count-distinct). The global per-group k-minimum set is exactly
    the merge of the partition-local ones, so the estimate is deterministic
    and partitioning-independent. NULL group keys form their own group
    (SQL GROUP BY semantics); NULL values are excluded.

    Returns ``(*keys, n_min bigint, est_distinct double)`` ordered by keys.
    """
    if k < 2:
        raise ValueError("kmv_distinct_by: k must be >= 2")
    if not keys:
        raise ValueError("kmv_distinct_by: need at least one key column")
    _validate_cols(df, keys, "key")
    _validate_cols(df, [value], "value")

    hashed = (df.filter(F.col(value).isNotNull())
              .select(*keys, _hash_expr(value).alias("h")))
    out_fields = [hashed.schema[c] for c in keys]
    out_schema = T.StructType(out_fields + [T.StructField("h", T.LongType(),
                                                          False)])
    # compact the running per-partition state whenever the accumulated
    # batches exceed ~1M rows, so memory stays bounded at groups*k + 1M
    compact_rows = 1 << 20

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: list[pa.Table] = []
        nrows = 0
        for b in batches:
            acc.append(pa.Table.from_batches([b]))
            nrows += len(b)
            if nrows >= compact_rows:
                acc = [_group_topk(pa.concat_tables(acc), keys, k)]
                nrows = len(acc[0])
        if acc:
            out = _group_topk(pa.concat_tables(acc), keys, k)
            for ob in out.to_batches():
                yield ob

    survivors = hashed.mapInArrow(local_topk, schema=out_schema)
    w = Window.partitionBy(*keys).orderBy("h")
    top = (survivors.distinct()
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= k))
    agg = top.groupBy(*keys).agg(F.count("*").alias("n_min"),
                                 F.max("h").alias("kth"))
    est = (F.when(F.col("n_min") < k, F.col("n_min").cast("double"))
           .otherwise(F.lit(float(k - 1))
                      * F.pow(F.lit(2.0), F.lit(float(_HASH_SPACE_BITS)))
                      / F.col("kth").cast("double")))
    return (agg.select(*keys, F.col("n_min"), est.alias("est_distinct"))
            .orderBy(*keys))


def _bottom_k(df: DataFrame, column: str, k: int) -> DataFrame:
    """The k smallest distinct pinned hashes of ``column`` (one column ``h``).
    Local per-partition k-minimum sets in mapInArrow, then a tiny
    TakeOrderedAndProject merge — same shuffle bound as :func:`kmv_distinct`.
    """
    hashed = df.select(_hash_expr(column).alias("h0"))
    out_schema = pa.schema([("h", pa.int64())])

    def local_topk(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        mins = np.empty(0, dtype=np.int64)
        for b in batches:
            v = b.column(0).drop_null().to_numpy(zero_copy_only=False)
            if len(v):
                mins = np.unique(np.concatenate([mins, v.astype(np.int64)]))[:k]
        yield pa.RecordBatch.from_arrays([pa.array(mins, pa.int64())],
                                         schema=out_schema)

    return (hashed.mapInArrow(local_topk, schema="h long")
            .distinct().orderBy("h").limit(k))


def kmv_overlap(df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str,
                k: int = 1024) -> DataFrame:
    """Distinct-set overlap between two corpora from bottom-k sketches —
    e.g. 'how many distinct URLs do crawl A and crawl B share' — without
    ever joining or shuffling the value sets (only <= 2k hashes move).

    Estimator (Bar-Yossef et al. / Beyer et al. bottom-k set ops): with
    SU = the k smallest hashes of the UNION and SA/SB each side's k-minimum
    set, every member of SU is known to belong to A (it is in SA) or not,
    so ``jaccard = |{h in SU : h in SA and h in SB}| / |SU|`` and
    ``est_intersection = jaccard * est_union``. All quantities are exact
    whenever both sides have fewer than k distinct values. Deterministic
    (same pinned hash as :func:`kmv_distinct`), hence oracle-attestable.

    Returns ONE row: (n_union bigint, est_a double, est_b double,
    est_union double, jaccard double, est_intersection double).
    """
    if k < 2:
        raise ValueError("kmv_overlap: k must be >= 2")
    _validate_cols(df_a, [col_a], "value")
    _validate_cols(df_b, [col_b], "value")
    ta = _bottom_k(df_a, col_a, k).cache()
    tb = _bottom_k(df_b, col_b, k).cache()
    tu = ta.unionAll(tb).distinct().orderBy("h").limit(k)

    def est(n_col, kth_col):
        return (F.when(n_col < k, n_col.cast("double"))
                .otherwise(F.lit(float(k - 1))
                           * F.pow(F.lit(2.0), F.lit(float(_HASH_SPACE_BITS)))
                           / kth_col.cast("double")))

    def summary(t, prefix):
        return t.agg(F.count("*").alias(f"n_{prefix}"),
                     F.max("h").alias(f"kth_{prefix}"))

    inter = (tu.join(ta, "h", "left_semi").join(tb, "h", "left_semi")
             .agg(F.count("*").alias("n_inter")))
    row = (summary(ta, "a").crossJoin(summary(tb, "b"))
           .crossJoin(summary(tu, "u")).crossJoin(inter))
    jac = (F.when(F.col("n_u") == 0, F.lit(0.0))
           .otherwise(F.col("n_inter").cast("double")
                      / F.col("n_u").cast("double")))
    return row.select(
        F.col("n_u").alias("n_union"),
        est(F.col("n_a"), F.col("kth_a")).alias("est_a"),
        est(F.col("n_b"), F.col("kth_b")).alias("est_b"),
        est(F.col("n_u"), F.col("kth_u")).alias("est_union"),
        jac.alias("jaccard"),
        (jac * est(F.col("n_u"), F.col("kth_u"))).alias("est_intersection"))


def kmv_overlap_oracle_sql(table_a: str, col_a: str, table_b: str,
                           col_b: str, k: int = 1024) -> str:
    """DuckDB twin of :func:`kmv_overlap` — same pinned hash, bottom-k
    rule, and IEEE expression order (jaccard computed before the product).
    """
    def side(t, c):
        return (f"SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn"
                f" FROM (SELECT DISTINCT ('0x' || substr(md5(CAST({c} AS"
                f" VARCHAR)), 1, 15))::BIGINT AS h FROM {t}"
                f" WHERE {c} IS NOT NULL)) WHERE rn <= {k}")

    def est(n, kth):
        return (f"CASE WHEN {n} < {k} THEN {n}::DOUBLE ELSE ({k} - 1)::DOUBLE"
                f" * pow(2.0, 60) / {kth}::DOUBLE END")

    return f"""
        WITH ta AS ({side(table_a, col_a)}),
        tb AS ({side(table_b, col_b)}),
        tu AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn
                              FROM (SELECT DISTINCT h FROM (SELECT h FROM ta
                                    UNION ALL SELECT h FROM tb)))
               WHERE rn <= {k}),
        sa AS (SELECT count(*) AS n_a, max(h) AS kth_a FROM ta),
        sb AS (SELECT count(*) AS n_b, max(h) AS kth_b FROM tb),
        su AS (SELECT count(*) AS n_u, max(h) AS kth_u FROM tu),
        si AS (SELECT count(*) AS n_inter FROM tu
               WHERE h IN (SELECT h FROM ta) AND h IN (SELECT h FROM tb)),
        j AS (SELECT CASE WHEN n_u = 0 THEN 0.0
                          ELSE n_inter::DOUBLE / n_u::DOUBLE END AS jaccard
              FROM su, si)
        SELECT n_u AS n_union, {est('n_a', 'kth_a')} AS est_a,
               {est('n_b', 'kth_b')} AS est_b,
               {est('n_u', 'kth_u')} AS est_union, jaccard,
               jaccard * {est('n_u', 'kth_u')} AS est_intersection
        FROM sa, sb, su, si, j"""


def _grouped_bottom_k(df: DataFrame, keys: list[str], column: str,
                      k: int) -> DataFrame:
    """Per-group k smallest distinct pinned hashes of ``column`` (columns
    ``keys + [h]``). One distinct on (keys, h) then a keyed window rank —
    both shuffles are keyed, no global window, rows bounded by
    groups * min(k, distinct)."""
    h = (df.select(*keys, _hash_expr(column).alias("h"))
         .filter(F.col("h").isNotNull()))
    for kcol in keys:
        h = h.filter(F.col(kcol).isNotNull())
    h = h.distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def kmv_overlap_by(df_a: DataFrame, keys: list[str], col_a: str,
                   df_b: DataFrame, col_b: str, k: int = 1024) -> DataFrame:
    """Per-group distinct-set overlap between two corpora from grouped
    bottom-k sketches — 'per language (or per host, per crawl segment),
    how many distinct URLs do crawl A and crawl B share'. The grouped form
    of :func:`kmv_overlap`: per group only <= 2k hashes ever meet, the
    value sets themselves never join or shuffle across groups.

    Both frames must carry the ``keys`` columns under the same names.
    Rows with a NULL group key are EXCLUDED (pinned: the group joins are
    null-strict, mirrored in the oracle); NULL values are excluded as
    everywhere in this module. Estimator and IEEE operation order are
    exactly :func:`kmv_overlap`'s, per group; groups present on one side
    only report est=0 for the missing side and jaccard 0 when nothing
    intersects. Deterministic -> oracle-attestable.

    Returns one row per group: (*keys, n_union bigint, est_a, est_b,
    est_union, jaccard, est_intersection double), ordered by keys.
    """
    if k < 2:
        raise ValueError("kmv_overlap_by: k must be >= 2")
    if not keys:
        raise ValueError("kmv_overlap_by: keys must be non-empty "
                         "(use kmv_overlap for the ungrouped form)")
    _validate_cols(df_a, keys + [col_a], "value")
    _validate_cols(df_b, keys + [col_b], "value")
    ta = _grouped_bottom_k(df_a, keys, col_a, k).cache()
    tb = _grouped_bottom_k(df_b, keys, col_b, k).cache()
    w = Window.partitionBy(*keys).orderBy("h")
    tu = (ta.unionAll(tb).distinct()
          .withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= k).drop("rn"))

    def summary(t, prefix):
        return t.groupBy(*keys).agg(
            F.count("*").alias(f"n_{prefix}"),
            F.max("h").alias(f"kth_{prefix}"))

    si = (tu.join(ta, keys + ["h"], "left_semi")
          .join(tb, keys + ["h"], "left_semi")
          .groupBy(*keys).agg(F.count("*").alias("n_inter")))
    base = (summary(tu, "u")
            .join(summary(ta, "a"), keys, "left")
            .join(summary(tb, "b"), keys, "left")
            .join(si, keys, "left"))

    def est(n_col, kth_col):
        n0 = F.coalesce(n_col, F.lit(0))
        return (F.when(n0 < k, n0.cast("double"))
                .otherwise(F.lit(float(k - 1))
                           * F.pow(F.lit(2.0), F.lit(float(_HASH_SPACE_BITS)))
                           / kth_col.cast("double")))

    jac = (F.when(F.col("n_u") == 0, F.lit(0.0))
           .otherwise(F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                      / F.col("n_u").cast("double")))
    stage = base.select(
        *keys,
        F.col("n_u").alias("n_union"),
        est(F.col("n_a"), F.col("kth_a")).alias("est_a"),
        est(F.col("n_b"), F.col("kth_b")).alias("est_b"),
        est(F.col("n_u"), F.col("kth_u")).alias("est_union"),
        jac.alias("jaccard"))
    return (stage
            .withColumn("est_intersection",
                        F.col("jaccard") * F.col("est_union"))
            .orderBy(*keys))


def kmv_overlap_by_oracle_sql(table_a: str, keys: list[str], col_a: str,
                              table_b: str, col_b: str,
                              k: int = 1024) -> str:
    """DuckDB twin of :func:`kmv_overlap_by` — same pinned hash, grouped
    bottom-k rule, null-strict keys, and IEEE expression order (jaccard
    and est_union named in a subquery, product taken outside)."""
    ks = ", ".join(keys)
    knn = " AND ".join(f"{x} IS NOT NULL" for x in keys)

    def side(t, c):
        return (f"SELECT {ks}, h FROM (SELECT {ks}, h, row_number() OVER "
                f"(PARTITION BY {ks} ORDER BY h) rn FROM (SELECT DISTINCT "
                f"{ks}, ('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15))"
                f"::BIGINT AS h FROM {t} WHERE {c} IS NOT NULL AND {knn}))"
                f" WHERE rn <= {k}")

    def est(n, kth):
        return (f"CASE WHEN coalesce({n}, 0) < {k} "
                f"THEN coalesce({n}, 0)::DOUBLE "
                f"ELSE ({k} - 1)::DOUBLE * pow(2.0, 60) / {kth}::DOUBLE END")

    uks = ", ".join(f"u.{x}" for x in keys)
    return f"""
        WITH ta AS ({side(table_a, col_a)}),
        tb AS ({side(table_b, col_b)}),
        tu AS (SELECT {ks}, h FROM (SELECT {ks}, h, row_number() OVER
                   (PARTITION BY {ks} ORDER BY h) rn
               FROM (SELECT DISTINCT {ks}, h FROM
                     (SELECT {ks}, h FROM ta
                      UNION ALL SELECT {ks}, h FROM tb)))
               WHERE rn <= {k}),
        sa AS (SELECT {ks}, count(*) AS n_a, max(h) AS kth_a
               FROM ta GROUP BY {ks}),
        sb AS (SELECT {ks}, count(*) AS n_b, max(h) AS kth_b
               FROM tb GROUP BY {ks}),
        su AS (SELECT {ks}, count(*) AS n_u, max(h) AS kth_u
               FROM tu GROUP BY {ks}),
        si AS (SELECT {uks}, count(*) AS n_inter
               FROM tu u
               JOIN ta USING ({ks}, h) JOIN tb USING ({ks}, h)
               GROUP BY {uks})
        SELECT {ks}, n_union, est_a, est_b, est_union, jaccard,
               jaccard * est_union AS est_intersection
        FROM (SELECT {ks}, n_u AS n_union,
                     {est('n_a', 'kth_a')} AS est_a,
                     {est('n_b', 'kth_b')} AS est_b,
                     {est('n_u', 'kth_u')} AS est_union,
                     CASE WHEN n_u = 0 THEN 0.0
                          ELSE coalesce(n_inter, 0)::DOUBLE / n_u::DOUBLE
                     END AS jaccard
              FROM su LEFT JOIN sa USING ({ks}) LEFT JOIN sb USING ({ks})
              LEFT JOIN si USING ({ks}))
        ORDER BY {ks}"""


_NUM_KINDS = {"int", "bigint", "smallint", "tinyint", "long", "float",
              "double", "decimal"}


def approx_quantiles(df: DataFrame, id_col: str, columns: list[str],
                     qs: list[float], k: int = 4096) -> DataFrame:
    """Approximate quantiles from a DETERMINISTIC uniform row sample: the k
    rows with the smallest pinned 60-bit md5 hash of ``id_col``, then exact
    interpolated quantiles over the sample.

    Why not ``percentile_approx``: Spark's GK sketch is neither mergeable
    across engines nor reproducible in SQL, so its answers cannot be
    oracle-attested. Hashing a UNIQUE id gives a uniform sample that both
    engines derive identically (rank error ~ O(1/sqrt(k)) — ~1.6% at the
    default k=4096), and Spark's exact ``percentile`` matches DuckDB's
    ``quantile_cont`` bit-for-bit on doubles (same 1+(n-1)q rank rule).

    Execution: ONE column-pruned scan; ``orderBy(h).limit(k)`` compiles to
    TakeOrderedAndProject (per-partition top-k, driver merge — no global
    window, no full sort); the quantile agg then runs over <= k rows.
    Precondition: ``id_col`` values are unique (the repo-wide id contract) —
    the hash tie-break makes the sample deterministic only then. NULL
    values inside sampled rows are excluded per column (SQL semantics).

    Returns ``(col_name string, q double, value double)`` ordered by
    (col_name, q).
    """
    if k < 1:
        raise ValueError("approx_quantiles: k must be >= 1")
    if not columns:
        raise ValueError("approx_quantiles: need at least one column")
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("approx_quantiles: quantiles must be in [0, 1]")
    _validate_cols(df, [id_col], "id")
    types = dict(df.dtypes)
    for c in columns:
        if c not in types:
            raise ValueError(f"approx_quantiles: no such column '{c}'")
        if types[c].split("(")[0] not in _NUM_KINDS:
            raise ValueError(
                f"approx_quantiles: column '{c}' has type {types[c]}; "
                "quantiles need a numeric column")

    sample = (df.select(_hash_expr(id_col).alias("__h"),
                        F.col(id_col).cast("string").alias("__id"),
                        *columns)
              .orderBy("__h", "__id").limit(k))
    aggs = [F.percentile(F.col(c).cast("double"),
                         F.lit([float(q) for q in qs])).alias(f"p__{c}")
            for c in columns]
    wide = sample.agg(*aggs)
    rows = [F.struct(F.lit(c).alias("col_name"), F.lit(float(q)).alias("q"),
                     F.col(f"p__{c}")[i].alias("value"))
            for c in columns for i, q in enumerate(qs)]
    return (wide.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.col_name", "r.q", "r.value")
            .orderBy("col_name", "q"))


def kmv_by_oracle_sql(table: str, keys: list[str], value: str,
                      k: int = 1024) -> str:
    """DuckDB twin of :func:`kmv_distinct_by` — same pinned hash, per-group
    k-minimum rule, and IEEE expression order."""
    ks = ", ".join(keys)
    # Spark's ascending sort is NULLS FIRST; DuckDB defaults to NULLS LAST
    order = ", ".join(f"{c} NULLS FIRST" for c in keys)
    return f"""
        WITH hs AS (
          SELECT DISTINCT {ks},
                 ('0x' || substr(md5(CAST({value} AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM {table} WHERE {value} IS NOT NULL
        ),
        ranked AS (SELECT {ks}, h,
                          row_number() OVER (PARTITION BY {ks} ORDER BY h) AS rn
                   FROM hs),
        agg AS (SELECT {ks}, count(*) AS n_min, max(h) AS kth
                FROM ranked WHERE rn <= {k} GROUP BY {ks})
        SELECT {ks}, n_min,
               CASE WHEN n_min < {k} THEN n_min::DOUBLE
                    ELSE ({k} - 1)::DOUBLE * pow(2.0, 60) / kth::DOUBLE
               END AS est_distinct
        FROM agg ORDER BY {order}"""


def quantiles_oracle_sql(table: str, id_col: str, columns: list[str],
                         qs: list[float], k: int = 4096) -> str:
    """DuckDB twin of :func:`approx_quantiles` — same pinned hash sample
    (ORDER BY h, id-string LIMIT k) and the same 1+(n-1)q interpolation
    (``quantile_cont`` == Spark ``percentile`` on doubles)."""
    branches = "\n      UNION ALL\n".join(
        f"      SELECT '{c}' AS col_name, {float(q)}::DOUBLE AS q,"
        f" quantile_cont({c}::DOUBLE, {float(q)}) AS value FROM smp"
        for c in columns for q in qs)
    return f"""
        WITH smp AS (
          SELECT * FROM {table}
          ORDER BY ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT,
                   CAST({id_col} AS VARCHAR)
          LIMIT {k}
        )
{branches}
        ORDER BY col_name, q"""


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


def heavy_hitters(df: DataFrame, column: str, k: int = 10,
                  capacity: int | None = None) -> DataFrame:
    """EXACT top-k most frequent values via distributed Misra-Gries
    candidate generation + exact verification — the frequent-items answer
    that never shuffles the full column.

    Why: ``GROUP BY col ORDER BY count DESC LIMIT k`` shuffles every
    distinct value; at 100 TB a high-cardinality column (url, host) makes
    that the job's dominant Exchange even though only ~k keys matter.
    Misra-Gries (1982) keeps a ``c``-entry summary per partition in one
    streaming pass; the UNION of per-partition summaries provably contains
    every value with global count > n/(c+1): if a value is absent from a
    partition's final summary, each of its occurrences there was cancelled
    by a decrement event that simultaneously removed mass from c other
    keys, so its count in that partition is <= n_p/(c+1) — summing over
    partitions bounds the global count. Candidates are then counted
    EXACTLY with a semi-join-restricted groupBy (only candidate rows'
    keys shuffle, map-side partially aggregated).

    Exactness guard (makes the operator unconditionally exact, never
    approximate): the top-k of the candidate counts is provably the global
    top-k iff the k-th candidate count > n/(c+1) (no value outside the
    candidate set can reach it). When the guard fails — a pathologically
    flat distribution, or fewer than k candidates — the function falls
    back to the plain full groupBy. The sketch is purely a shuffle
    optimization; results are identical either way (pinned by test on
    adversarial layouts).

    Pinned contract: NULLs excluded; ties broken by value ascending
    (string cast order is NOT used — the native column orders); returns
    (``column``, count bigint) ordered count desc, value asc, <= k rows.
    Driver pull is bounded: <= capacity * n_partitions candidate values +
    <= that many exact counts (tiny structured rows, never corpus data).
    Column kinds: same portable set as :func:`kmv_distinct`.

    ``capacity`` defaults to ``8 * k`` (guard headroom ~n/(8k+1)).
    """
    if k < 1:
        raise ValueError("heavy_hitters: k must be >= 1")
    c = int(capacity) if capacity is not None else 8 * k
    if c < k:
        raise ValueError("heavy_hitters: capacity must be >= k")
    types = dict(df.dtypes)
    if column not in types:
        raise ValueError(f"heavy_hitters: no such column '{column}'")
    base = types[column].split("(")[0]
    if base not in _OK_KINDS:
        raise ValueError(
            f"heavy_hitters: column '{column}' has type {types[column]}; "
            "supported kinds: string/integer/boolean/date (exact value "
            "round-trip through the candidate set is required)")

    src = df.select(F.col(column).alias("v")).filter(F.col("v").isNotNull())
    spark = df.sparkSession
    vtype = src.schema[0].dataType
    from pyspark.sql.pandas.types import to_arrow_type
    pa_type = to_arrow_type(vtype)

    def local_mg(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counts: dict = {}
        n_p = 0
        for b in batches:
            col = b.column(0)
            n_p += len(col)
            # value_counts runs in Arrow C++ (np.unique on a string column
            # degrades to an object-array sort); the weighted-MG guarantee
            # — any value absent from the summary has count <= n_p/(c+1) —
            # holds for every arrival order, and the exact verification +
            # guard below make the OUTPUT identical regardless of the
            # batch-internal iteration order.
            vc = pc.value_counts(col)
            for v, cnt in zip(vc.field("values").to_pylist(),
                              vc.field("counts").to_pylist()):
                if v in counts:
                    counts[v] += cnt
                else:
                    counts[v] = cnt
                    if len(counts) > c:
                        # weighted decrement: subtract the min from every
                        # key at once, drop the zeros (>=1 key drops, so
                        # size returns to <= c in one step)
                        m = min(counts.values())
                        counts = {kk: vv - m for kk, vv in counts.items()
                                  if vv > m}
        ks = list(counts.keys())
        yield pa.RecordBatch.from_arrays(
            [pa.array(ks + [None], type=pa_type),
             pa.array([None] * len(ks) + [n_p], pa.int64())],
            names=["v", "np"])

    schema = T.StructType([T.StructField("v", vtype, True),
                           T.StructField("np", T.LongType(), True)])
    summary = src.mapInArrow(local_mg, schema=schema).collect()
    n_total = sum(r.np for r in summary if r.np is not None)
    cands = sorted({r.v for r in summary if r.v is not None})

    exact_full = (df.filter(F.col(column).isNotNull())
                  .groupBy(column).agg(F.count(F.lit(1)).alias("count"))
                  .orderBy(F.desc("count"), F.col(column).asc())
                  .limit(k))
    if not cands:
        return exact_full  # empty input: both paths return 0 rows

    cand_df = spark.createDataFrame([(v,) for v in cands],
                                    T.StructType([T.StructField("v", vtype)]))
    top_rows = (df.join(F.broadcast(cand_df),
                        df[column] == cand_df["v"], "left_semi")
                .groupBy(column).agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.desc("count"), F.col(column).asc())
                .limit(k).collect())
    # guard: k-th candidate count must beat the max possible count of any
    # value that evaded every partition summary
    if len(top_rows) == k and top_rows[-1]["count"] * (c + 1) > n_total:
        return spark.createDataFrame(top_rows, schema=T.StructType([
            T.StructField(column, vtype, True),
            T.StructField("count", T.LongType(), False)]))
    return exact_full


def heavy_hitters_oracle_sql(table: str, column: str, k: int = 10) -> str:
    """DuckDB twin of :func:`heavy_hitters`: the plain exact top-k with the
    same pinned tie rule — the sketch path must agree with this exactly."""
    return f"""
        SELECT {column}, count(*) AS count
        FROM {table} WHERE {column} IS NOT NULL
        GROUP BY {column}
        ORDER BY count DESC, {column} ASC
        LIMIT {k}"""


def approx_quantiles_by(df: DataFrame, keys: list[str], id_col: str,
                        column: str, qs: list[float],
                        k: int = 4096) -> DataFrame:
    """Per-group approximate quantiles (token-length p50/p95 per lang, doc
    size per domain) from DETERMINISTIC per-group samples: within each
    group, the k rows with the smallest pinned 60-bit md5 hash of
    ``id_col``, then exact interpolated quantiles over each sample — the
    grouped form of :func:`approx_quantiles` with the same portability
    rationale (Spark's ``percentile_approx`` GK sketch is not
    SQL-reproducible; a pinned hash sample + exact ``percentile`` is).

    Execution shape: ONE column-pruned scan, one KEYED window rank over
    (keys, hash) — no global window; the quantile agg then runs over
    <= groups * k rows with map-side partial aggregation. Groups with
    fewer than k rows are computed EXACTLY (their sample is the whole
    group).

    Pinned contract (mirrored in :func:`quantiles_by_oracle_sql`): rows
    with NULL group keys are excluded (the kmv_by family rule); sampled
    rows with NULL ``column`` values stay in the sample but are ignored
    by the quantile (SQL aggregate semantics — a group whose sample is
    all-null yields NULL); interpolation is the 1+(n-1)q rank rule
    (Spark ``percentile`` == DuckDB ``quantile_cont`` on doubles).
    Precondition: ``id_col`` unique (repo-wide id contract).

    Returns ``keys + (q double, value double)`` ordered by (keys, q).
    """
    if k < 1:
        raise ValueError("approx_quantiles_by: k must be >= 1")
    if not keys:
        raise ValueError("approx_quantiles_by: need at least one key")
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("approx_quantiles_by: quantiles must be in [0, 1]")
    _validate_cols(df, [id_col], "id")
    types = dict(df.dtypes)
    if column not in types:
        raise ValueError(f"approx_quantiles_by: no such column '{column}'")
    if types[column].split("(")[0] not in _NUM_KINDS:
        raise ValueError(
            f"approx_quantiles_by: column '{column}' has type "
            f"{types[column]}; quantiles need a numeric column")

    src = df.select(*keys, _hash_expr(id_col).alias("__h"),
                    F.col(id_col).cast("string").alias("__id"),
                    F.col(column).cast("double").alias("__v"))
    for kcol in keys:
        src = src.filter(F.col(kcol).isNotNull())
    w = Window.partitionBy(*keys).orderBy("__h", "__id")
    smp = src.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") <= int(k))
    wide = smp.groupBy(*keys).agg(
        F.percentile(F.col("__v"), F.lit([float(q) for q in qs])).alias("__p"))
    rows = [F.struct(F.lit(float(q)).alias("q"),
                     F.col("__p")[i].alias("value"))
            for i, q in enumerate(qs)]
    return (wide.select(*keys, F.explode(F.array(*rows)).alias("r"))
            .select(*keys, "r.q", "r.value")
            .orderBy(*keys, "q"))


def quantiles_by_oracle_sql(table: str, keys: list[str], id_col: str,
                            column: str, qs: list[float],
                            k: int = 4096) -> str:
    """DuckDB twin of :func:`approx_quantiles_by` — same pinned per-group
    hash sample (keyed row_number over (hash, id-string)) and the same
    1+(n-1)q interpolation."""
    ks = ", ".join(keys)
    nn = " AND ".join(f"{c} IS NOT NULL" for c in keys)
    branches = "\n      UNION ALL\n".join(
        f"      SELECT {ks}, {float(q)}::DOUBLE AS q,"
        f" quantile_cont(v, {float(q)}) AS value"
        f" FROM smp WHERE rn <= {k} GROUP BY {ks}"
        for q in qs)
    return f"""
        WITH smp AS (
          SELECT {ks}, {column}::DOUBLE AS v,
                 row_number() OVER (
                   PARTITION BY {ks}
                   ORDER BY ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT,
                            CAST({id_col} AS VARCHAR)) AS rn
          FROM {table} WHERE {nn}
        )
{branches}
        ORDER BY {ks}, q"""
