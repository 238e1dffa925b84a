"""Aggregation operators: count / stats / frequency / pivot / correlations /
outliers / binning (SURVEY.md §2.5).

Unlike the reference — which issues one SQL query per column and unions
(stats.rs:111-167) — every multi-column statistic here is a single pass:
one wide agg row, unpivoted with ``stack``. At 10^12 rows that's the
difference between 1 scan and N scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def count_rows(df: DataFrame) -> int:
    """Spark answers parquet COUNT(*) from footer stats (count.rs:15-48)."""
    return df.count()


def numeric_cols(df: DataFrame) -> list[str]:
    """Public helper: the numeric columns every stats-style operator
    defaults to (one definition — cli/agg/rows all share it)."""
    num = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
    return [c for c, t in df.dtypes if t.startswith(num)]


_numeric_cols = numeric_cols


def stats(df: DataFrame, columns: list[str] | None = None,
          stats_type: str = "basic") -> DataFrame:
    """Per-column stats in ONE scan, long format.

    basic (stats.rs:104-168): count, mean, q25, median, q75, distinct
    exhaustive (stats.rs:170-245): + std, min, max, variance, duplicates
    hypothesis: unimplemented in the reference too (stats.rs:247-249).
    """
    if stats_type == "hypothesis":
        raise NotImplementedError("hypothesis stats unimplemented (reference parity)")
    if stats_type not in ("basic", "exhaustive"):
        raise ValueError(stats_type)
    cols = columns or df.columns
    numeric = set(_numeric_cols(df))

    aggs = []
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"cnt__{c}"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"dst__{c}"))
        if c in numeric:
            aggs.append(F.avg(F.col(c)).alias(f"avg__{c}"))
            aggs.append(F.percentile_approx(F.col(c), [0.25, 0.5, 0.75]).alias(f"pct__{c}"))
            if stats_type == "exhaustive":
                aggs.append(F.stddev(F.col(c)).alias(f"std__{c}"))
                aggs.append(F.min(F.col(c)).alias(f"min__{c}"))
                aggs.append(F.max(F.col(c)).alias(f"max__{c}"))
                aggs.append(F.var_pop(F.col(c)).alias(f"var__{c}"))
    row = df.agg(*aggs)

    # unpivot: one struct per column -> explode
    structs = []
    for c in cols:
        fields = [
            F.lit(c).alias("column"),
            F.col(f"cnt__{c}").cast("long").alias("count"),
            (F.col(f"avg__{c}").cast("double") if c in numeric else F.lit(None).cast("double")).alias("mean"),
            (F.col(f"pct__{c}")[0].cast("double") if c in numeric else F.lit(None).cast("double")).alias("q25"),
            (F.col(f"pct__{c}")[1].cast("double") if c in numeric else F.lit(None).cast("double")).alias("median"),
            (F.col(f"pct__{c}")[2].cast("double") if c in numeric else F.lit(None).cast("double")).alias("q75"),
            F.col(f"dst__{c}").cast("long").alias("distinct_approx"),
        ]
        if stats_type == "exhaustive":
            fields += [
                (F.col(f"std__{c}").cast("double") if c in numeric else F.lit(None).cast("double")).alias("std"),
                (F.col(f"min__{c}").cast("double") if c in numeric else F.lit(None).cast("double")).alias("min"),
                (F.col(f"max__{c}").cast("double") if c in numeric else F.lit(None).cast("double")).alias("max"),
                (F.col(f"var__{c}").cast("double") if c in numeric else F.lit(None).cast("double")).alias("var_pop"),
                (F.col(f"cnt__{c}") - F.col(f"dst__{c}")).cast("long").alias("duplicates_approx"),
            ]
        structs.append(F.struct(*fields))
    exploded = row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
    return exploded


def frequency(df: DataFrame, columns: list[str], limit: int | None = None) -> DataFrame:
    """GROUP BY cols, count desc + percentage (frequency.rs:52-97).

    ONE scan (the reference runs a second COUNT(*) pass): the total is
    summed from the group counts and broadcast back; AQE reuses the
    groupBy's shuffle exchange, so the percentage denominator costs an
    O(#groups) aggregation, not a table scan."""
    counts = df.groupBy(*columns).agg(F.count(F.lit(1)).alias("count"))
    total = counts.agg(F.sum("count").alias("__total"))
    out = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("percentage", F.round(F.col("count") * 100.0 / F.col("__total"), 2))
        .drop("__total")
        .orderBy(F.desc("count"), *[F.col(c) for c in columns])
    )
    return out.limit(limit) if limit else out


def pivot_table(df: DataFrame, index: list[str], pivot_col: str,
                value_col: str | list[str], agg: str = "sum",
                pivot_values: list | None = None,
                fill_value=None) -> DataFrame:
    """True wide pivot — exceeds the reference, which documents that it
    doesn't widen (pivot.rs:171-212, README.md:800). Accepts multiple value
    columns (pivot.rs:24 -l comma list) and a fill for missing cells
    (pivot.rs:33 --fill)."""
    aggf = {"sum": F.sum, "mean": F.avg, "count": F.count, "min": F.min, "max": F.max}[agg]
    values = [value_col] if isinstance(value_col, str) else list(value_col)
    gp = df.groupBy(*index)
    p = gp.pivot(pivot_col, pivot_values) if pivot_values else gp.pivot(pivot_col)
    if len(values) == 1:
        out = p.agg(aggf(F.col(values[0])))
    else:
        out = p.agg(*[aggf(F.col(v)).alias(v) for v in values])
    if fill_value is not None:
        out = out.fillna(fill_value, subset=[c for c in out.columns if c not in index])
    return out


def distinct_values(df: DataFrame, column: str) -> DataFrame:
    """Unique values of one column (pivot.rs:214-221)."""
    return df.select(column).distinct()


def _bounded_sample(df: DataFrame, cols: list[str], cap: int):
    """Deterministic, layout-INDEPENDENT bounded sample as pandas: min-k
    rows by ``xxhash64(struct(*cols))``. Executes as TakeOrderedAndProject
    (per-partition partial top-k, one k-row merge at the driver — no global
    sort, no global window), so the same multiset of rows comes back under
    any partitioning or file order (replaces the r3/r4 ``limit(cap)``
    layout-coupled contract, VERDICT r4 #6). Hash ties are value-duplicate
    rows, so tie-breaking cannot change the sampled values; inputs at or
    under the cap come back whole (exact)."""
    keyed = df.select(cols).withColumn(
        "__k", F.xxhash64(F.struct(*[F.col(c) for c in cols]))
    )
    return keyed.orderBy("__k").limit(cap).drop("__k").toPandas()


def correlations(df: DataFrame, columns: list[str] | None = None,
                 method: str = "pearson", sample_n: int = 100_000,
                 seed: int = 42) -> DataFrame:
    """Pairwise correlation matrix in long form (column_a, column_b, corr).

    pearson: one-pass F.corr for all pairs (stats.rs:366-371)
    spearman: rank-transform then pearson (stats.rs:372-383; we rank jointly,
      which handles ties properly — divergence from the reference's
      independent-rank bug is intentional, SURVEY.md §7.4)
    kendall: exact tau-b pair counting on a bounded sample, blocked numpy
      (stats.rs:384-414 is a full SQL cross join; we bound it). The sample
      is min-k by xxhash64 over the selected columns — deterministic AND
      layout-independent (see _bounded_sample); inputs <= the cap are used
      whole, so small slices are exact.
    """
    cols = columns or _numeric_cols(df)
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]

    if method == "pearson":
        aggs = [F.corr(a, b).alias(f"{i}") for i, (a, b) in enumerate(pairs)]
        row = df.agg(*aggs).collect()[0]
        data = [(a, b, float(row[str(i)]) if row[str(i)] is not None else None)
                for i, (a, b) in enumerate(pairs)]
    elif method == "spearman":
        # average ranks via groupBy + range-partitioned prefix sum (same
        # machinery as spearman_scalable) — no single-partition window even
        # for near-unique columns
        from nail_parquet_spark.rowid import with_exclusive_prefix_sum

        ranked = df.select(cols)
        for c in cols:
            # NULLs are excluded from ranking and LEFT-joined back with a
            # null rank, so F.corr does pairwise (not listwise) deletion —
            # a NULL in column c never drops the row from other pairs
            counts = (
                df.where(F.col(c).isNotNull())
                .groupBy(F.col(c).alias("__v"))
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            rk = with_exclusive_prefix_sum(counts, "__v", "__n", "__before")
            rk = rk.select(
                F.col("__v"),
                (F.col("__before") + (F.col("__n") + 1) / 2.0).alias(f"__rk_{c}"),
            )
            ranked = ranked.join(rk, F.col(c) == F.col("__v"), "left").drop("__v")
        aggs = [F.corr(f"__rk_{a}", f"__rk_{b}").alias(f"{i}") for i, (a, b) in enumerate(pairs)]
        row = ranked.agg(*aggs).collect()[0]
        data = [(a, b, float(row[str(i)]) if row[str(i)] is not None else None)
                for i, (a, b) in enumerate(pairs)]
    elif method == "kendall":
        cap = min(sample_n, 10_000)  # O(n^2) pair counting, blocked numpy
        pdf = _bounded_sample(df, cols, cap)
        data = []
        for a, b in pairs:
            data.append((a, b, _kendall_tau_b(pdf[a].to_numpy(), pdf[b].to_numpy())))
    else:
        raise ValueError(method)

    spark = df.sparkSession
    return spark.createDataFrame(data, "column_a string, column_b string, correlation double")


def correlation_matrix(df: DataFrame, columns: list[str] | None = None,
                       method: str = "pearson", sample_n: int = 10_000,
                       digits: int = 4) -> DataFrame:
    """n x n wide correlation matrix (the reference's display shape,
    stats.rs:344-475 + format.rs): one row per column, one column per
    column, symmetric, diagonal 1.0. Each pair is computed ONCE (the
    long-form pass) and mirrored driver-side — the matrix is O(n^2) scalars,
    pure metadata."""
    cols = columns or _numeric_cols(df)
    long = correlations(df, cols, method, sample_n).collect()
    vals = {}
    for r in long:
        v = None if r["correlation"] is None else round(r["correlation"], digits)
        vals[(r["column_a"], r["column_b"])] = v
        vals[(r["column_b"], r["column_a"])] = v
    data = [tuple([a] + [vals.get((a, b)) for b in cols]) for a in cols]
    schema = ", ".join(["column string"] + [f"`{c}` double" for c in cols])
    return df.sparkSession.createDataFrame(data, schema)


def outliers(df: DataFrame, columns: list[str] | None = None, method: str = "iqr",
             factor: float = 1.5, action: str = "flag",
             threshold: float | None = None) -> DataFrame:
    """IQR / z-score / modified-z / range-heuristic 'isolation' outliers
    (outliers.rs:129-620). action: flag (adds is_outlier) or remove.

    ``factor`` applies to the IQR method (fence multiplier, default 1.5);
    ``threshold`` applies to z-score (default 3.0) and modified-z-score
    (default 3.5). Split APIs so an explicit z threshold of 1.5 is honored
    rather than silently remapped."""
    cols = columns or _numeric_cols(df)

    if method == "iqr":
        aggs = []
        for c in cols:
            aggs.append(F.percentile_approx(c, [0.25, 0.75]).alias(f"q__{c}"))
        q = df.agg(*aggs).collect()[0]
        conds = []
        for c in cols:
            q1, q3 = q[f"q__{c}"]
            iqr = q3 - q1
            lo, hi = q1 - factor * iqr, q3 + factor * iqr
            conds.append((F.col(c) < lo) | (F.col(c) > hi))
    elif method == "zscore":
        zt = 3.0 if threshold is None else threshold
        aggs = [x for c in cols for x in (F.avg(c).alias(f"m__{c}"), F.stddev(c).alias(f"s__{c}"))]
        q = df.agg(*aggs).collect()[0]
        conds = []
        for c in cols:
            m, s = q[f"m__{c}"], q[f"s__{c}"]
            if not s:
                conds.append(F.lit(False))
            else:
                conds.append(F.abs((F.col(c) - m) / s) > zt)
    elif method == "modified-zscore":
        med_aggs = [F.percentile_approx(c, 0.5).alias(f"md__{c}") for c in cols]
        meds = df.agg(*med_aggs).collect()[0]
        mad_aggs = [
            F.percentile_approx(F.abs(F.col(c) - F.lit(meds[f"md__{c}"])), 0.5).alias(f"mad__{c}")
            for c in cols
        ]
        mads = df.agg(*mad_aggs).collect()[0]
        conds = []
        for c in cols:
            med, mad = meds[f"md__{c}"], mads[f"mad__{c}"]
            if not mad:
                conds.append(F.lit(False))
            else:
                mzt = 3.5 if threshold is None else threshold
                conds.append(F.abs(0.6745 * (F.col(c) - med) / mad) > mzt)
    elif method == "isolation":
        # reference's documented simplification: outer 10% of [min,max] range
        # (outliers.rs:561-567) — kept for parity, not a real forest
        aggs = [x for c in cols for x in (F.min(c).alias(f"mn__{c}"), F.max(c).alias(f"mx__{c}"))]
        q = df.agg(*aggs).collect()[0]
        conds = []
        for c in cols:
            mn, mx = q[f"mn__{c}"], q[f"mx__{c}"]
            rng = (mx - mn) if mx is not None and mn is not None else None
            if not rng:
                conds.append(F.lit(False))
            else:
                conds.append((F.col(c) < mn + 0.1 * rng) | (F.col(c) > mx - 0.1 * rng))
    else:
        raise ValueError(method)

    flag = reduce(lambda a, b: a | b, conds) if conds else F.lit(False)
    if action == "remove":
        return df.filter(~flag)
    return df.withColumn("is_outlier", flag)


def binning(df: DataFrame, column: str, bins: int = 10, method: str = "equal-width",
            edges: list[float] | None = None, labels: str = "range",
            out_col: str | None = None, custom_labels: list[str] | None = None,
            drop_original: bool = False) -> DataFrame:
    """Equal-width / equal-frequency / custom-edge binning with CASE WHEN
    labels (binning.rs:135-358; equal-frequency distributed via
    percentile_approx instead of the reference's full collect).

    custom_labels (binning.rs:31) override the range/index labels one per
    bin; drop_original (binning.rs:39) removes the source column after."""
    out_col = out_col or f"{column}_bin"
    if method == "equal-width":
        mn, mx = df.agg(F.min(column), F.max(column)).collect()[0]
        if mn is None:
            return df.withColumn(out_col, F.lit(None).cast("string"))
        step = (mx - mn) / bins or 1.0
        cuts = [mn + i * step for i in range(1, bins)]
    elif method == "equal-frequency":
        qs = [i / bins for i in range(1, bins)]
        # one action for cuts + min/max (was two collects = two full
        # passes over the column); values identical, the aggregates are
        # independent of each other
        cuts, mn, mx = df.agg(
            F.percentile_approx(column, qs), F.min(column), F.max(column)
        ).collect()[0]
    elif method == "custom":
        if not edges or len(edges) < 2:
            raise ValueError("custom binning needs >= 2 edges")
        # edges include the outer bounds: k edges -> k-1 bins
        mn, mx = edges[0], edges[-1]
        cuts = list(edges[1:-1])
    else:
        raise ValueError(method)

    col = F.col(column)
    expr = None
    bounds = [mn] + list(cuts) + [mx]
    n_bins = len(bounds) - 1
    if custom_labels is not None and len(custom_labels) != n_bins:
        raise ValueError(f"{len(custom_labels)} labels for {n_bins} bins")
    for i in range(n_bins):
        lo, hi = bounds[i], bounds[i + 1]
        if custom_labels is not None:
            lab = custom_labels[i]
        elif labels == "range":
            lab = f"[{lo:.4g}, {hi:.4g}{']' if i == n_bins - 1 else ')'}"
        else:
            lab = f"bin_{i + 1}"
        cond = (col >= lo) & (col <= hi) if i == n_bins - 1 else (col >= lo) & (col < hi)
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    out = df.withColumn(out_col, expr)
    return out.drop(column) if drop_original else out


def binning_multi(df: DataFrame, columns: list[str], bins: int = 10,
                  method: str = "equal-width", suffix: str = "_bin",
                  **kw) -> DataFrame:
    """Bin several columns in one call (binning.rs -c comma list + --suffix;
    the reference's default suffix is "_binned" — ours matches binning()'s
    single-column "_bin" so CLI and library agree)."""
    out = df
    for c in columns:
        out = binning(out, c, bins, method, out_col=f"{c}{suffix}", **kw)
    return out


# ---------------------------------------------------------------------------
# correlation p-values (stats.rs:276-342 parity; statrs -> pure-python math,
# driver-side on the tiny correlation table, like the reference)
# ---------------------------------------------------------------------------


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Numerical Recipes form)."""
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    import math

    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, dof: float) -> float:
    """Two-sided survival P(|T| >= t) for Student's t."""
    x = dof / (dof + t * t)
    return _betainc(dof / 2.0, 0.5, x)


def correlation_t_stat(r: float, n: int) -> float:
    """Signed t-statistic of a correlation: t = r*sqrt((n-2)/(1-r^2)).
    SQL-expressible, so it is the oracle-attested half of the p-value path
    (the incomplete-beta tail itself has no closed SQL form)."""
    import math

    if n < 3 or r is None:
        return float("nan")
    r = max(min(r, 0.999999999), -0.999999999)
    return r * math.sqrt((n - 2) / (1.0 - r * r))


def correlation_pvalue(r: float, n: int) -> float:
    """Two-sided p-value for a Pearson/Spearman correlation of n samples
    via the t-transform t = r*sqrt((n-2)/(1-r^2))."""
    if n < 3 or r is None:
        return float("nan")
    return t_sf(abs(correlation_t_stat(r, n)), n - 2)


def kendall_z_stat(tau: float, n: int) -> float:
    """Normal-approximation z-statistic for Kendall's tau under H0:
    z = 3*tau*sqrt(n*(n-1)) / sqrt(2*(2n+5)) — the tau-specific null
    variance (reference stats.rs:276-342, third branch). The Pearson
    t-transform is WRONG for tau, hence this dedicated formula."""
    import math

    if tau is None or n < 2 or math.isnan(tau):
        return float("nan")
    return 3.0 * tau * math.sqrt(n * (n - 1)) / math.sqrt(2.0 * (2 * n + 5))


def kendall_pvalue(tau: float, n: int) -> float:
    """Two-sided p-value for Kendall's tau via the normal approximation:
    p = erfc(|z| / sqrt(2))."""
    import math

    z = kendall_z_stat(tau, n)
    if math.isnan(z):
        return float("nan")
    return math.erfc(abs(z) / math.sqrt(2.0))


def correlations_with_pvalues(df: DataFrame, columns: list[str] | None = None,
                              method: str = "pearson") -> DataFrame:
    """Long-form correlations + significance (reference stats.rs:276-342).

    pearson/spearman: the t-transform t = r*sqrt((n-2)/(1-r^2)) with
    two-sided Student-t p-value. The degrees of freedom use the PER-PAIR
    both-non-null count — F.corr does pairwise deletion, so a table-level
    count() would overstate n (and the significance) for columns with nulls.

    kendall: exact tau-b on the same bounded deterministic sample
    correlations() uses, with the tau-specific normal approximation
    z = 3*tau*sqrt(n(n-1))/sqrt(2(2n+5)) and p = erfc(|z|/sqrt(2)) —
    returned as (correlation, z_stat, p_value). n is the both-non-null
    count WITHIN the sample (the n tau was actually computed from); the
    bounded-sample caveat of correlations(method='kendall') applies."""
    if method == "kendall":
        import numpy as np

        cols = columns or _numeric_cols(df)
        kpairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
        pdf = _bounded_sample(df, cols, 10_000)
        rows = []
        for a, b in kpairs:
            x, y = pdf[a].to_numpy(), pdf[b].to_numpy()
            mask = ~(np.isnan(x.astype("float64")) | np.isnan(y.astype("float64")))
            n = int(mask.sum())
            tau = _kendall_tau_b(x, y)
            bad = tau != tau  # NaN
            rows.append((
                a, b,
                None if bad else float(tau),
                None if bad else float(kendall_z_stat(tau, n)),
                None if bad else float(kendall_pvalue(tau, n)),
            ))
        return df.sparkSession.createDataFrame(
            rows,
            "column_a string, column_b string, correlation double, "
            "z_stat double, p_value double",
        )
    corr_rows = correlations(df, columns, method).collect()
    pairs = [(r["column_a"], r["column_b"]) for r in corr_rows]
    n_aggs = [
        F.count(F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1)).alias(str(i))
        for i, (a, b) in enumerate(pairs)
    ]
    ns = df.agg(*n_aggs).collect()[0]
    rows = []
    for i, r in enumerate(corr_rows):
        n = int(ns[str(i)])
        cr = r["correlation"]
        rows.append((
            r["column_a"], r["column_b"], cr,
            float(correlation_t_stat(cr, n)) if cr is not None else None,
            float(correlation_pvalue(cr, n)) if cr is not None else None,
        ))
    return df.sparkSession.createDataFrame(
        rows,
        "column_a string, column_b string, correlation double, "
        "t_stat double, p_value double",
    )


def _kendall_tau_b(x, y, block: int = 1024) -> float:
    """Kendall tau-b on a bounded sample: blocked-numpy concordant/discordant
    pair counting with the standard ties correction. Replaces the
    reference's O(n^2) SQL cross join (stats.rs:384-414) without needing
    scipy (absent in this container)."""
    import math

    import numpy as np

    m = ~(np.isnan(x.astype("float64")) | np.isnan(y.astype("float64")))
    x, y = x[m].astype("float64"), y[m].astype("float64")
    n = len(x)
    if n < 2:
        return float("nan")
    C = D = 0
    for i0 in range(0, n, block):
        xs = x[i0 : i0 + block][:, None]
        ys = y[i0 : i0 + block][:, None]
        s = np.sign(xs - x[None, :]) * np.sign(ys - y[None, :])
        C += int((s > 0).sum())
        D += int((s < 0).sum())
    C //= 2  # every unordered pair counted twice
    D //= 2
    n0 = n * (n - 1) // 2

    def ties(v):
        _, c = np.unique(v, return_counts=True)
        return int((c * (c - 1) // 2).sum())

    n1, n2 = ties(x), ties(y)
    denom = math.sqrt(float(n0 - n1) * float(n0 - n2))
    return float((C - D) / denom) if denom else float("nan")


def spearman_scalable(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Spearman correlation with NO single-partition window anywhere.

    Average ranks: rank(v) = (#rows with value < v) + (count(v)+1)/2. The
    "#rows before" term is an exclusive prefix sum of per-value counts in
    value order, computed via range-repartition + partition-offset prefix
    sum (rowid.with_exclusive_prefix_sum) — works even when the column is
    near-unique and the distinct-value table is as big as the data. The
    join back is a plain shuffle join (AQE broadcasts it when small)."""
    from nail_parquet_spark.rowid import with_exclusive_prefix_sum

    ranked = df.select(col_a, col_b)
    for c in (col_a, col_b):
        # NULLs excluded from ranking, left-joined back with null rank:
        # F.corr then skips those pairs (pairwise deletion)
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        ranks = with_exclusive_prefix_sum(counts, "__v", "__n", "__before")
        ranks = ranks.withColumn("__avg_rank", F.col("__before") + (F.col("__n") + 1) / 2.0)
        ranked = ranked.join(
            ranks.select(F.col("__v"), F.col("__avg_rank").alias(f"__rk_{c}")),
            F.col(c) == F.col("__v"),
            "left",
        ).drop("__v")
    return ranked.agg(F.round(F.corr(f"__rk_{col_a}", f"__rk_{col_b}"), 4).alias("spearman"))
