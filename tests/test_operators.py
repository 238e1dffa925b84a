"""Operator-surface golden tests ported from the reference's CLI contract
(/root/reference/tests/cli.rs; FIXTURES.md F2/F3)."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark import operators as ops


def test_count_golden(sample):
    assert ops.count_rows(sample) == 5  # cli.rs:73


def test_headers_golden(sample):
    assert ops.headers(sample) == ["id", "name", "value", "category"]  # cli.rs:95


def test_filter_golden(sample):
    # cli.rs:154-155: id>3 AND category=B -> exactly 1 row (David)
    out = ops.filter_conditions(sample, "id>3,category=B")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "David"


def test_select_rows_golden(sample):
    # cli.rs:129-130: -r "1,3-4" -> 3 rows
    out = ops.select_rows(sample, "1,3-4", order_col="id")
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 4]


def test_drop_rows(sample):
    out = ops.drop_rows(sample, "2,5", order_col="id")
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 4]


def test_corr_golden(sample):
    # cli.rs:405: corr(id, value) > 0.9
    out = ops.correlations(sample, ["id", "value"], method="pearson")
    c = {(r["column_a"], r["column_b"]): r["correlation"] for r in out.collect()}
    assert c[("id", "value")] > 0.9


def test_select_columns_patterns(sample):
    assert ops.select_columns(sample, ["id", "name"]).columns == ["id", "name"]
    assert ops.select_columns(sample, ["NAME"]).columns == ["name"]  # case-insensitive
    assert ops.select_columns(sample, ["^c"]).columns == ["category"]  # regex
    with pytest.raises(ValueError):
        ops.select_columns(sample, ["nope"])


def test_rename_validations(sample):
    out = ops.rename_columns(sample, ["name=full_name"])
    assert "full_name" in out.columns and "name" not in out.columns
    with pytest.raises(ValueError):
        ops.rename_columns(sample, ["missing=x"])
    with pytest.raises(ValueError):
        ops.rename_columns(sample, ["name=value"])  # conflict (rename.rs:60-70)
    with pytest.raises(ValueError):
        ops.rename_columns(sample, ["name=x", "value=x"])  # dup target


def test_create_columns(sample):
    out = ops.create_columns(sample, ["double_value=value * 2"])
    row = out.filter(F.col("id") == 1).collect()[0]
    assert row["double_value"] == 200.0


def test_id_column(sample):
    out = ops.add_id_column(sample, name="row_id", prefix="r_", order_col="id")
    assert out.columns[0] == "row_id"
    assert [r["row_id"] for r in out.orderBy("id").collect()] == [f"r_{i}" for i in range(1, 6)]
    with pytest.raises(ValueError):
        ops.add_id_column(sample, name="id")  # exists (id.rs:47-50)


def test_merge_semantics(sample, sample2):
    j = ops.merge(sample, sample2, "id=user_id", "inner", broadcast_right=True)
    assert j.count() == 3
    assert "r_score" in j.columns
    left = ops.merge(sample, sample2, "id=user_id", "left")
    assert left.count() == 5
    with pytest.raises(ValueError):
        ops.merge(sample, sample2, "id=user_id", "full")  # unsupported (merge.rs:44-52)
    semi = ops.merge(sample, sample2, "id=user_id", "semi")
    assert semi.columns == sample.columns and semi.count() == 3
    anti = ops.merge(sample, sample2, "id=user_id", "anti", broadcast_right=True)
    assert anti.columns == sample.columns and anti.count() == 2
    assert set(r["id"] for r in anti.collect()).isdisjoint(
        r["id"] for r in semi.collect())


def test_append_strict_and_ignore(sample):
    assert ops.append([sample, sample]).count() == 10
    other = sample.select("id", "name")
    with pytest.raises(ValueError):
        ops.append([sample, other])
    padded = ops.append([sample, other], ignore_schema=True)
    assert padded.count() == 10
    assert padded.filter(F.col("value").isNull()).count() == 5


def test_dedup_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")], "id long, k string"
    )
    first = ops.dedup_rows(df, ["k"], keep="first", order_col="id")
    assert sorted(r["id"] for r in first.collect()) == [1, 3]
    last = ops.dedup_rows(df, ["k"], keep="last", order_col="id")
    assert sorted(r["id"] for r in last.collect()) == [2, 5]


def test_dedup_columns(spark):
    df = spark.createDataFrame(
        [(1, 1, "x", "x"), (2, 2, "y", "y")], "a long, a_copy long, s string, s_copy string"
    )
    out = ops.dedup_columns(df, keep="first")
    assert out.columns == ["a", "s"]
    out_last = ops.dedup_columns(df, keep="last")
    assert out_last.columns == ["a_copy", "s_copy"]


def test_fill(with_nulls):
    filled = ops.fill_value(with_nulls, ["v"], -1.0)
    assert filled.filter(F.col("v") == -1.0).count() == 2
    mean_filled = ops.fill_stat(with_nulls, ["v"], "mean")
    got = {r["id"]: r["v"] for r in mean_filled.collect()}
    assert got[2] == pytest.approx((1.0 + 3.0 + 4.0) / 3)
    ff = ops.fill_directional(with_nulls, ["s"], "forward", order_col="id")
    got = {r["id"]: r["s"] for r in ff.collect()}
    assert got[2] == "a" and got[4] == "c"
    bf = ops.fill_directional(with_nulls, ["s"], "backward", order_col="id")
    got = {r["id"]: r["s"] for r in bf.collect()}
    assert got[2] == "c" and got[4] == "e"


def test_row_filter_modes(with_nulls):
    assert ops.filter_rows_mode(with_nulls, "no-nan").count() == 2
    assert ops.filter_rows_mode(with_nulls, "numeric-only").count() == 3


def test_sample_shuffle_split(sample):
    s = ops.sample_random(sample, 3, seed=11)
    assert s.count() == 3
    assert ops.sample_random(sample, 3, seed=11).collect() == s.collect()  # seeded determinism
    assert sorted(ops.shuffle_rows(sample, seed=5).select("id").toPandas()["id"]) == [1, 2, 3, 4, 5]
    parts = ops.split_by_ratio(sample, [0.6, 0.4], seed=3)
    assert sum(p.count() for p in parts) == 5


def test_stratified_split_covers_classes(spark):
    rows = [(i, "A" if i < 40 else "B") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, cat string")
    tr, te = ops.split_by_ratio(df, [0.8, 0.2], seed=1, stratify_by="cat")
    trc = tr.groupBy("cat").count().collect()
    got = {r["cat"]: r["count"] for r in trc}
    assert got["A"] == 32 and got["B"] == 8  # exact stratified 80%


def test_sort_strategies(spark):
    df = spark.createDataFrame([("10",), ("9",), ("100",)], "s string")
    alpha = [r["s"] for r in ops.sort_by(df, [{"col": "s", "strategy": "alphabetic"}]).collect()]
    assert alpha == ["10", "100", "9"]
    num = [r["s"] for r in ops.sort_by(df, [{"col": "s", "strategy": "numeric"}]).collect()]
    assert num == ["9", "10", "100"]


def test_stats_shapes(sample):
    basic = ops.stats(sample, stats_type="basic").collect()
    assert {r["column"] for r in basic} == set(sample.columns)
    ex = ops.stats(sample, ["value"], stats_type="exhaustive").collect()[0]
    assert ex["min"] == 100.0 and ex["max"] == 500.0
    with pytest.raises(NotImplementedError):
        ops.stats(sample, stats_type="hypothesis")  # reference parity (stats.rs:247-249)


def test_binning_and_outliers(sample):
    b = ops.binning(sample, "value", bins=2, labels="index")
    assert set(r["value_bin"] for r in b.collect()) == {"bin_1", "bin_2"}
    flagged = ops.outliers(sample, ["value"], method="zscore")
    assert "is_outlier" in flagged.columns
    removed = ops.outliers(sample, ["value"], method="isolation", action="remove")
    assert removed.count() < 5  # range heuristic always flags extremes


def test_binning_equal_frequency_fused_action(sample, spark):
    """equal-frequency computes cuts + min/max in ONE aggregation action
    (was two collects = two full column passes); on small data
    percentile_approx is exact: cuts for 1..100 are (25, 50, 75) and the
    half-open [lo, hi) intervals pin the per-bin counts exactly."""
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    b = ops.binning(df, "v", bins=4, method="equal-frequency", labels="index")
    counts = {r["v_bin"]: r["n"]
              for r in b.groupBy("v_bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    # [1,25) [25,50) [50,75) [75,100] — last bin closed on the max
    assert counts == {"bin_1": 24, "bin_2": 25, "bin_3": 25, "bin_4": 26}


def test_outliers_zscore_threshold_honored(sample):
    """Regression: an explicit threshold of 1.5 must flag >= rows than 3.0
    (the old API silently remapped factor=1.5 to 3.0)."""
    n_tight = ops.outliers(sample, ["value"], method="zscore", threshold=1.5) \
        .filter("is_outlier").count()
    n_loose = ops.outliers(sample, ["value"], method="zscore", threshold=3.0) \
        .filter("is_outlier").count()
    n_tiny = ops.outliers(sample, ["value"], method="zscore", threshold=0.1) \
        .filter("is_outlier").count()
    assert n_tight >= n_loose
    assert n_tiny > n_loose  # 0.1 sigma flags nearly everything


def test_search(sample):
    assert ops.search_value(sample, "ali", case_insensitive=True).count() == 1
    rows = ops.search_rows(sample, "a", columns=["name", "category"]).collect()
    assert all(set(r["matched_columns"].split(",")) <= {"name", "category"} for r in rows)


def test_frequency_and_pivot(sample):
    f = ops.frequency(sample, ["category"]).collect()
    assert f[0]["count"] == 2 and abs(f[0]["percentage"] - 40.0) < 1e-9
    p = ops.pivot_table(sample, ["category"], "name", "value", "sum")
    assert p.count() == 3


def test_correlation_pvalues(sample):
    out = ops.correlations_with_pvalues(sample, ["id", "value"])
    got = {(r["column_a"], r["column_b"]): r for r in out.collect()}
    r = got[("id", "value")]
    assert r["correlation"] > 0.9
    assert 0 <= r["p_value"] < 0.05  # strong correlation, tiny sample
    assert got[("id", "id")]["p_value"] < 1e-6


def test_correlations_kendall(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0), (5.0, 4.0)], "a double, b double"
    )
    out = ops.correlations(df, ["a", "b"], method="kendall")
    got = {(r["column_a"], r["column_b"]): r["correlation"] for r in out.collect()}
    assert got[("a", "b")] == pytest.approx(0.6)
    assert got[("a", "a")] == pytest.approx(1.0)


def test_spearman_scalable_matches_window(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    from nail_parquet_spark.operators.agg import spearman_scalable

    got = spearman_scalable(li, "l_quantity", "l_extendedprice").collect()[0]["spearman"]
    # window-rank reference value (rank() vs avg-rank differ only on tie
    # handling; avg-rank is the textbook Spearman)
    want = ops.correlations(li, ["l_quantity", "l_extendedprice"], method="spearman").collect()
    w = {(r["column_a"], r["column_b"]): r["correlation"] for r in want}
    assert got == pytest.approx(w[("l_quantity", "l_extendedprice")], abs=0.01)


def test_correlation_matrix_wide(sample):
    m = ops.correlation_matrix(sample, ["id", "value"], method="pearson")
    rows = {r["column"]: r for r in m.collect()}
    assert set(rows) == {"id", "value"}
    assert rows["id"]["id"] == pytest.approx(1.0)
    assert rows["id"]["value"] == rows["value"]["id"]  # symmetric, one compute


def test_correlation_pvalue_known_values():
    """Golden values for the pure-python t-tail, validated against an
    independent high-resolution Simpson integration of the Student-t density
    (agreement <= 1e-12 relative; scipy is absent in this container).
    Attests the incomplete-beta half the SQL oracle can't express
    (reference stats.rs:276-342)."""
    from nail_parquet_spark.operators.agg import correlation_pvalue, correlation_t_stat

    cases = [
        # (r, n, expected two-sided p) — cross-checked by numeric integration
        (0.5, 10, 0.141113281250),
        (0.8, 10, 0.005456000000),
        (0.9, 5, 0.037386073468),
        (-0.7, 20, 0.000590058017),
        (0.1, 100, 0.322217363031),
        (0.05, 1000, 0.114072595551),
    ]
    for r, n, want in cases:
        got = correlation_pvalue(r, n)
        assert abs(got - want) < 1e-9 * max(1.0, abs(want)), (r, n, want, got)
    # t-transform is signed and exact
    import math
    assert abs(correlation_t_stat(0.5, 10) - 0.5 * math.sqrt(8 / 0.75)) < 1e-12
    assert correlation_t_stat(-0.5, 10) == -correlation_t_stat(0.5, 10)
    assert math.isnan(correlation_pvalue(0.5, 2))


def test_correlation_pvalues_pairwise_n(spark):
    """Significance must use the per-pair both-non-null count, not the table
    row count: F.corr does pairwise deletion, so nulls shrink n."""
    import math

    rows = [(float(i), float(i) * 0.5 + (i % 3)) for i in range(40)]
    data = rows + [(float(i), None) for i in range(40, 4000)]
    df = spark.createDataFrame(data, "a double, b double")
    out = ops.correlations_with_pvalues(df, ["a", "b"])
    r = {(x["column_a"], x["column_b"]): x for x in out.collect()}[("a", "b")]
    from nail_parquet_spark.operators.agg import correlation_t_stat

    # n must be 40 (complete pairs), not 4000
    want_t = correlation_t_stat(r["correlation"], 40)
    assert math.isclose(r["t_stat"], want_t, rel_tol=1e-9), (r["t_stat"], want_t)
    wrong_t = correlation_t_stat(r["correlation"], 4000)
    assert abs(r["t_stat"]) < abs(wrong_t) / 5


def test_kendall_significance_known_values():
    """z = 3*tau*sqrt(n(n-1))/sqrt(2(2n+5)) (stats.rs:276-342 third branch),
    p = erfc(|z|/sqrt 2). Constants locked for regression; z additionally
    cross-checked against the algebraically independent variance form
    var(tau) = 2(2n+5)/(9n(n-1))."""
    import math

    from nail_parquet_spark.operators.agg import kendall_pvalue, kendall_z_stat

    cases = [
        (0.6, 5, 1.469693845670, 0.141644690295),
        (0.3, 50, 3.074085229788, 0.002111491007),
        (-0.2, 100, -2.948335619774, 0.003194900001),
        (0.05, 1000, 2.367564486135, 0.017905599343),
    ]
    for tau, n, want_z, want_p in cases:
        assert abs(kendall_z_stat(tau, n) - want_z) < 1e-9
        assert abs(kendall_pvalue(tau, n) - want_p) < 1e-9
        alt_z = tau / math.sqrt(2.0 * (2 * n + 5) / (9.0 * n * (n - 1)))
        assert abs(kendall_z_stat(tau, n) - alt_z) < 1e-9
    assert math.isnan(kendall_z_stat(0.5, 1))
    assert math.isnan(kendall_pvalue(float("nan"), 50))


def test_correlations_with_pvalues_kendall(spark):
    """method='kendall' returns (correlation, z_stat, p_value) with tau equal
    to correlations(method='kendall') and z from the tau-specific normal
    approximation over the sample's both-non-null n."""
    from nail_parquet_spark.operators.agg import kendall_z_stat

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0), (5.0, 4.0),
         (6.0, None)],
        "a double, b double",
    )
    out = ops.correlations_with_pvalues(df, ["a", "b"], method="kendall")
    assert out.columns == ["column_a", "column_b", "correlation", "z_stat", "p_value"]
    got = {(r["column_a"], r["column_b"]): r for r in out.collect()}
    ab = got[("a", "b")]
    assert ab["correlation"] == pytest.approx(0.6)
    # n = 5 complete pairs (the null-b row is excluded), not 6
    assert ab["z_stat"] == pytest.approx(kendall_z_stat(0.6, 5), rel=1e-9)
    assert ab["p_value"] == pytest.approx(0.141644690295, rel=1e-6)
    assert got[("a", "a")]["correlation"] == pytest.approx(1.0)


def test_merge_salted_matches_merge(spark):
    # skewed fixture: one hot key with 2000 rows, plus unmatched keys both sides
    left = spark.range(2000).select(
        F.lit(1).alias("k"), F.col("id").alias("v")
    ).union(
        spark.createDataFrame([(2, 9000), (7, 9001)], "k long, v long")
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (9, "orphan")], "k long, name string"
    )
    for how in ("inner", "left"):
        got = sorted(
            ops.merge_salted(left, right, "k", salt=8, join_type=how).collect(),
            key=lambda r: (r.k, r.v),
        )
        want = sorted(
            ops.merge(left, right, "k", join_type=how).collect(),
            key=lambda r: (r.k, r.v),
        )
        assert got == want


def test_merge_salted_shuffles_on_salt(spark):
    left = spark.createDataFrame([(1, 10)], "k long, v long")
    right = spark.createDataFrame([(1, "x")], "k long, name string")
    plan = (
        ops.merge_salted(left, right, "k", salt=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the exchange key must include the salt column, not just k
    assert "__salt" in plan


def test_merge_salted_rejects_right_join(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        ops.merge_salted(df, df, "k", join_type="right")


def test_sample_stratified_proportions(sample):
    # categories A:2, B:2, C:1 — ask for 3: every category keeps >=1 row,
    # proportional rounding caps the total near n
    out = ops.sample_stratified(sample, "category", 3, seed=42).collect()
    by_cat = {}
    for r in out:
        by_cat.setdefault(r.category, 0)
        by_cat[r.category] += 1
    assert set(by_cat) == {"A", "B", "C"}
    assert all(v >= 1 for v in by_cat.values())
    assert 3 <= len(out) <= 4  # round(2*0.6)=1, round(1*0.6)=1 with min-1 floor
    # seeded: stable across runs
    again = ops.sample_stratified(sample, "category", 3, seed=42).collect()
    assert sorted(r.id for r in out) == sorted(r.id for r in again)


def test_fill_stat_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None),
         ("b", 10.0), ("b", None),
         ("c", None)],  # all-NULL group
        "g string, v double",
    )
    # grouped mean: a -> 2.0, b -> 10.0; c falls back to global mean 14/3
    got = {(r["g"], i): r["v"] for i, r in enumerate(
        ops.fill_stat_grouped(df, ["v"], ["g"], "mean").orderBy("g", "v").collect())}
    vals = sorted(v for (g, _), v in got.items() if g == "a")
    assert vals == [1.0, 2.0, 3.0]
    assert sorted(v for (g, _), v in got.items() if g == "b") == [10.0, 10.0]
    assert [v for (g, _), v in got.items() if g == "c"] == [pytest.approx(14 / 3)]
    # no global fallback -> all-NULL group stays NULL
    left = ops.fill_stat_grouped(df, ["v"], ["g"], "mean", fallback_global=False)
    assert left.filter("g = 'c' AND v IS NULL").count() == 1


def test_fill_stat_grouped_median_and_mode(spark):
    df = spark.createDataFrame(
        [("a", 1.0, "x"), ("a", 2.0, "x"), ("a", 100.0, "y"), ("a", None, None),
         ("b", 5.0, "z"), ("b", None, "z"), ("b", 5.0, None)],
        "g string, v double, s string",
    )
    med = ops.fill_stat_grouped(df, ["v"], ["g"], "median")
    a_vals = sorted(r["v"] for r in med.filter("g='a'").collect())
    assert a_vals == [1.0, 2.0, 2.0, 100.0]  # filled with group median 2.0
    # mode with a tie ('x' x2 vs 'y' x1 in a; z only in b); tie in counts
    # resolves to the SMALLEST value deterministically
    tie = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"), ("a", None)],
        "g string, s string",
    )
    filled = ops.fill_stat_grouped(tie, ["s"], ["g"], "mode")
    assert filled.filter("s IS NULL").count() == 0
    assert filled.filter("s = 'x'").count() == 3  # tie -> 'x' < 'y'
    mod = ops.fill_stat_grouped(df, ["s"], ["g"], "mode")
    assert mod.filter("g='a' AND s='x'").count() == 3
    assert mod.filter("g='b' AND s='z'").count() == 3
