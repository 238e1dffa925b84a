"""KMV distinct-cardinality sketch (functions/sketch.py): pure-python md5
model parity (the estimate is DETERMINISTIC, so parity is exact equality),
exact-below-k rule, accuracy band on a real estimate path, partitioning
independence, and the pinned type/validation contract."""
import hashlib

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.sketch import kmv_distinct, kmv_oracle_sql

K = 64


def _model_est(values, k=K):
    hs = sorted({int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                 for v in values if v is not None})
    top = hs[:k]
    if len(top) < k:
        return float(len(top)), len(top)
    return float(k - 1) * pow(2.0, 60) / float(top[-1]), k


class TestKmv:
    def test_model_parity_exact(self, spark):
        vals = [f"doc-{i * 7919 % 1000}" for i in range(5000)]  # 1000 distinct
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        row = kmv_distinct(df, ["s"], k=K).collect()[0]
        want_est, want_n = _model_est(vals)
        assert row["col_name"] == "s"
        assert row["n_min"] == want_n == K
        assert row["est_distinct"] == want_est  # bit-identical IEEE order

    def test_exact_below_k(self, spark):
        df = spark.createDataFrame([(i % 9, f"c{i % 5}") for i in range(400)],
                                   "i long, c string")
        out = {r["col_name"]: r for r in kmv_distinct(df, ["i", "c"], k=K).collect()}
        assert out["i"]["est_distinct"] == 9.0 and out["i"]["n_min"] == 9
        assert out["c"]["est_distinct"] == 5.0

    def test_accuracy_band(self, spark):
        n = 20000
        df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("u"))
        est = kmv_distinct(df, ["u"], k=256).collect()[0]["est_distinct"]
        assert abs(est - n) / n < 0.25  # stderr ~ 1/sqrt(k-2) ~ 6%

    def test_partitioning_independent(self, spark):
        vals = [(f"v{i % 300}", i % 7) for i in range(2000)]
        df = spark.createDataFrame(vals, "s string, i long")
        a = kmv_distinct(df.repartition(13), ["s", "i"], k=128).collect()
        b = kmv_distinct(df.coalesce(1), ["s", "i"], k=128).collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]

    def test_nulls_excluded(self, spark, with_nulls):
        out = kmv_distinct(with_nulls, ["s"], k=K).collect()[0]
        assert out["est_distinct"] == 3.0  # a, c, e

    def test_duckdb_twin_matches(self, spark, tmp_path):
        import duckdb

        df = spark.createDataFrame(
            [(i % 123, f"s{i % 456}") for i in range(3000)], "i long, s string")
        p = str(tmp_path / "t.parquet")
        df.coalesce(1).write.parquet(p)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
        want = con.execute(kmv_oracle_sql("t", ["i", "s"], k=K)).fetchall()
        got = [(r["col_name"], r["n_min"], r["est_distinct"])
               for r in kmv_distinct(df, ["i", "s"], k=K).collect()]
        assert got == [tuple(r) for r in want]

    def test_validation(self, spark, sample):
        with pytest.raises(ValueError, match="no such column"):
            kmv_distinct(sample, ["nope"])
        with pytest.raises(ValueError, match="float"):
            kmv_distinct(sample, ["value"])
        with pytest.raises(ValueError, match="k must be"):
            kmv_distinct(sample, ["name"], k=1)
        with pytest.raises(ValueError, match="at least one"):
            kmv_distinct(sample, [])


class TestKmvGrouped:
    def _df(self, spark):
        # group g0: 300 distinct vals (> K=64, estimator), g1: 20 (exact),
        # null group: 5 (exact) — plus value-nulls that must be excluded
        rows = [("g0", f"v{i % 300}") for i in range(900)]
        rows += [("g1", f"w{i % 20}") for i in range(100)]
        rows += [(None, f"x{i}") for i in range(5)]
        rows += [("g0", None), (None, None)]
        return spark.createDataFrame(rows, "g string, v string")

    def test_model_parity_and_null_group(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_distinct_by

        out = {r["g"]: r for r in
               kmv_distinct_by(self._df(spark), ["g"], "v", k=K).collect()}
        want_est, want_n = _model_est([f"v{i}" for i in range(300)])
        assert out["g0"]["n_min"] == want_n == K
        assert out["g0"]["est_distinct"] == want_est
        assert out["g1"]["est_distinct"] == 20.0
        assert out[None]["est_distinct"] == 5.0  # null key is its own group

    def test_partitioning_independent(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_distinct_by

        df = self._df(spark)
        a = kmv_distinct_by(df.repartition(17), ["g"], "v", k=K).collect()
        b = kmv_distinct_by(df.coalesce(1), ["g"], "v", k=K).collect()
        assert [r.asDict() for r in a] == [r.asDict() for r in b]

    def test_multi_key_and_int_value(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_distinct_by

        df = spark.createDataFrame(
            [("a", i % 2, i % 37) for i in range(500)],
            "k1 string, k2 long, v long")
        out = kmv_distinct_by(df, ["k1", "k2"], "v", k=K).collect()
        assert len(out) == 2
        # gcd(2, 37) = 1, so each parity class cycles through all 37 residues
        got = {(r["k1"], r["k2"]): r["est_distinct"] for r in out}
        assert got[("a", 0)] == 37.0 and got[("a", 1)] == 37.0

    def test_duckdb_twin_matches(self, spark, tmp_path):
        import duckdb

        from nail_parquet_spark.functions.sketch import (kmv_by_oracle_sql,
                                                         kmv_distinct_by)

        df = self._df(spark)
        p = str(tmp_path / "g.parquet")
        df.coalesce(1).write.parquet(p)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
        want = con.execute(kmv_by_oracle_sql("t", ["g"], "v", k=K)).fetchall()
        got = [(r["g"], r["n_min"], r["est_distinct"])
               for r in kmv_distinct_by(df, ["g"], "v", k=K).collect()]
        assert got == [tuple(r) for r in want]

    def test_validation(self, spark, sample):
        from nail_parquet_spark.functions.sketch import kmv_distinct_by

        with pytest.raises(ValueError, match="value column 'value'"):
            kmv_distinct_by(sample, ["category"], "value")
        with pytest.raises(ValueError, match="at least one key"):
            kmv_distinct_by(sample, [], "name")


class TestKmvOverlap:
    def test_exact_below_k(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap

        a = spark.createDataFrame([(f"u{i}",) for i in range(30)] * 3,
                                  "u string")
        b = spark.createDataFrame([(f"u{i}",) for i in range(20, 50)],
                                  "u string")
        r = kmv_overlap(a, "u", b, "u", k=K).collect()[0]
        assert r["est_a"] == 30.0 and r["est_b"] == 30.0
        assert r["est_union"] == 50.0
        assert r["jaccard"] == 10.0 / 50.0
        assert r["est_intersection"] == (10.0 / 50.0) * 50.0

    def test_estimator_band(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap

        a = spark.range(4000).select(F.concat(F.lit("v"), F.col("id")).alias("u"))
        b = spark.range(2000, 6000).select(F.concat(F.lit("v"), F.col("id")).alias("u"))
        r = kmv_overlap(a, "u", b, "u", k=512).collect()[0]
        assert abs(r["est_union"] - 6000) / 6000 < 0.2
        assert abs(r["jaccard"] - 2000 / 6000) < 0.1
        assert abs(r["est_intersection"] - 2000) / 2000 < 0.3

    def test_empty_side(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap

        a = spark.createDataFrame([("x",), ("y",)], "u string")
        b = spark.createDataFrame([], "u string")
        r = kmv_overlap(a, "u", b, "u", k=K).collect()[0]
        assert r["est_a"] == 2.0 and r["est_b"] == 0.0
        assert r["est_union"] == 2.0 and r["jaccard"] == 0.0
        assert r["est_intersection"] == 0.0

    def test_duckdb_twin_matches(self, spark, tmp_path):
        import duckdb

        from nail_parquet_spark.functions.sketch import (kmv_overlap,
                                                         kmv_overlap_oracle_sql)

        a = spark.createDataFrame([(i % 700,) for i in range(3000)], "v long")
        b = spark.createDataFrame([(i % 900 + 400,) for i in range(3000)],
                                  "v long")
        pa_, pb_ = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        a.coalesce(1).write.parquet(pa_)
        b.coalesce(1).write.parquet(pb_)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW ta0 AS SELECT * FROM '{pa_}/*.parquet'")
        con.execute(f"CREATE VIEW tb0 AS SELECT * FROM '{pb_}/*.parquet'")
        want = con.execute(
            kmv_overlap_oracle_sql("ta0", "v", "tb0", "v", k=128)).fetchall()
        got = [tuple(r) for r in kmv_overlap(a, "v", b, "v", k=128).collect()]
        assert got == [tuple(r) for r in want]

    def test_partitioning_independent(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap

        a = spark.createDataFrame([(f"d{i % 400}",) for i in range(2000)],
                                  "u string")
        b = spark.createDataFrame([(f"d{i % 300 + 200}",) for i in range(900)],
                                  "u string")
        ra = kmv_overlap(a.repartition(9), "u", b.coalesce(1), "u", k=128)
        rb = kmv_overlap(a.coalesce(1), "u", b.repartition(7), "u", k=128)
        assert [r.asDict() for r in ra.collect()] == \
               [r.asDict() for r in rb.collect()]


class TestApproxQuantiles:
    def test_sample_below_k_is_exact(self, spark):
        from nail_parquet_spark.functions.sketch import approx_quantiles

        df = spark.createDataFrame([(i, float(10 * i)) for i in range(1, 6)],
                                   "id long, v double")
        out = approx_quantiles(df, "id", ["v"], [0.0, 0.5, 1.0], k=100)
        got = {r["q"]: r["value"] for r in out.collect()}
        assert got == {0.0: 10.0, 0.5: 30.0, 1.0: 50.0}

    def test_interpolation_matches_rank_rule(self, spark):
        from nail_parquet_spark.functions.sketch import approx_quantiles

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0])],
            "id long, v double")
        out = approx_quantiles(df, "id", ["v"], [0.3], k=10).collect()
        assert out[0]["value"] == 22.0  # rank 1+(5-1)*0.3 = 2.2

    def test_accuracy_band_and_determinism(self, spark):
        from nail_parquet_spark.functions.sketch import approx_quantiles

        n = 20000
        df = spark.range(n).select(F.col("id"),
                                   F.col("id").cast("double").alias("v"))
        a = approx_quantiles(df.repartition(11), "id", ["v"], [0.5], k=1024)
        b = approx_quantiles(df.coalesce(1), "id", ["v"], [0.5], k=1024)
        va, vb = a.collect()[0]["value"], b.collect()[0]["value"]
        assert va == vb  # deterministic, partitioning-independent
        assert abs(va - n / 2) / n < 0.05  # rank err ~ 1/sqrt(1024) ~ 3%

    def test_no_global_window_plan(self, spark):
        from nail_parquet_spark.functions.sketch import approx_quantiles

        df = spark.range(100).select(
            F.col("id"), F.col("id").cast("double").alias("v"))
        plan = approx_quantiles(df, "id", ["v"], [0.5], k=10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_duckdb_twin_matches(self, spark, tmp_path):
        import duckdb

        from nail_parquet_spark.functions.sketch import (approx_quantiles,
                                                         quantiles_oracle_sql)

        df = spark.createDataFrame(
            [(i, float((i * 37) % 1000) / 7.0, (i * 13) % 50)
             for i in range(3000)], "id long, a double, b long")
        p = str(tmp_path / "q.parquet")
        df.coalesce(1).write.parquet(p)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
        qs = [0.1, 0.5, 0.9]
        want = con.execute(quantiles_oracle_sql("t", "id", ["a", "b"], qs,
                                                k=256)).fetchall()
        got = [(r["col_name"], r["q"], r["value"]) for r in
               approx_quantiles(df, "id", ["a", "b"], qs, k=256).collect()]
        assert got == [tuple(r) for r in want]

    def test_validation(self, spark, sample):
        from nail_parquet_spark.functions.sketch import approx_quantiles

        with pytest.raises(ValueError, match="numeric"):
            approx_quantiles(sample, "id", ["name"], [0.5])
        with pytest.raises(ValueError, match="in \\[0, 1\\]"):
            approx_quantiles(sample, "id", ["value"], [1.5])
        with pytest.raises(ValueError, match="id column 'value'"):
            approx_quantiles(sample, "value", ["value"], [0.5])


class TestKmvOverlapBy:
    def test_exact_below_k_per_group(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap_by

        a = spark.createDataFrame(
            [("en", f"u{i}") for i in range(30)]
            + [("fr", f"u{i}") for i in range(10)], "g string, u string")
        b = spark.createDataFrame(
            [("en", f"u{i}") for i in range(20, 50)]
            + [("de", "x0")], "g string, u string")
        rows = {r["g"]: r for r in
                kmv_overlap_by(a, ["g"], "u", b, "u", k=K).collect()}
        assert set(rows) == {"en", "fr", "de"}
        en = rows["en"]
        assert en["est_a"] == 30.0 and en["est_b"] == 30.0
        assert en["est_union"] == 50.0 and en["jaccard"] == 10.0 / 50.0
        fr = rows["fr"]  # B-side absent
        assert fr["est_a"] == 10.0 and fr["est_b"] == 0.0
        assert fr["jaccard"] == 0.0 and fr["est_intersection"] == 0.0
        de = rows["de"]  # A-side absent
        assert de["est_a"] == 0.0 and de["est_b"] == 1.0

    def test_matches_ungrouped_per_group(self, spark):
        from nail_parquet_spark.functions.sketch import (kmv_overlap,
                                                         kmv_overlap_by)

        a = spark.range(3000).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("u"))
        b = spark.range(1500, 4500).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.concat(F.lit("v"), F.col("id")).alias("u"))
        grouped = {r["g"]: r for r in
                   kmv_overlap_by(a, ["g"], "u", b, "u", k=128).collect()}
        for g in ("0", "1", "2"):
            single = kmv_overlap(a.filter(F.col("g") == g), "u",
                                 b.filter(F.col("g") == g), "u",
                                 k=128).collect()[0]
            got = grouped[g]
            for f in ("n_union", "est_a", "est_b", "est_union",
                      "jaccard", "est_intersection"):
                assert got[f] == single[f if f != "n_union" else "n_union"], \
                    (g, f)

    def test_null_keys_excluded_and_duckdb_twin(self, spark, tmp_path):
        import duckdb

        from nail_parquet_spark.functions.sketch import (
            kmv_overlap_by, kmv_overlap_by_oracle_sql)

        a = spark.createDataFrame(
            [((i % 4) if i % 11 else None, i % 700) for i in range(3000)],
            "g int, v long")
        b = spark.createDataFrame(
            [((i % 4) if i % 13 else None, i % 900 + 350)
             for i in range(3000)], "g int, v long")
        pa_, pb_ = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        a.coalesce(1).write.parquet(pa_)
        b.coalesce(1).write.parquet(pb_)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW ta0 AS SELECT * FROM '{pa_}/*.parquet'")
        con.execute(f"CREATE VIEW tb0 AS SELECT * FROM '{pb_}/*.parquet'")
        want = con.execute(kmv_overlap_by_oracle_sql(
            "ta0", ["g"], "v", "tb0", "v", k=64)).fetchall()
        got = [tuple(r) for r in
               kmv_overlap_by(a, ["g"], "v", b, "v", k=64).collect()]
        assert got == [tuple(r) for r in want]
        assert all(r[0] is not None for r in got)  # NULL group excluded

    def test_validation(self, spark):
        from nail_parquet_spark.functions.sketch import kmv_overlap_by

        df = spark.createDataFrame([("a", 1)], "g string, v long")
        with pytest.raises(ValueError, match="non-empty"):
            kmv_overlap_by(df, [], "v", df, "v")
        with pytest.raises(ValueError, match="no such column"):
            kmv_overlap_by(df, ["nope"], "v", df, "v")


class TestQuantilesBy:
    """Per-group deterministic min-k-sample quantiles."""

    def test_exact_below_k_and_duckdb_parity(self, spark):
        import duckdb

        from nail_parquet_spark.functions.sketch import (
            approx_quantiles_by, quantiles_by_oracle_sql)

        src = "/root/testdata/sf0.001/documents.parquet"
        df = spark.read.parquet(src)
        got = [(r.lang, r.q, None if r.value is None else round(r.value, 6))
               for r in approx_quantiles_by(
                   df, ["lang"], "doc_id", "n_chars",
                   [0.0, 0.5, 1.0], k=10_000).collect()]
        # k >= group size: the sample IS the group -> exact quantiles
        want = [(a, b, None if c is None else round(c, 6))
                for a, b, c in duckdb.sql(quantiles_by_oracle_sql(
                    f"'{src}'", ["lang"], "doc_id", "n_chars",
                    [0.0, 0.5, 1.0], 10_000)).fetchall()]
        assert got == want
        exact = duckdb.sql(
            f"SELECT lang, quantile_cont(n_chars::DOUBLE, 0.5) FROM '{src}' "
            "GROUP BY lang ORDER BY lang").fetchall()
        med = [(g, v) for g, q, v in got if q == 0.5]
        assert med == [(a, round(b, 6)) for a, b in exact]

    def test_sampled_path_parity_and_determinism(self, spark):
        import duckdb

        from nail_parquet_spark.functions.sketch import (
            approx_quantiles_by, quantiles_by_oracle_sql)

        src = "/root/testdata/sf0.001/documents.parquet"
        df = spark.read.parquet(src)
        a = [tuple(r) for r in approx_quantiles_by(
            df, ["lang"], "doc_id", "n_chars", [0.5, 0.95], k=16).collect()]
        b = [tuple(r) for r in approx_quantiles_by(
            df.repartition(13), ["lang"], "doc_id", "n_chars",
            [0.5, 0.95], k=16).collect()]
        assert a == b  # layout-independent
        want = duckdb.sql(quantiles_by_oracle_sql(
            f"'{src}'", ["lang"], "doc_id", "n_chars", [0.5, 0.95],
            16)).fetchall()
        assert [(g, q, round(v, 9)) for g, q, v in a] \
            == [(g, q, round(v, 9)) for g, q, v in want]

    def test_null_keys_excluded_and_null_values_ignored(self, spark):
        from nail_parquet_spark.functions.sketch import approx_quantiles_by

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", None), (3, None, 99.0),
             (4, "b", None), (5, "b", None)],
            "id long, g string, v double")
        got = {(r.g, r.q): r.value for r in approx_quantiles_by(
            df, ["g"], "id", "v", [0.5], k=10).collect()}
        assert got == {("a", 0.5): 10.0, ("b", 0.5): None}

    def test_validation(self, spark):
        import pytest

        from nail_parquet_spark.functions.sketch import approx_quantiles_by

        df = spark.createDataFrame([(1, "a", "x")], "id long, g string, s string")
        with pytest.raises(ValueError, match="numeric"):
            approx_quantiles_by(df, ["g"], "id", "s", [0.5])
        with pytest.raises(ValueError, match="key"):
            approx_quantiles_by(df, [], "id", "id", [0.5])
        with pytest.raises(ValueError, match="\\[0, 1\\]"):
            approx_quantiles_by(df, ["g"], "id", "id", [1.5])
