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
