"""Corpus mixing: pinned md5-threshold determinism, rate accuracy,
temperature math, and the Spark/DuckDB keep-set identity the oracle needs."""
import duckdb
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.mixing import (
    corpus_mix,
    mix_stats,
    rate_to_hex8,
    temperature_rates,
)


def _docs(spark, n=6000):
    return spark.range(0, n, 1, 8).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 < 6 THEN 'en' WHEN id % 10 < 9 THEN 'de' ELSE 'fr' END AS lang")


def test_rate_to_hex8_pinned():
    assert rate_to_hex8(0.0) == "00000000"
    assert rate_to_hex8(0.5) == "80000000"
    assert rate_to_hex8(1.0) == "g"
    assert rate_to_hex8(2.0) == "g"
    # 'g' must sort above every hex prefix ('100000000' would not)
    assert "ffffffff" < "g"


def test_corpus_mix_rates_and_determinism(spark):
    df = _docs(spark)
    mixed = corpus_mix(df, "lang", {"en": 0.5, "de": 0.25}, "doc_id")
    st = {r.lang: r for r in mix_stats(df, mixed, "lang").collect()}
    assert abs(st["en"].rate - 0.5) < 0.05
    assert abs(st["de"].rate - 0.25) < 0.06
    assert st["fr"].rate == 1.0  # default keeps everything
    again = corpus_mix(df, "lang", {"en": 0.5, "de": 0.25}, "doc_id")
    assert sorted(r.doc_id for r in mixed.collect()) == \
        sorted(r.doc_id for r in again.collect())
    # per-group salting: changing de's rate leaves en's kept set alone
    other = corpus_mix(df, "lang", {"en": 0.5, "de": 0.9}, "doc_id")
    assert sorted(r.doc_id for r in mixed.filter("lang='en'").collect()) == \
        sorted(r.doc_id for r in other.filter("lang='en'").collect())


def test_corpus_mix_matches_duckdb(spark):
    df = _docs(spark, 2000)
    mixed = corpus_mix(df, "lang", {"en": 0.3}, "doc_id")
    got = sorted(r.doc_id for r in mixed.collect())
    con = duckdb.connect()
    want = [r[0] for r in con.execute("""
        WITH d AS (
          SELECT range AS doc_id,
                 CASE WHEN range % 10 < 6 THEN 'en'
                      WHEN range % 10 < 9 THEN 'de' ELSE 'fr' END AS lang
          FROM range(2000))
        SELECT doc_id FROM d
        WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|' || lang), 1, 8)
              < (CASE WHEN lang = 'en' THEN '4ccccccc' ELSE 'g' END)
        ORDER BY doc_id""").fetchall()]
    assert rate_to_hex8(0.3) == "4ccccccc"
    assert got == want


def test_temperature_rates(spark):
    df = _docs(spark)  # en 3600, de 1800, fr 600
    flat = temperature_rates(df, "lang", temperature=1.0)
    assert all(abs(r - 1.0) < 1e-9 for r in flat.values())  # T=1: natural mix
    hot = temperature_rates(df, "lang", temperature=1e9)  # ~uniform target
    # the smallest group pins the scale at rate 1; larger groups downsample
    assert abs(hot["fr"] - 1.0) < 1e-6
    assert hot["en"] < hot["de"] < 1.0
    assert abs(hot["en"] * 3600 - hot["fr"] * 600) / 600 < 0.01
    with pytest.raises(ValueError):
        temperature_rates(df, "lang", temperature=0)
    with pytest.raises(ValueError):
        corpus_mix(df, "lang", {"en": -0.1}, "doc_id")


def test_mix_stats_counts_zero_groups(spark):
    df = _docs(spark, 100)
    mixed = corpus_mix(df, "lang", {"fr": 0.0}, "doc_id")
    st = {r.lang: r for r in mix_stats(df, mixed, "lang").collect()}
    assert st["fr"].n_after == 0 and st["fr"].rate == 0.0


def test_weighted_sample_proportional_and_deterministic(spark):
    from nail_parquet_spark.functions.mixing import weighted_sample

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 1.0).otherwise(9.0).alias("w"))
    kept = weighted_sample(df, "doc_id", "w", target_frac=0.2)
    rows = kept.collect()
    # mean(w)=5: p(low)=0.04, p(high)=0.36; expected 80 / 720 of 2000 each
    lo = sum(1 for r in rows if r["w"] == 1.0)
    hi = sum(1 for r in rows if r["w"] == 9.0)
    assert 40 <= lo <= 130 and 620 <= hi <= 820
    # heavier rows ~9x likelier
    assert hi / max(lo, 1) > 4
    # deterministic: identical set on re-evaluation
    again = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 0.2).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_weighted_sample_edge_weights(spark):
    from nail_parquet_spark.functions.mixing import weighted_sample

    df = spark.createDataFrame(
        [(1, None), (2, -5.0), (3, 0.0), (4, 10.0)],
        "doc_id long, w double")
    kept = weighted_sample(df, "doc_id", "w", target_frac=1.0)
    # NULL/negative/zero weights never kept; positive weight's p clips at 1
    assert [r["doc_id"] for r in kept.collect()] == [4]
    zeros = df.withColumn("w", F.lit(0.0))
    assert weighted_sample(zeros, "doc_id", "w", 0.5).count() == 0
    # empty input -> NULL mean; the in-plan when() guard must yield an
    # empty frame with the input schema (the old driver-branch contract)
    empty = df.filter(F.lit(False))
    out = weighted_sample(empty, "doc_id", "w", 0.5)
    assert out.columns == df.columns and out.count() == 0


def test_weighted_sample_matches_duckdb(spark):
    import duckdb

    from nail_parquet_spark.functions.mixing import weighted_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(7)) + 1).cast("double").alias("w"))
    got = sorted(r["doc_id"] for r in
                 weighted_sample(df, "doc_id", "w", 0.25).collect())
    want = [r[0] for r in duckdb.sql("""
        WITH d AS (SELECT range AS doc_id,
                          CAST(range % 7 + 1 AS DOUBLE) AS w FROM range(3000)),
        m AS (SELECT round(avg(greatest(w, 0)), 6) AS mu FROM d)
        SELECT doc_id FROM d, m
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              < least(round(0.25 * greatest(w, 0) / mu, 9), 1.0) * 4294967296.0
        ORDER BY doc_id""").fetchall()]
    assert got == want and len(got) > 500


def test_mix_cli_weighted(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "wdocs")
    spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("double").alias("w")
    ).write.parquet(src)
    out = str(tmp_path / "wout.parquet")
    rc = main(["mix", src, "--id-column", "doc_id",
               "--weight-column", "w", "--target-frac", "0.4", "-o", out])
    assert rc == 0
    n = spark.read.parquet(out).count()
    assert 100 <= n <= 320
