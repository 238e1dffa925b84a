"""Unicode normalization / script profile / mojibake / badwords tests.

Hand-computed fixtures pin the rule set; a seeded random corpus is
cross-checked against a DuckDB model of the same pinned rules (the oracle
used by __spark_entry__); plan tests pin the Exchange-free shape.
"""
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.normalize import (
    DASH_CHARS,
    INVISIBLE_CHARS,
    MOJIBAKE_MARKERS,
    SPACE_CHARS,
    badwords_filter,
    badwords_flag,
    mojibake_stats,
    normalize_text,
    script_profile_table,
)
from nail_parquet_spark.plans.explain import plan_text


@pytest.fixture(scope="module")
def uni_docs(spark):
    return spark.createDataFrame(
        [
            (1, "café “fancy” ‘quote’ –dash— …end"),
            (2, "a b c　d"),                     # unicode spaces
            (3, "zero​width‌‍﻿­here"),  # invisibles
            (4, "ctrl\x01\x02\x0b\x7fchars\tkeep\nnl"),
            (5, "  multi   spaces\t\ttabs  "),
            (6, None),
            (7, ""),
            (8, "already normal text"),
        ],
        "doc_id long, text string",
    )


def test_normalize_pinned_rules(spark, uni_docs):
    got = {r["doc_id"]: r["n"] for r in uni_docs.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    assert got[1] == "café \"fancy\" 'quote' -dash- ...end"
    assert got[2] == "a b c d"
    assert got[3] == "zerowidthhere"
    assert got[4] == "ctrlchars keep\nnl"     # tab folded into space collapse
    assert got[5] == "multi spaces tabs"
    assert got[6] is None                      # NULL passthrough
    assert got[7] == ""
    assert got[8] == "already normal text"


def test_normalize_idempotent_and_lowercase(spark, uni_docs):
    once = uni_docs.select("doc_id", normalize_text(F.col("text")).alias("n"))
    twice = once.select("doc_id", normalize_text(F.col("n")).alias("n"))
    assert once.collect() == twice.collect()
    low = uni_docs.select(
        normalize_text(F.col("text"), lowercase=True).alias("n")
    ).filter("n like 'CAF%'").count()
    assert low == 0


def test_normalize_matches_duckdb_model(spark):
    """Seeded random corpus vs the exact DuckDB expression the oracle entry
    uses (the shared chain builder — the two engines cannot drift)."""
    from __spark_entry__ import _normalize_chain_sql

    rng = random.Random(7)
    alphabet = ("ab c\t\nxyz" + SPACE_CHARS + INVISIBLE_CHARS + DASH_CHARS
                + "‘“…\x01\x0b")
    rows = [(i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40))))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = {r[0]: r[1] for r in con.sql(
        f"SELECT doc_id, {_normalize_chain_sql('text')} FROM t").fetchall()}
    assert got == exp


def test_script_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "plain latin words"),
            (2, "Привет мир"),   # cyrillic
            (3, "你好世界"),                                   # han
            (4, "abc Привет 你好你好 123"),
            (5, "1234 5678"),
            (6, None),
            (7, "???!!!..."),                                                  # punctuation only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           script_profile_table(df, "doc_id", "text").collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[1]["latin_chars"] == 15 and out[1]["other_chars"] == 0
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[3]["dominant_script"] == "han" and out[3]["han_chars"] == 4
    # mixed below the 0.5 dominance floor -> und
    assert out[4]["dominant_script"] == "und"
    assert out[5]["dominant_script"] == "digit"
    assert out[6]["dominant_script"] == "und" and out[6]["latin_chars"] is None
    assert out[7]["dominant_script"] == "und"
    assert out[7]["other_chars"] == out[7]["nonspace_chars"] == 9


def test_script_profile_dominance_floor(spark):
    df = spark.createDataFrame([(1, "ab 你好")],
                               "doc_id long, text string")
    strict = script_profile_table(df, "doc_id", "text",
                                  dominant_min_frac=0.9).collect()[0]
    loose = script_profile_table(df, "doc_id", "text",
                                 dominant_min_frac=0.5).collect()[0]
    assert strict["dominant_script"] == "und"
    assert loose["dominant_script"] == "latin"   # first-wins tie at 2 vs 2


def test_mojibake_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "clean text"),
            (2, "bad Ã© and â€™ here"),
            (3, "repl �� char"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           mojibake_stats(df, "doc_id", "text").collect()}
    assert out[1] == {"doc_id": 1, "replacement_chars": 0,
                      "mojibake_hits": 0, "suspect": False}
    assert out[2]["mojibake_hits"] == 2 and out[2]["suspect"]
    assert out[3]["replacement_chars"] == 2 and out[3]["suspect"]
    assert out[4]["suspect"] is False
    assert len(set(MOJIBAKE_MARKERS)) == len(MOJIBAKE_MARKERS)


def test_badwords_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "this has a BAD word"),
            (2, "badge is not bad-free"),   # 'badge' must NOT match \bbad\b
            (3, "clean row"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["has_badword"] for r in
           badwords_filter(df, "doc_id", "text", ["bad", "worse"]).collect()}
    assert out == {1: True, 2: True, 3: False, 4: False}  # 2: 'bad-free' hits \bbad\b
    only_word = {r["doc_id"]: r["has_badword"] for r in
                 badwords_filter(df, "doc_id", "text", ["badge"]).collect()}
    assert only_word == {1: False, 2: True, 3: False, 4: False}


def test_badwords_remove_preserves_duplicate_ids(spark):
    df = spark.createDataFrame(
        [(1, "bad stuff"), (1, "fine stuff"), (1, "fine stuff")],
        "doc_id long, text string",
    )
    kept = badwords_filter(df, "doc_id", "text", ["bad"], remove=True)
    assert kept.count() == 2   # filter-on-projection: no join dedup/fanout


def test_badwords_validation():
    with pytest.raises(ValueError):
        badwords_flag(F.col("x"), [])
    with pytest.raises(ValueError):
        badwords_flag(F.col("x"), ["ok", "un safe"])
    with pytest.raises(ValueError):
        badwords_flag(F.col("x"), ["regex|inject"])


def test_normalize_plans_exchange_free(spark, uni_docs):
    prof = script_profile_table(uni_docs, "doc_id", "text")
    norm = uni_docs.select(normalize_text(F.col("text")).alias("n"))
    moji = mojibake_stats(uni_docs, "doc_id", "text")
    bad = badwords_filter(uni_docs, "doc_id", "text", ["bad"])
    for df in (prof, norm, moji, bad):
        assert "Exchange" not in plan_text(df)


def test_cli_normalize_modes(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "café “q” –x…"), (2, "bad Ã© word"), (3, "你好世界")],
        "doc_id long, text string",
    ).write.parquet(p)

    def run(*argv):
        assert main(list(argv)) == 0

    out = str(tmp_path / "norm.parquet")
    run("normalize", p, "-o", out)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[1] == "café \"q\" -x..."

    run("normalize", p, "--mode", "scripts")
    assert "dominant_script" in capsys.readouterr().out
    run("normalize", p, "--mode", "mojibake")
    assert "mojibake_hits" in capsys.readouterr().out
    surv = str(tmp_path / "surv.parquet")
    run("normalize", p, "--mode", "badwords", "--words", "bad,worse",
        "--remove", "-o", surv)
    assert spark.read.parquet(surv).count() == 2


class TestStripAccents:
    def test_golden(self, spark):
        from pyspark.sql import functions as F

        from nail_parquet_spark.functions.normalize import strip_accents

        rows = [(1, "café"), (2, "naïve"), (3, "Łódź"), (4, "São Paulo"),
                (5, "Æsir ßeta Œuvre"),     # multichar decomps untouched
                (6, None), (7, "plain ascii")]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {r["id"]: r["o"] for r in
               df.select("id", strip_accents(F.col("t")).alias("o")).collect()}
        assert got[1] == "cafe" and got[2] == "naive"
        assert got[3] == "Lodz" and got[4] == "Sao Paulo"
        assert got[5] == "Æsir ßeta Œuvre"
        assert got[6] is None and got[7] == "plain ascii"

    def test_full_table_folds_to_ascii_letters(self, spark):
        from pyspark.sql import functions as F

        from nail_parquet_spark.functions.normalize import (
            ACCENT_DST, ACCENT_SRC, strip_accents)

        assert all("A" <= c <= "z" for c in ACCENT_DST)
        df = spark.createDataFrame([(1, ACCENT_SRC)], "id long, t string")
        out = df.select(strip_accents(F.col("t")).alias("o")).collect()[0]["o"]
        assert out == ACCENT_DST
        # idempotent: the fold of the fold is the fold
        df2 = spark.createDataFrame([(1, out)], "id long, t string")
        assert df2.select(strip_accents(F.col("t")).alias("o")) \
            .collect()[0]["o"] == out

    def test_normalize_text_accents_flag(self, spark):
        from pyspark.sql import functions as F

        from nail_parquet_spark.functions.normalize import normalize_text

        df = spark.createDataFrame(
            [(1, "“café”  — naïve")], "id long, t string")
        out = df.select(normalize_text(
            F.col("t"), accents=True).alias("o")).collect()[0]["o"]
        assert out == '"cafe" - naive'
