"""Script-profile Arrow kernel vs the SQL regex path.

The kernel's interval tables are generated FROM the Java regex (see
functions/script_data), so the decisive test is the boundary sweep: every
interval edge ±1 plus a seeded random codepoint sample, counted by both
engines and compared exactly. The profile test then pins the shared
dominance projection end-to-end on mixed real-text docs.
"""
import random

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.normalize import script_profile_table
from nail_parquet_spark.functions.script_data import SCRIPT_INTERVALS


def _collect_profiles(df):
    return {r["doc_id"]: tuple(r)[1:] for r in df.collect()}


@pytest.fixture(scope="module")
def boundary_docs(spark):
    """One single-char doc per interval edge (±1) + 3000 seeded random
    codepoints + the degenerate rows (NULL, empty, space-only)."""
    cps = set()
    for ivs in SCRIPT_INTERVALS.values():
        for a, b in ivs:
            cps.update(x for x in (a - 1, a, b, b + 1)
                       if 0 <= x < 0x110000 and not (0xD800 <= x < 0xE000))
    rng = random.Random(13)
    while len(cps) < 3600:
        x = rng.randrange(0x110000)
        if not (0xD800 <= x < 0xE000):
            cps.add(x)
    rows = [(i, chr(c)) for i, c in enumerate(sorted(cps))]
    rows += [(900000, None), (900001, ""), (900002, " \t\n\r")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_script_kernel_boundaries(spark, boundary_docs):
    sql = _collect_profiles(
        script_profile_table(boundary_docs, "doc_id", "text", engine="sql"))
    arrow = _collect_profiles(
        script_profile_table(boundary_docs, "doc_id", "text", engine="arrow"))
    assert sql.keys() == arrow.keys()
    diffs = [k for k in sql if sql[k] != arrow[k]]
    assert not diffs, f"{len(diffs)} mismatching codepoints, e.g. {diffs[:5]}"


def test_script_kernel_mixed_docs(spark):
    rng = random.Random(7)
    pools = ["the cat and dog", "Привет мир тест", "你好世界汉字",
             "مرحبا بالعالم", "안녕하세요 세계", "नमस्ते दुनिया",
             "0123456789", "?!...#@", " \t\n"]
    rows = [(i, " ".join(rng.choice(pools) for _ in range(rng.randrange(0, 8))))
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sql = _collect_profiles(
        script_profile_table(df, "doc_id", "text", engine="sql"))
    arrow = _collect_profiles(
        script_profile_table(df, "doc_id", "text", engine="arrow"))
    assert sql == arrow
    # sanity: the dominance floor still routes mixed docs to 'und'
    doms = {v[-1] for v in arrow.values()}
    assert "und" in doms and len(doms) > 2


def test_script_kernel_schema_and_floor(spark):
    df = spark.createDataFrame([(1, "ab 你好")], "doc_id long, text string")
    a = script_profile_table(df, "doc_id", "text", engine="arrow")
    s = script_profile_table(df, "doc_id", "text", engine="sql")
    assert a.columns == s.columns
    strict = script_profile_table(df, "doc_id", "text",
                                  dominant_min_frac=0.9,
                                  engine="arrow").collect()[0]
    assert strict["dominant_script"] == "und"
    with pytest.raises(ValueError):
        script_profile_table(df, "doc_id", "text", engine="bogus")


def test_cli_scripts_arrow(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    p = str(tmp_path / "d.parquet")
    spark.createDataFrame([(1, "Привет мир")],
                          "doc_id long, text string").write.parquet(p)
    assert main(["normalize", p, "--mode", "scripts",
                 "--engine", "arrow"]) == 0
    assert "cyrillic" in capsys.readouterr().out
