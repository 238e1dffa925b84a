"""The arrow quality kernel must be BIT-IDENTICAL to the oracle-attested
Catalyst form (functions/quality_arrow vs gopher_signals_table) — golden
edge cases + a Hypothesis sweep over the adversarial alphabet (every
byte-class the kernel special-cases: ASCII \\s variants, SPACE-only trim,
multi-byte bullets/ellipsis, case-fold, dots runs, NBSP, fullwidth)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

EDGE_CASES = [
    "the quick brown fox. and some stopwords have with that",
    "", "   ", "\t", "\t\n", "\tabc", "abc\n", "a  b   c",
    "...... ..... # ## …… mix...ed",
    "- bullet line\n* star line\n• uni bullet\n● black circle\nplain line.",
    "ends with...\nends with…\nends with.\nends with!\nno end",
    "123 456 a1b 1a ?? !!",
    "line one.\nline one.\nline two.\n   \nline one.",
    "THE BE TO OF AND THAT HAVE WITH",
    "naïve café … über #tag",
    "Ｔｈｅ fullwidth",
    "word nbsp joined",
    " \t mixed \t ",
    "a.\n\n\nb.",
    None,
    "...", "#", "…", "x…", '. ! ? "',
    "-", "- ", "••", "…\n…\n…",
    "of of of of", "THE the The tHe",
]

ALPHABET = list("ab Z9 .!?\"#-*\t\n\x0b\f\r…•●é中") + [" ", "Ｔ", "of", "the", "with"]


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and that was that with a hat to be of note"),
        (2, ""),
        (3, "- one\n- two\n- three"),
        (4, "same line\nsame line\nsame line\nother"),
        (5, "alpha beta alpha beta alpha beta"),
        (6, "### ### ### ..."),
        (7, "One line ends here.\nAnother trails off...\nplain"),
        (8, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _dup_expr():
    lines = F.col("__lines")
    return F.when(
        F.size(lines) > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6),
    ).otherwise(F.lit(0.0))


def _compare(spark, texts):
    from nail_parquet_spark.functions.quality import gopher_signals_table
    from nail_parquet_spark.functions.quality_arrow import gopher_signals_table_arrow

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    sql = {r["id"]: r.asDict() for r in gopher_signals_table(
        df, "id", "text", extra={"dup_line_frac": _dup_expr()}).collect()}
    arw = {r["id"]: r.asDict() for r in gopher_signals_table_arrow(
        df, "id", "text", with_dup=True).collect()}
    for i in sql:
        assert sql[i] == arw[i], (repr(texts[i]), sql[i], arw[i])


def test_arrow_kernel_matches_sql_golden(spark):
    _compare(spark, EDGE_CASES)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.sampled_from(ALPHABET), max_size=40).map("".join),
                min_size=1, max_size=25))
def test_arrow_kernel_matches_sql_property(spark, texts):
    _compare(spark, texts)


def test_gopher_filter_engines_agree(spark, docs):
    from nail_parquet_spark.functions.quality import gopher_filter

    a = gopher_filter(docs, "doc_id", "text", explain=True, engine="sql")
    b = gopher_filter(docs, "doc_id", "text", explain=True, engine="arrow")
    assert a.columns == b.columns
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_gopher_filter_bad_engine(spark, docs):
    from nail_parquet_spark.functions.quality import gopher_filter

    with pytest.raises(ValueError, match="engine"):
        gopher_filter(docs, "doc_id", "text", engine="pandas")
