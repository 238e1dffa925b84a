"""Sentence splitter + corpus-global sentence dedup (functions/quality)."""

import duckdb
from pyspark.sql import functions as F

from nail_parquet_spark.functions.quality import (
    _sentences,
    dedup_sentences_global,
)


def split_py(text: str) -> list[str]:
    """Python model of the pinned splitter: mark [.!?]+ runs followed by
    whitespace, split on the mark, trim, drop empties."""
    import re

    marked = re.sub(r"([.!?]+)\s+", "\\1\x1e", text)
    return [s for s in (p.strip() for p in marked.split("\x1e")) if s]


def test_splitter_pinned_rules(spark):
    cases = [
        "One. Two!  Three? Four",          # mixed terminators, double space
        "No terminator at all",
        "Trailing dot.",                   # final sentence keeps its dot
        "Ellipsis... then more. End",      # terminator RUN stays together
        "  leading space. tail  ",
        "",
        "a.b stays glued. next",           # no whitespace -> no boundary
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.s for r in
           df.select(_sentences(F.col("t")).alias("s")).collect()]
    assert got == [split_py(c) for c in cases]


def test_dedup_keeps_smallest_doc_pos(spark):
    df = spark.createDataFrame(
        [
            (1, "Buy now! Unique one. Buy now!"),
            (2, "Buy now! Unique two."),
            (3, "Unique three. Unique one."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text
           for r in dedup_sentences_global(df, "doc_id", "text").collect()}
    # "Buy now!" survives only at (1, 0); "Unique one." only at (1, 1)
    assert out[1] == "Buy now! Unique one."
    assert out[2] == "Unique two."
    assert out[3] == "Unique three."


def test_doc_fully_deduped_comes_back_empty(spark):
    df = spark.createDataFrame(
        [(1, "Same line."), (2, "Same line.")], "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in dedup_sentences_global(df, "doc_id", "text").collect()}
    assert out == {1: "Same line.", 2: ""}


def test_matches_duckdb_model(spark):
    docs = [
        (1, "The cat sat. The dog ran! Was it fun? The cat sat."),
        (2, "The dog ran! Something new. Was it fun?"),
        (3, "Entirely fresh text here. Something new."),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple,
                     dedup_sentences_global(df, "doc_id", "text").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(r"""
        WITH src AS (
          SELECT doc_id,
                 regexp_replace(text, '([.!?]+)\s+', '\1' || chr(30), 'g') AS m
          FROM d),
        sent AS (
          SELECT doc_id, i - 1 AS pos, ss[i] AS s
          FROM (SELECT doc_id,
                       list_filter(
                         list_transform(string_split(m, chr(30)),
                                        p -> regexp_replace(p, '^\s+|\s+$', '', 'g')),
                         p -> p <> '') AS ss
                FROM src),
               UNNEST(range(1, len(ss) + 1)) AS t(i)),
        win AS (SELECT s, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
                FROM sent GROUP BY s),
        kept AS (SELECT p.doc_id, p.pos, p.s FROM sent p JOIN win ON p.s = win.s
                 WHERE p.doc_id = win.w.doc_id AND p.pos = win.w.pos),
        reb AS (SELECT doc_id, string_agg(s, ' ' ORDER BY pos) AS text
                FROM kept GROUP BY doc_id)
        SELECT s.doc_id, coalesce(r.text, '') AS text
        FROM d s LEFT JOIN reb r USING (doc_id)
    """).fetchall()))
    assert got == want


def spans_model(docs, span=3):
    """Python model of dedup_sentence_spans_global's pinned semantics."""
    sents = {d: split_py(t) for d, t in docs}
    occ = {}
    for d, t in sorted(docs):
        ss = sents[d]
        for p in range(len(ss) - span + 1):
            occ.setdefault("\x1f".join(ss[p:p + span]), []).append((d, p))
    bad = set()
    for key, places in occ.items():
        for d, p in places[1:] if places == sorted(places) else sorted(places)[1:]:
            for q in range(p, p + span):
                bad.add((d, q))
    return {d: " ".join(s for i, s in enumerate(sents[d])
                        if (d, i) not in bad)
            for d, _ in docs}


def test_span_dedup_matches_python_model(spark):
    from nail_parquet_spark.functions.quality import dedup_sentence_spans_global

    docs = [
        (1, "Alpha one. Beta two. Gamma three. Unique A."),
        (2, "Intro here. Alpha one. Beta two. Gamma three. Outro done."),
        (3, "Alpha one. Beta two. Gamma three."),
        (4, "Short. Doc."),
        (5, ""),
        # self-repeat inside one doc: second occurrence loses
        (6, "X marks. Y here. Z done. X marks. Y here. Z done."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in dedup_sentence_spans_global(df, "doc_id", "text").collect()}
    assert got == spans_model(docs)


def test_span_dedup_overlapping_loser_spans(spark):
    from nail_parquet_spark.functions.quality import dedup_sentence_spans_global

    # doc 2 repeats doc 1's whole text shifted: every one of its spans
    # loses, wiping all covered sentences
    docs = [(1, "A a. B b. C c. D d."),
            (2, "A a. B b. C c. D d. E e.")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in dedup_sentence_spans_global(df, "doc_id", "text").collect()}
    assert got == spans_model(docs)
    assert got[1] == "A a. B b. C c. D d."   # winner doc intact
    assert got[2] == "E e."                   # only the uncovered tail survives


def test_span_dedup_width_one_equals_sentence_dedup(spark):
    from nail_parquet_spark.functions.quality import (
        dedup_sentence_spans_global, dedup_sentences_global)

    docs = [(1, "Buy now! Keep one."), (2, "Buy now! Keep two.")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple,
                   dedup_sentence_spans_global(df, "doc_id", "text",
                                               span=1).collect()))
    b = sorted(map(tuple, dedup_sentences_global(df, "doc_id", "text").collect()))
    assert a == b


def test_span_dedup_validation(spark):
    import pytest

    from nail_parquet_spark.functions.quality import dedup_sentence_spans_global

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span"):
        dedup_sentence_spans_global(df, "doc_id", "text", span=0)


def test_span_dedup_matches_duckdb_model(spark):
    from nail_parquet_spark.functions.quality import dedup_sentence_spans_global

    docs = [
        (1, "The cat sat. The dog ran! Was it fun? More text. The end."),
        (2, "Lead in. The cat sat. The dog ran! Was it fun? Fresh tail."),
        (3, "The cat sat. Unrelated. The dog ran!"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(map(tuple,
                     dedup_sentence_spans_global(df, "doc_id", "text").collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = sorted(map(tuple, con.execute(r"""
        WITH src AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(
                     string_split(regexp_replace(text, '([.!?]+)\s+',
                                                 '\1' || chr(30), 'g'), chr(30)),
                     p -> regexp_replace(p, '^\s+|\s+$', '', 'g')),
                   p -> p <> '') AS ss
          FROM d),
        spans AS (
          SELECT doc_id, i - 1 AS pos,
                 array_to_string(ss[i:i+2], chr(31)) AS key
          FROM src, UNNEST(range(1, greatest(len(ss) - 2, 0) + 1)) AS t(i)),
        win AS (SELECT key, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
                FROM spans GROUP BY key),
        bad AS (
          SELECT DISTINCT s.doc_id, UNNEST(range(s.pos, s.pos + 3)) AS pos
          FROM spans s JOIN win ON s.key = win.key
          WHERE NOT (s.doc_id = win.w.doc_id AND s.pos = win.w.pos)),
        sent AS (
          SELECT doc_id, i - 1 AS pos, ss[i] AS s
          FROM src, UNNEST(range(1, len(ss) + 1)) AS t(i)),
        kept AS (
          SELECT sent.doc_id, sent.pos, sent.s
          FROM sent ANTI JOIN bad USING (doc_id, pos)),
        reb AS (SELECT doc_id, string_agg(s, ' ' ORDER BY pos) AS text
                FROM kept GROUP BY doc_id)
        SELECT d.doc_id, coalesce(r.text, '') AS text
        FROM d LEFT JOIN reb r USING (doc_id)
    """).fetchall()))
    assert got == want
