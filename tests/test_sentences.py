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
