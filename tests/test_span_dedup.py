"""Exact-substring (duplicated-span) dedup tests.

Hand-computed fixtures pin the window/coverage arithmetic; a seeded random
corpus is cross-checked against a DuckDB model of the same pinned rules
(the oracle used by __spark_entry__).
"""
import random

import duckdb
import pytest

from nail_parquet_spark.functions.dedup import (
    duplicate_span_stats,
    remove_duplicate_spans,
)


@pytest.fixture(scope="module")
def span_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e"),            # shares "a b c" with doc 2
            (2, "x a b c y"),
            (3, "q r s"),                # unique
            (4, "m n o p m n o p"),      # internal repetition, full coverage
            (5, None),                   # NULL text passes through
            (6, ""),                     # empty
            (7, "a b"),                  # shorter than the window
        ],
        "doc_id long, text string",
    )


def test_span_stats_hand_computed(span_docs):
    rows = {r["doc_id"]: r for r in
            duplicate_span_stats(span_docs, "doc_id", "text", w=3).collect()}
    assert len(rows) == 7
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_windows"], r1["n_dup_windows"],
            r1["dup_tokens"]) == (5, 3, 1, 3)
    assert r1["dup_token_frac"] == 0.6
    r2 = rows[2]
    assert (r2["n_dup_windows"], r2["dup_tokens"]) == (1, 3)
    r3 = rows[3]
    assert (r3["n_tokens"], r3["n_windows"], r3["n_dup_windows"],
            r3["dup_tokens"], r3["dup_token_frac"]) == (3, 1, 0, 0, 0.0)
    # doc 4: dup starts at 1,2,5,6 -> union of [1,3],[2,4],[5,7],[6,8] = 8
    r4 = rows[4]
    assert (r4["n_tokens"], r4["n_windows"], r4["n_dup_windows"],
            r4["dup_tokens"], r4["dup_token_frac"]) == (8, 6, 4, 8, 1.0)
    for d in (5, 6, 7):  # no windows -> all zero
        r = rows[d]
        assert (r["n_windows"], r["n_dup_windows"], r["dup_tokens"],
                r["dup_token_frac"]) == (0, 0, 0, 0.0)
    assert rows[5]["n_tokens"] == 0 and rows[7]["n_tokens"] == 2


def test_span_removal_hand_computed(span_docs):
    rows = {r["doc_id"]: r["text"] for r in
            remove_duplicate_spans(span_docs, "doc_id", "text", w=3).collect()}
    assert rows[1] == "d e"
    assert rows[2] == "x y"
    assert rows[3] == "q r s"
    assert rows[4] == ""          # fully covered
    assert rows[5] is None        # NULL passes through
    assert rows[6] == ""
    assert rows[7] == "a b"


def test_span_removal_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "u v w z", "k"), (2, "p u v w", "k2")],
        "doc_id long, text string, tag string")
    out = remove_duplicate_spans(df, "doc_id", "text", w=3)
    assert set(out.columns) == {"doc_id", "text", "tag"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["tag"] == "k" and rows[1]["text"] == "z"
    assert rows[2]["text"] == "p"


def test_span_width_validation(span_docs):
    with pytest.raises(ValueError, match="window width"):
        duplicate_span_stats(span_docs, "doc_id", "text", w=1).collect()


_STATS_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(lower(text)) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS a
  FROM docs),
wins AS (
  SELECT doc_id, i AS pos,
         CAST('0x' || substr(md5(array_to_string(a[i:i+{wm1}], ' ')), 1, 15)
              AS BIGINT) AS h
  FROM toks, UNNEST(range(1, len(a) - {w} + 2)) AS t(i)),
dupk AS (SELECT h FROM wins GROUP BY h HAVING count(*) > 1),
dpos AS (SELECT doc_id, pos FROM wins JOIN dupk USING (h)),
cov AS (
  SELECT doc_id, pos,
         least({w}, coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             - pos, {w})) AS c
  FROM dpos),
agg AS (SELECT doc_id, count(*) AS n_dup_windows,
               CAST(sum(c) AS BIGINT) AS dup_tokens
        FROM cov GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.a) AS BIGINT) AS n_tokens,
       CAST(greatest(len(t.a) - {wm1}, 0) AS BIGINT) AS n_windows,
       coalesce(a.n_dup_windows, 0) AS n_dup_windows,
       coalesce(a.dup_tokens, 0) AS dup_tokens,
       CASE WHEN len(t.a) > 0
            THEN round(coalesce(a.dup_tokens, 0) / len(t.a), 6)
            ELSE 0.0 END AS dup_token_frac
FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def test_span_stats_matches_duckdb_model(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in
        duplicate_span_stats(df, "doc_id", "text", w=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in
                  con.execute(_STATS_SQL.format(w=4, wm1=3)).fetchall())
    assert len(got) == 200
    for g, w_ in zip(got, want):
        assert g[:5] == w_[:5]
        assert abs(g[5] - w_[5]) < 1e-9
    # sanity: the random corpus actually exercised the dup path
    assert any(g[3] > 0 for g in got)


def test_span_plans_scale_shape(span_docs):
    """No global window (coverage lead() is doc-partitioned) and window
    TEXT never reaches an exchange — only the 8-byte hash + position do."""
    from nail_parquet_spark.plans.explain import global_windows, plan_text

    stats = duplicate_span_stats(span_docs, "doc_id", "text", w=3)
    assert global_windows(stats) == []
    txt = plan_text(stats)
    for seg in txt.split("Exchange")[1:]:
        first_line = seg.splitlines()[0]
        assert "__win" not in first_line
    rm = remove_duplicate_spans(span_docs, "doc_id", "text", w=3)
    assert global_windows(rm) == []

def test_span_keep_first_hand_computed(span_docs):
    rows = {r["doc_id"]: r["text"] for r in
            remove_duplicate_spans(span_docs, "doc_id", "text", w=3,
                                   keep="first").collect()}
    # "a b c" dup: winner is (1, pos 1) -> doc 1 keeps everything, doc 2
    # loses tokens 2-4
    assert rows[1] == "a b c d e"
    assert rows[2] == "x y"
    assert rows[3] == "q r s"
    # doc 4 "m n o p m n o p": dup hashes at (1,5),(2,6); winners (4,1),(4,2)
    # -> losers (4,5),(4,6) cover tokens 5-8; first copy survives
    assert rows[4] == "m n o p"
    assert rows[5] is None
    assert rows[6] == ""
    assert rows[7] == "a b"


def test_span_keep_first_winner_can_still_lose_overlap(spark):
    """The winner occurrence is never marked, but OTHER duplicated windows'
    losers overlapping it still cut tokens (documented contract)."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "b c d")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["text"] for r in
            remove_duplicate_spans(df, "doc_id", "text", w=3,
                                   keep="first").collect()}
    # "a b c" winner (1,1); "b c d" winner (1,2) -> losers (2,1),(3,1)
    assert rows[1] == "a b c d"
    assert rows[2] == "" and rows[3] == ""


def test_span_keep_first_validation(span_docs):
    with pytest.raises(ValueError, match="keep must be"):
        remove_duplicate_spans(span_docs, "doc_id", "text", keep="last")


def test_span_keep_first_no_global_window(span_docs):
    from nail_parquet_spark.plans.explain import global_windows

    rm = remove_duplicate_spans(span_docs, "doc_id", "text", w=3,
                                keep="first")
    assert global_windows(rm) == []
