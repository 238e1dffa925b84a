"""Property tests: corpus-global line dedup and the Gopher filter vs
pure-Python reference models over Hypothesis-generated corpora (duplicate
lines within and across docs, blank/whitespace lines, empty docs).
Example counts are small — each example runs Spark jobs."""

from hypothesis import HealthCheck, given, settings, strategies as st

from nail_parquet_spark.functions.quality import (
    dedup_lines_global,
    gopher_filter,
)

# a tiny line alphabet forces heavy cross-doc duplication
LINES = ["alpha one", "beta two", "gamma", "  ", "", "delta four five"]

corpus = st.lists(
    st.lists(st.sampled_from(LINES), min_size=0, max_size=6),
    min_size=1, max_size=6,
).map(lambda docs: [(i, "\n".join(lines)) for i, lines in enumerate(docs)])


def model_dedup_lines(rows):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):  # keep-first = smallest (doc, pos)
        kept = []
        for line in text.split("\n"):
            line = line.strip()
            if not line:
                continue
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = "\n".join(kept)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=corpus)
def test_dedup_lines_matches_model(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in
           dedup_lines_global(df, "doc_id", "text").collect()}
    assert got == model_dedup_lines(rows)
    # corpus-wide invariant: every surviving line is unique
    all_lines = [l for t in got.values() for l in t.split("\n") if l]
    assert len(all_lines) == len(set(all_lines))


words = st.lists(
    st.sampled_from(["the", "of", "and", "cat", "x", "#", "...", "word"]),
    min_size=0, max_size=60,
)


def model_gopher_n_fail(text, min_words=50):
    toks = text.split()
    n = len(toks)
    fails = 0
    fails += n < min_words
    # mean word len in [3, 10]
    mwl = round(sum(len(w) for w in toks) / n, 6) if n else 0.0
    fails += mwl < 3.0 or mwl > 10.0
    symbols = text.count("#") + text.count("...") + text.count("…")
    swr = round(symbols / n, 6) if n else 0.0
    fails += swr > 0.1
    import re

    alpha = sum(1 for w in toks if re.search("[a-zA-Z]", w))
    fwa = round(alpha / n, 6) if n else 0.0
    fails += fwa < 0.8
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    fails += len({w.lower() for w in toks} & stops) < 2
    # the one line-level rule a single-line doc can fail: its only line
    # ending in an ellipsis makes frac_lines_ellipsis = 1.0 > 0.3
    line = text.strip()
    fails += bool(line) and (line.endswith("...") or line.endswith("…"))
    return fails


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ws=words)
def test_gopher_filter_matches_model_single_line(spark, ws):
    # single-line docs: every line-level rule passes trivially, so the model
    # only scores the word-level rules — and '...' both counts as a symbol
    # and, being whitespace-delimited, is a non-alpha token
    text = " ".join(ws)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_filter(df, "doc_id", "text").collect()[0]
    want = model_gopher_n_fail(text)
    assert row["n_fail"] == want
    assert row["passes"] == (want == 0)
    assert row["n_words"] == (len(text.split()) if text.strip() else 0)
