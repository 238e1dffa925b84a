"""URL quality signals + composed rule filter (functions/urls)."""

import duckdb

from nail_parquet_spark.functions.urls import (
    BANNED_EXTENSIONS,
    url_quality_filter,
    url_signals_table,
)

URLS = [
    (1, "https://www.example.com/a/b/c.html?x=1&y=2&utm=3"),
    (2, "http://host.co.uk/img/logo.PNG"),
    (3, "https://a.b.c.d.example.org/" + "p/" * 20 + "deep"),
    (4, "https://example.com/id/" + "1234567890" * 30),
    (5, "https://example.com/"),
    (6, "relative/path/page.htm?q=1"),
    (7, None),
    (8, "https://example.com/download.tar.gz"),
    (9, "https://example.com/page#frag?notquery=1"),
    (10, "https://example.com/x?" + "&".join(f"p{i}=v" for i in range(12))),
]


def _duck_signals():
    con = duckdb.connect()
    con.execute("CREATE TABLE u (id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", URLS)
    return con.execute(r"""
        WITH p AS (
          SELECT id, url,
                 CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.\-]*://')
                      THEN regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)
                      ELSE string_split(string_split(url, '?')[1], '#')[1]
                 END AS path,
                 lower(regexp_replace(
                   regexp_extract(
                     regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
                     '([^@]*)$', 1),
                   ':[0-9]*$', '')) AS host,
                 regexp_extract(string_split(url, '#')[1], '\?(.*)', 1) AS q
          FROM u WHERE url IS NOT NULL)
        SELECT id,
               length(url) AS url_len,
               CASE WHEN length(url) > 0
                    THEN length(regexp_replace(url, '[^0-9]', '', 'g'))::DOUBLE
                         / length(url)::DOUBLE ELSE 0.0 END AS digit_frac,
               length(path) - length(replace(path, '/', '')) AS path_depth,
               CASE WHEN q = '' THEN 0
                    ELSE length(q) - length(replace(q, '&', '')) + 1
               END AS n_query_params,
               length(host) - length(replace(host, '.', '')) AS subdomain_depth,
               lower(regexp_extract(path, '\.([A-Za-z0-9]{1,5})$', 1)) AS extension
        FROM p ORDER BY id
    """).fetchall()


def test_signals_match_duckdb(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    got = sorted(
        (r.id, r.url_len, round(r.digit_frac, 9), r.path_depth,
         r.n_query_params, r.subdomain_depth, r.extension)
        for r in url_signals_table(df.filter("url IS NOT NULL"), "id").collect())
    want = sorted((i, ln, round(dfra, 9), pd, nq, sd, ext)
                  for i, ln, dfra, pd, nq, sd, ext in _duck_signals())
    assert got == want


def test_signal_values_pinned(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    s = {r.id: r for r in url_signals_table(df, "id").collect()}
    assert s[1].n_query_params == 3 and s[1].extension == "html"
    assert s[2].extension == "png"           # lowercased
    assert s[3].path_depth == 21
    assert s[5].path_depth == 1 and s[5].extension == ""
    assert s[6].n_query_params == 1          # relative URL still parses
    assert s[8].extension == "gz"            # FINAL extension only
    assert s[9].n_query_params == 0          # '?' after '#' is fragment text
    assert s[4].digit_frac > 0.5


def test_filter_rules(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    v = {r.id: r for r in url_quality_filter(df, "id").collect()}
    assert v[1].passes
    assert not v[2].passes and not v[2].ok_extension       # banned .png
    assert not v[3].passes and not v[3].ok_depth           # path trap
    assert not v[4].passes and not v[4].ok_digits
    assert not v[7].passes                                  # NULL fails all
    assert not v[8].passes                                  # .gz
    assert not v[10].passes and not v[10].ok_params
    # override: allow assets
    v2 = {r.id: r for r in url_quality_filter(
        df, "id", rules={"ban_extensions": False}).collect()}
    assert v2[2].passes and "ok_extension" not in v2[2].asDict()


def test_banned_extensions_pinned():
    assert "pdf" in BANNED_EXTENSIONS and "html" not in BANNED_EXTENSIONS


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame(URLS, "id long, url string")
    plan = url_quality_filter(df, "id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
