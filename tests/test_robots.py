"""robots.txt parse + filter (functions/robots.py, pinned RFC 9309 subset).

The parser is pinned against a direct pure-Python model over 250 seeded
random bodies (ONE Spark job), plus handcrafted RFC edge cases; the
longest-match verdict is pinned the same way over random rule sets.
"""

import random

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.robots import (
    parse_robots,
    robots_filter,
    robots_verdict,
    url_path,
)

# ---------------------------------------------------------------------------
# pure-Python model of the pinned contract
# ---------------------------------------------------------------------------


def _model_parse(body, agent="*"):
    agent = agent.strip().lower()
    ua = st = sp = False
    srul, prul = [], []
    for raw in (body or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        low = line.lower()
        if low.startswith("user-agent") and low[10:].lstrip().startswith(":"):
            name = line.split(":", 1)[1].strip().lower()
            st = (ua and st) or name == "*"
            sp = (ua and sp) or name == agent
            ua = True
            continue
        if line == "":
            continue
        is_dis = low.startswith("disallow") and low[8:].lstrip().startswith(":")
        is_alw = low.startswith("allow") and low[5:].lstrip().startswith(":")
        if is_dis or is_alw:
            path = line.split(":", 1)[1].strip()
            if path.startswith("/") and "*" not in path and "$" not in path:
                if st:
                    srul.append((path, is_alw))
                if sp:
                    prul.append((path, is_alw))
        ua = False
    return prul if prul else srul


def _model_verdict(path, rules):
    best = (-1, True)
    for prefix, allow in rules:
        if path.startswith(prefix):
            c = (len(prefix), allow)
            if c[0] > best[0] or (c[0] == best[0] and allow):
                best = c
    return best[1]


def _random_body(rng):
    names = ["*", "GPTBot", "foo", " legacyBot "]
    paths = ["/a", "/ab", "/a/b", "/x*", "/y$", "relative", "", "/", "/Abc"]
    lines = []
    for _ in range(rng.randrange(0, 14)):
        kind = rng.randrange(6)
        if kind == 0:
            lines.append(f"User-agent: {rng.choice(names)}")
        elif kind == 1:
            lines.append(f"uSeR-AgEnT :{rng.choice(names)}")
        elif kind == 2:
            lines.append(f"Disallow: {rng.choice(paths)}")
        elif kind == 3:
            lines.append(f"allow:{rng.choice(paths)}  # trailing comment")
        elif kind == 4:
            lines.append(rng.choice(["", "   ", "# comment", "Crawl-delay: 5",
                                     "Sitemap: https://x/s.xml", "junk line"]))
        else:
            lines.append(f"DISALLOW : {rng.choice(paths)}")
    return "\n".join(lines)


def test_parse_matches_model_random(spark):
    rng = random.Random(42)
    bodies = [_random_body(rng) for _ in range(250)]
    df = spark.createDataFrame(
        [(f"h{i}.example", b) for i, b in enumerate(bodies)],
        "host string, robots_txt string")
    for agent in ("*", "GPTBot"):
        got = {}
        for r in parse_robots(df, agent=agent).collect():
            got.setdefault(r["host"], []).append((r["prefix"], r["allow"]))
        for i, b in enumerate(bodies):
            want = _model_parse(b, agent)
            assert got.get(f"h{i}.example", []) == want, (agent, b)


def test_parse_edge_cases(spark):
    body = ("User-agent: GPTBot\nDisallow: /\n\n"
            "User-agent: *\nUser-Agent: other\n"
            "Disallow: /src0/\nAllow: /src0/p1\n"
            "Disallow: /tmp/*\nAllow:\nCrawl-delay: 5\nDisallow: relative\n"
            "# a comment\nDisallow: /late")
    df = spark.createDataFrame([("h.example", body), ("n.example", None),
                                ("e.example", "")],
                               "host string, robots_txt string")
    rows = [(r["prefix"], r["allow"]) for r in parse_robots(df).collect()]
    # consecutive UA lines share a group; unknown directive ends the header
    # but not the group; wildcard/empty/relative paths dropped
    assert rows == [("/src0/", False), ("/src0/p1", True), ("/late", False)]
    # specific agent: only its group, star ignored
    rows2 = [(r["prefix"], r["allow"])
             for r in parse_robots(df, agent="gptbot").collect()]
    assert rows2 == [("/", False)]
    # NULL/empty bodies parse to no rules (allow-all)
    hosts = {r["host"] for r in parse_robots(df).collect()}
    assert hosts == {"h.example"}


def test_verdict_matches_model_random(spark):
    rng = random.Random(7)
    prefixes = ["/", "/a", "/a/", "/a/b", "/ab", "/c"]
    rules, docs, model_rules = [], [], {}
    for h in range(30):
        host = f"h{h}.example"
        rs = [(rng.choice(prefixes), rng.random() < 0.5)
              for _ in range(rng.randrange(0, 5))]
        model_rules[host] = rs
        rules += [(host, p, a) for p, a in rs]
        for d in range(5):
            path = rng.choice(["/", "/a", "/a/b/c", "/ab/x", "/c", "/zz"])
            docs.append((h * 10 + d, f"https://{host}{path}", path, host))
    rules_df = spark.createDataFrame(rules or [("x", "/", True)],
                                     "host string, prefix string, allow boolean")
    docs_df = spark.createDataFrame(
        [(i, u) for i, u, _, _ in docs], "doc_id long, url string")
    got = {r["doc_id"]: r["robots_allowed"]
           for r in robots_verdict(docs_df, rules_df).collect()}
    for i, _, path, host in docs:
        assert got[i] == _model_verdict(path, model_rules[host]), (path, host)


def test_filter_and_helpers(spark):
    rules = spark.createDataFrame(
        [("h.example", "/no/", False)], "host string, prefix string, allow boolean")
    docs = spark.createDataFrame(
        [(1, "https://h.example/no/x"), (2, "https://h.example/yes"),
         (3, "https://H.EXAMPLE:8080/no/y"),     # host casing + port
         (4, "https://u:p@h.example/no/z?q=1"),  # userinfo + query excluded
         (5, "not a url")],
        "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in robots_filter(docs, rules).collect())
    assert kept == [2, 5]
    # broadcast variant agrees
    kept_b = sorted(r["doc_id"] for r in
                    robots_filter(docs, rules, broadcast_rules=True).collect())
    assert kept_b == kept
    got = docs.select(url_path(F.col("url")).alias("p")).collect()
    assert got[1]["p"] == "/yes" and got[3]["p"] == "/no/z"
    with pytest.raises(ValueError, match="host, prefix, allow"):
        robots_verdict(docs, docs)


def test_cli_domains_robots(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    robots = str(tmp_path / "robots.parquet")
    spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /no/\n")],
        "host string, robots_txt string").write.parquet(robots)
    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "https://h.example/no/x"), (2, "https://h.example/yes")],
        "doc_id long, url string").write.parquet(docs)
    out = str(tmp_path / "kept.parquet")
    assert main(["domains", docs, "--mode", "robots", "--robots", robots,
                 "-o", out]) == 0
    kept = spark.read.parquet(out)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    # audit variant annotates instead of filtering
    out2 = str(tmp_path / "audit.parquet")
    assert main(["domains", docs, "--mode", "robots", "--robots", robots,
                 "--invert", "-o", out2]) == 0
    audit = spark.read.parquet(out2)
    assert audit.count() == 2 and "robots_allowed" in audit.columns
    capsys.readouterr()


def test_robots_corpus_from_warc(spark, tmp_path):
    """Round trip: robots.txt captures written as a WARC segment come back
    as a (host, robots_txt) corpus — latest capture per host wins — and
    feed parse_robots/robots_filter end to end."""
    import datetime as dt

    from nail_parquet_spark.functions.robots import (
        parse_robots, robots_corpus_from_warc, robots_filter)
    from nail_parquet_spark.sources.warc import write_warc

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    caps = [
        ("https://a.example/robots.txt", t0,
         b"User-agent: *\nDisallow: /old/\n"),
        ("https://a.example/robots.txt", t0 + dt.timedelta(days=3),
         b"User-agent: *\nDisallow: /no/\n"),     # latest capture wins
        ("https://b.example/robots.txt", t0, b"User-agent: *\n"),
        ("https://a.example/page.html", t0, b"<html>not robots</html>"),
    ]
    arc = str(tmp_path / "robots_warc")
    write_warc(spark.createDataFrame(
        caps, "url string, warc_ts timestamp, html binary"), arc)
    corpus = robots_corpus_from_warc(spark, arc)
    got = {r["host"]: r["robots_txt"] for r in corpus.collect()}
    assert set(got) == {"a.example", "b.example"}
    assert "Disallow: /no/" in got["a.example"]
    assert "Disallow: /old/" not in got["a.example"]
    docs = spark.createDataFrame(
        [(1, "https://a.example/no/x"), (2, "https://a.example/ok"),
         (3, "https://b.example/no/x")], "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in
                  robots_filter(docs, parse_robots(corpus)).collect())
    assert kept == [2, 3]


def test_robots_directives(spark):
    from nail_parquet_spark.functions.robots import robots_directives

    body = ("Sitemap: https://a.example/s1.xml\n"
            "User-agent: GPTBot\nCrawl-delay: 10\n\n"
            "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 3.5\n"  # last wins
            "sitemap:https://a.example/s2.xml  # comment\n"
            "Crawl-delay: not-a-number\n")
    df = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nDisallow: /\n"),
         ("c.example", None)],
        "host string, robots_txt string")
    got = {r["host"]: r for r in robots_directives(df).collect()}
    # '*' group: last numeric delay wins; non-numeric line ignored
    assert got["a.example"]["crawl_delay"] == 3.5
    # sitemaps are group-independent, file order, comments stripped
    assert got["a.example"]["sitemaps"] == [
        "https://a.example/s1.xml", "https://a.example/s2.xml"]
    assert got["b.example"]["crawl_delay"] is None
    assert got["b.example"]["sitemaps"] == []
    assert got["c.example"]["crawl_delay"] is None
    # specific agent: its group's delay beats '*' whenever it is named
    got2 = {r["host"]: r["crawl_delay"]
            for r in robots_directives(df, agent="gptbot").collect()}
    assert got2["a.example"] == 10.0
    # agent named with NO delay in its group: '*' must NOT leak in
    body3 = "User-agent: bot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 9\n"
    df3 = spark.createDataFrame([("d.example", body3)],
                                "host string, robots_txt string")
    assert robots_directives(df3, agent="bot").first()["crawl_delay"] is None


def test_cli_domains_robots_directives(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    robots = str(tmp_path / "rb.parquet")
    spark.createDataFrame(
        [("h.example",
          "User-agent: *\nCrawl-delay: 2\nSitemap: https://h.example/s.xml\n")],
        "host string, robots_txt string").write.parquet(robots)
    out = str(tmp_path / "dirs.parquet")
    assert main(["domains", robots, "--mode", "robots-directives",
                 "-o", out]) == 0
    r = spark.read.parquet(out).first()
    assert r["host"] == "h.example" and r["crawl_delay"] == 2.0
    assert r["sitemaps"] == ["https://h.example/s.xml"]
    capsys.readouterr()


def test_robots_verdict_plan_shape(spark):
    """Scale contract: with broadcast rules the page side never shuffles
    (BroadcastHashJoin, zero Exchange on the probe side); the verdict is a
    per-row fold, never a groupBy/window over the page table."""
    from nail_parquet_spark.plans.explain import global_windows, plan_text

    rules = spark.createDataFrame(
        [("h.example", "/no/", False)], "host string, prefix string, allow boolean")
    docs = spark.range(1000).selectExpr(
        "id as doc_id", "concat('https://h.example/p', id) as url")
    plan = plan_text(robots_verdict(docs, rules, broadcast_rules=True))
    assert "BroadcastHashJoin" in plan
    # the only Exchanges are on the (tiny) rules build side: none of them
    # hash-partition the page table's output
    import re

    assert not re.search(r"Exchange hashpartitioning\((doc_id|url)", plan)
    assert global_windows(robots_verdict(docs, rules)) == []
