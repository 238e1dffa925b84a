"""PII scrub + domain-analysis tests: pinned-rule behavior, Spark/DuckDB
regex-dialect parity (the oracle contract), and the capping semantics."""
import duckdb
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.pii import (
    PII_RULES,
    pii_mask_table,
    pii_signals_table,
    pii_stats,
)
from nail_parquet_spark.functions.urls import (
    domain_cap,
    domain_stats,
    registered_domain,
    url_host,
)

TEXTS = [
    ("mail a.b-c+tag@Ex-ample.co.uk now", {"email": 1}),
    ("server at 192.168.1.7 and 999.1.1.1 bad", {"ipv4": 1}),
    ("ssn 123-45-6789 card 1234-5678-9012-3456", {"ssn": 1, "card": 1}),
    ("call 25-989-741-2988 or +49 30 1234 5678", {"phone": 2}),
    ("date 2026-08-17 version 1.2.3 pages 100 2000", {}),
    (None, {}),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(TEXTS)], "id int, text string")


def test_pii_signals_counts(spark):
    rows = {r.id: r for r in pii_signals_table(_df(spark)).collect()}
    for i, (_, expect) in enumerate(TEXTS):
        for name, _, _ in PII_RULES:
            assert rows[i][f"n_{name}"] == expect.get(name, 0), (i, name)
        assert rows[i]["has_pii"] == bool(expect)


def test_pii_mask_pinned_order(spark):
    out = {r.id: r.text for r in pii_mask_table(_df(spark)).collect()}
    assert out[0] == "mail <EMAIL> now"
    assert out[1] == "server at <IP> and 999.1.1.1 bad"
    assert out[2] == "ssn <SSN> card <CARD>"
    assert out[3] == "call <PHONE> or <PHONE>"
    assert out[4] == TEXTS[4][0]  # dates/versions untouched
    assert out[5] is None


def test_pii_mask_subset_and_unknown(spark):
    out = {r.id: r.text
           for r in pii_mask_table(_df(spark), kinds=["email"]).collect()}
    assert out[0] == "mail <EMAIL> now"
    assert out[2] == TEXTS[2][0]
    with pytest.raises(ValueError):
        pii_mask_table(_df(spark), kinds=["emial"])


def test_pii_duckdb_dialect_parity(spark):
    """The exact pinned patterns must behave identically under Java regex
    (Spark) and RE2 (DuckDB) on adversarial text — this is what makes the
    oracle entries value-exact."""
    con = duckdb.connect()
    spark_rows = pii_signals_table(_df(spark)).orderBy("id").collect()
    for i, (text, _) in enumerate(TEXTS):
        for name, pat, _ in PII_RULES:
            got = con.execute(
                "select coalesce(len(regexp_extract_all($t, $p)), 0)",
                {"t": text, "p": pat}).fetchone()[0]
            assert got == spark_rows[i][f"n_{name}"], (i, name)


def test_pii_stats_shape(spark):
    rows = {r.kind: r for r in pii_stats(_df(spark)).collect()}
    assert set(rows) == {n for n, _, _ in PII_RULES}
    assert rows["phone"].n_hits == 2 and rows["phone"].n_docs == 1
    assert rows["email"].n_hits == 1


HOSTS = [
    ("https://WWW.Example.COM:443/a", "www.example.com", "example.com"),
    ("http://user:P@ss@Sub.BBC.co.uk:8080/x", "sub.bbc.co.uk", "bbc.co.uk"),
    ("https://192.168.1.7/x", "192.168.1.7", "192.168.1.7"),
    ("https://localhost/x", "localhost", "localhost"),
    ("relative/path.html", "", ""),
    ("https://a.b.co.jp/", "a.b.co.jp", "b.co.jp"),
]


def test_url_host_and_registered_domain(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in HOSTS], "url string")
    got = df.select(
        "url", url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d")).collect()
    for row, (_, h, d) in zip(sorted(got, key=lambda r: [x[0] for x in HOSTS].index(r.url)),
                              HOSTS):
        assert row.h == h, row.url
        assert row.d == d, row.url


def test_registered_domain_on_bare_host(spark):
    df = spark.createDataFrame([("News.BBC.CO.UK",), ("example.org",)], "h string")
    got = [r.d for r in df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == ["bbc.co.uk", "example.org"]


def _docs(spark):
    rows = []
    for i in range(60):
        dom = ["alpha.com", "beta.co.uk", "gamma.net"][i % 3]
        rows.append((i, f"https://www.{dom}/p/{i}", "x" * (10 + i % 5)))
    return spark.createDataFrame(rows, "id int, url string, text string")


def test_domain_stats(spark):
    out = {r.domain: r for r in domain_stats(_docs(spark), "url", "text").collect()}
    assert set(out) == {"alpha.com", "beta.co.uk", "gamma.net"}
    assert all(out[d].n_docs == 20 for d in out)
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-9
    assert out["alpha.com"].n_chars == sum(10 + i % 5 for i in range(0, 60, 3))


def test_domain_cap(spark):
    capped = domain_cap(_docs(spark), "url", max_docs=7, order_col="id")
    got = capped.groupBy(registered_domain(F.col("url")).alias("d")).count().collect()
    assert all(r["count"] == 7 for r in got)
    # deterministic: keeps the LOWEST ids per domain
    kept = sorted(r.id for r in capped.collect())
    assert kept == sorted(i for i in range(60) if i // 3 < 7)
    with pytest.raises(ValueError):
        domain_cap(_docs(spark), "url", 5, order_col=None)


def test_filter_blocked_domains(spark):
    from nail_parquet_spark.functions.urls import filter_blocked_domains

    docs = spark.createDataFrame(
        [(1, "https://www.bad.com/page"),      # blocked via www host
         (2, "https://Sub.BAD.com/x"),         # blocked, case/subdomain
         (3, "https://good.org/y"),
         (4, "https://bad.com.evil.net/z"),    # registered = evil.net: kept
         (5, None)],                           # NULL url: kept by anti-join
        "doc_id long, url string")
    block = spark.createDataFrame(
        [("bad.com",), ("Other.Example",), ("bad.com",)], "domain string")
    kept = sorted(r["doc_id"] for r in
                  filter_blocked_domains(docs, block).collect())
    assert kept == [3, 4, 5]
    audit = sorted(r["doc_id"] for r in
                   filter_blocked_domains(docs, block, invert=True).collect())
    assert audit == [1, 2]


def test_filter_blocked_domains_plan_broadcasts(spark):
    from nail_parquet_spark.functions.urls import filter_blocked_domains
    from nail_parquet_spark.plans.explain import plan_text

    docs = spark.createDataFrame([(1, "https://a.com/")], "id long, url string")
    block = spark.createDataFrame([("a.com",)], "domain string")
    plan = plan_text(filter_blocked_domains(docs, block))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
