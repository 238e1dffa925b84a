"""HTML → text extraction (functions/html.py).

The central assertion is the north-rule per-row invariant: extracting the
body text of the synthetic web table's ``html:binary`` column reproduces
the ``text`` column BYTE-IDENTICALLY for every url (BASELINE.json
input_hint), including rows with unicode, empty text, and trailing
non-UTF-8 WARC noise.
"""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.html import (
    html_body_text,
    html_escape,
    html_extract_text,
    html_links,
    html_title,
    html_to_string,
    html_unescape,
)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            (
                1,
                '<html><head><title>T &amp; co</title>'
                "<style type='text/css'>p { color: red; }</style>"
                '<script>if (1 < 2) { alert("&"); }</script></head>'
                '<body><p>first</p><p>a &lt;b&gt; &#39;c&#39;</p>'
                '<a href="https://x.example/a">link</a><br/>'
                "<!-- hidden <secret> -->tail</body></html>",
            ),
            (2, "no markup at all"),
            (3, "<body><div>d1</div>line1<br>line2</body>"),
        ],
        "id long, page string",
    )


def test_extract_text_rules(spark, pages):
    out = {
        r.id: r.t
        for r in pages.select(
            "id", html_extract_text(F.col("page")).alias("t")
        ).collect()
    }
    # script/style/comment dropped, </p> and <br/> -> \n (title is NOT a
    # break tag — pinned rule 3), entities decoded
    assert out[1] == "T & cofirst\na <b> 'c'\nlink\ntail"
    assert out[2] == "no markup at all"
    assert out[3] == "d1line1\nline2"


def test_title_and_links(spark, pages):
    r = (
        pages.filter("id = 1")
        .select(
            html_title(F.col("page")).alias("title"),
            html_links(F.col("page")).alias("links"),
        )
        .first()
    )
    assert r.title == "T & co"
    assert r.links == ["https://x.example/a"]
    r2 = pages.filter("id = 2").select(html_links(F.col("page")).alias("l")).first()
    assert r2.l == []


def test_escape_unescape_roundtrip(spark):
    # adversarial: pre-escaped entities, all structural chars, unicode
    texts = [
        "plain",
        "a < b > c & d",
        "&amp;lt; stays &lt;",
        'quotes " and \' and &nbsp;',
        "unicode 日本語 \U0001f389 café",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    out = df.select(
        "t", html_unescape(html_escape(F.col("t"))).alias("rt")
    ).collect()
    for r in out:
        assert r.rt == r.t, repr((r.t, r.rt))


def test_extract_inverts_wrapping(spark):
    """Wrapping escaped text in markup and extracting is the identity
    (breaks=False — the byte-identity mode)."""
    texts = ["a < b & c", "x&amp;y", "tag <p> inside", "été \U0001f389"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    page = F.concat(
        F.lit("<html><body><div class='x'>"),
        html_escape(F.col("t")),
        F.lit("</div></body></html>"),
    )
    out = df.select(
        "t", html_extract_text(page, breaks=False).alias("rt")
    ).collect()
    for r in out:
        assert r.rt == r.t, repr((r.t, r.rt))


def test_binary_body_roundtrip_identity(spark):
    """North-rule invariant on the synthetic web table: body text of
    html:binary == text column, byte-identical per url, despite trailing
    non-UTF-8 noise after </html>."""
    from nail_parquet_spark.synth import webpages_spark

    web = webpages_spark(spark, 3_000, seed=7, n_parts=4)
    mismatches = (
        web.select(
            "url",
            html_body_text(F.col("html"), breaks=False).alias("extracted"),
            "text",
        )
        .filter(
            (F.col("extracted") != F.col("text"))
            | F.col("extracted").isNull()
        )
        .count()
    )
    assert mismatches == 0


def test_to_string_is_lossy_not_failing(spark):
    df = spark.createDataFrame(
        [(bytearray(b"<p>ok</p>" + bytes([0xFF, 0xFE, 0x3C])),)], "b binary"
    )
    s = df.select(html_to_string(F.col("b")).alias("s")).first().s
    assert s.startswith("<p>ok</p>")
    assert "�" in s


def test_extraction_plan_is_exchange_free(spark, pages):
    from nail_parquet_spark.plans.explain import plan_text

    out = pages.select(
        html_extract_text(F.col("page")).alias("t"),
        html_title(F.col("page")).alias("title"),
    )
    assert "Exchange" not in plan_text(out)


def test_cli_extract(spark, tmp_path):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.synth import webpages_spark

    src = str(tmp_path / "web.parquet")
    webpages_spark(spark, 200, seed=11, n_parts=2).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    assert main(["extract", src, "--mode", "all", "--no-breaks",
                 "-o", out]) == 0
    got = spark.read.parquet(out)
    assert "extracted_text" in got.columns and "html" not in got.columns
    bad = got.filter("extracted_text != text").count()
    assert bad == 0
    assert got.filter("title != 'page'").count() == 0

    links = str(tmp_path / "links.parquet")
    assert main(["extract", src, "--mode", "links", "-o", links]) == 0
    assert spark.read.parquet(links).schema["links"].dataType.simpleString() \
        == "array<string>"


def test_html_lang(spark):
    from nail_parquet_spark.functions.html import html_lang

    rows = [
        (1, '<html lang="en"><body>x</body></html>'),
        (2, "<HTML LANG='pt-BR'><body>x</body></HTML>"),
        (3, '<html dir="rtl" lang=ar><body>x</body></html>'),  # unquoted
        (4, '<html><body lang="de">no html-tag lang</body></html>'),
        (5, '<div lang="fr">not the html element</div>'),
    ]
    df = spark.createDataFrame(rows, "i long, page string")
    got = {r["i"]: r["l"] for r in
           df.select("i", html_lang("page").alias("l")).collect()}
    assert got == {1: "en", 2: "pt-br", 3: "ar", 4: "", 5: ""}


def test_link_graph(spark):
    from nail_parquet_spark.functions.html import link_graph

    rows = [
        (1, "https://a-site.com/p1",
         '<a href="https://b-site.org/x">1</a><a href="https://www.b-site.org/y">2</a>'
         '<a href="https://a-site.com/self">3</a><a href="/relative">4</a>'),
        (2, "https://a-site.com/p2", '<a href="https://c-site.net/z">5</a>'),
        (3, "https://b-site.org/p", "no links here"),
    ]
    df = spark.createDataFrame(rows, "id long, url string, html string")
    got = {(r["src_domain"], r["dst_domain"]): r["n_links"]
           for r in link_graph(df).collect()}
    assert got == {("a-site.com", "b-site.org"): 2,   # www collapses
                   ("a-site.com", "a-site.com"): 1,   # self-link kept
                   ("a-site.com", "c-site.net"): 1}   # relative dropped


def test_link_graph_binary_and_cli(spark, tmp_path):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.functions.html import link_graph

    df = spark.createDataFrame(
        [(1, "https://a-site.com/", bytearray(
            b'<a href="https://b-site.org/x">l</a>' + bytes([0xFF])))],
        "id long, url string, html binary")
    got = link_graph(df).collect()
    assert [(r["src_domain"], r["dst_domain"], r["n_links"]) for r in got] \
        == [("a-site.com", "b-site.org", 1)]
    src = str(tmp_path / "pages.parquet")
    df.write.parquet(src)
    out = str(tmp_path / "edges.parquet")
    assert main(["extract", src, "--mode", "link-graph", "-o", out]) == 0
    assert spark.read.parquet(out).count() == 1


def test_canonical_meta_noindex(spark):
    from nail_parquet_spark.functions.html import (
        html_canonical, html_meta, html_noindex)

    rows = [
        (1, '<head><link rel="canonical" href="https://a.com/x">'
            '<meta name="description" content="A page.">'
            '<meta name="robots" content="index, follow"></head>'),
        (2, "<head><LINK REL='canonical' HREF=\"https://b.com/y?id=1\">"
            '<meta name="ROBOTS" content="NOINDEX, nofollow"></head>'),
        (3, '<head><meta name="robots" content="none"></head>'),
        (4, '<head><meta name="robots" content="nofollow"></head>'),
        (5, "<p>nothing</p>"),
    ]
    df = spark.createDataFrame(rows, "i long, page string")
    got = df.select(
        "i",
        html_canonical("page").alias("c"),
        html_meta(F.col("page"), "description").alias("d"),
        html_noindex("page").alias("n"),
    ).collect()
    g = {r["i"]: (r["c"], r["d"], r["n"]) for r in got}
    assert g[1] == ("https://a.com/x", "A page.", False)
    assert g[2] == ("https://b.com/y?id=1", "", True)
    assert g[3] == ("", "", True)
    assert g[4] == ("", "", False)
    assert g[5] == ("", "", False)


def test_html_meta_rejects_unsafe_name(spark):
    import pytest as _pytest

    from nail_parquet_spark.functions.html import html_meta

    with _pytest.raises(ValueError):
        html_meta(F.lit("<p/>"), 'x"]|evil')


def test_charset_decode_matches_python_model(spark):
    """html_to_string_charset pinned against Python's codecs over random
    pages: declared cp1252/latin-1 family decodes via windows-1252 (WHATWG
    treatment), everything else lossy UTF-8 — one Spark job."""
    import random

    rng = random.Random(13)
    # cp1252-representable alphabet incl. the 0x80-0x9F specials and
    # latin-1 accents; plus a multibyte pool for the utf-8 cases
    cp_pool = "abc éèü café €•“”‘’–—ŠžŒ ™…ƒ"
    u_pool = cp_pool + "中文🙂Ωπ"
    decls = [("windows-1252", "cp1252"), ("ISO-8859-1", "cp1252"),
             ("Latin1", "cp1252"), ("UTF-8", "utf-8"), (None, "utf-8"),
             ("shift_jis", "utf-8")]  # undeclared/unsupported -> lossy utf-8
    rows, want = [], {}
    for i in range(120):
        decl, codec = decls[rng.randrange(len(decls))]
        pool = cp_pool if codec == "cp1252" else u_pool
        body = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        meta = f'<meta charset="{decl}">' if decl else ""
        page = f"<html>{meta}<body>{body}</body></html>"
        enc = "cp1252" if codec == "cp1252" else "utf-8"
        raw = page.encode(enc)
        rows.append((i, raw))
        want[i] = raw.decode("cp1252" if codec == "cp1252" else "utf-8")
    from pyspark.sql import functions as F

    from nail_parquet_spark.functions.html import (
        html_charset, html_to_string_charset)

    df = spark.createDataFrame(rows, "i int, html binary")
    got = df.select("i", html_charset(F.col("html")).alias("cs"),
                    html_to_string_charset(F.col("html")).alias("t")).collect()
    for r in got:
        assert r["t"] == want[r["i"]], (r["i"], r["cs"])


def test_charset_undefined_cp1252_bytes_pass_through(spark):
    # 0x81/0x8D/0x8F/0x90/0x9D are undefined in cp1252: they pass through
    # as C1 controls (WHATWG decoder behavior), never crash the task
    from pyspark.sql import functions as F

    from nail_parquet_spark.functions.html import html_to_string_charset

    raw = b'<meta charset="windows-1252">a\x81b\x90c'
    df = spark.createDataFrame([(raw,)], "html binary")
    got = df.select(html_to_string_charset(F.col("html")).alias("t")).first()["t"]
    assert got.endswith("a\x81b\x90c")


def test_extract_cli_charset_modes(spark, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "pages.parquet")
    page = '<meta charset="windows-1252"><body>caf\xe9 €</body>'
    spark.createDataFrame(
        [(1, page.encode("cp1252"))], "doc_id long, html binary"
    ).write.parquet(src)
    out = str(tmp_path / "audit.parquet")
    assert main(["extract", src, "--mode", "charset", "-o", out]) == 0
    assert spark.read.parquet(out).first()["charset"] == "windows-1252"
    out2 = str(tmp_path / "text.parquet")
    assert main(["extract", src, "--charset-aware", "-o", out2]) == 0
    assert spark.read.parquet(out2).first()["extracted_text"] == "café €"
    # without --charset-aware the cp1252 bytes mojibake to U+FFFD
    out3 = str(tmp_path / "text_lossy.parquet")
    assert main(["extract", src, "-o", out3]) == 0
    assert "�" in spark.read.parquet(out3).first()["extracted_text"]
    capsys.readouterr()
