"""HTML → text extraction for Common-Crawl-style web pages.

The north-rule input table carries ``html:binary`` next to ``text:string``
with a per-row invariant: the extracted text must be byte-identical per
url. This module is the extraction side of that contract — a pinned,
deterministic rule set implemented entirely in JVM-side
``pyspark.sql.functions`` (regexp/replace chains inside whole-stage
codegen; no Python in the hot path), so extraction of 10^12 pages is a
single Exchange-free projection.

This is deliberately NOT a browser-grade parser (lxml/bs4 are not in the
container, and a DOM walk would be per-row Python). The rules below are
the fixed subset every extractor agrees on, each mirrored exactly in the
DuckDB oracle (RE2-compatible: no backreferences, inline ``(?is)`` flags
only):

  1. ``<script>…</script>`` and ``<style>…</style>`` blocks drop
     entirely (case-insensitive, DOTALL, non-greedy).
  2. HTML comments ``<!-- … -->`` drop entirely.
  3. With ``breaks=True`` (default), ``<br>``/``<br/>`` and closing
     ``</p>`` become ``\n`` (the pinned block-separator set); with
     ``breaks=False`` every tag maps to the empty string (the exact
     inverse of wrapping raw text in markup — the byte-identity mode).
  4. Every remaining tag ``<…>`` drops to the empty string.
  5. Entities unescape in pinned order: ``&lt; &gt; &quot; &#39;
     &nbsp;`` then ``&amp;`` LAST (so ``&amp;lt;`` yields the literal
     ``&lt;``, never ``<``). ``&nbsp;`` maps to U+00A0, not ASCII space.
     No other entities are decoded (numeric refs pass through verbatim —
     decoding the full set is locale/version-dependent and would break
     the byte-identity contract).

No whitespace is collapsed or trimmed — collapsing is lossy and belongs
to the quality layer (functions/quality.py), not extraction.

Reference parity: nail-parquet has no HTML surface (it is a parquet
tool); this module is beyond-reference, motivated by the web-corpus
input shape in BASELINE.json (url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# RE2-safe (oracle-shared): no backreferences, non-greedy + inline flags.
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
BREAK_RE = r"(?i)<br\s*/?>|</p\s*>"
TAG_RE = r"(?s)<[^>]*>"
HREF_RE = r"(?i)href\s*=\s*\"([^\"]*)\""
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title\s*>"
BODY_RE = r"(?is)<body[^>]*>(.*?)</body\s*>"

# (entity, replacement) in pinned application order; &amp; must be last.
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", "\u00a0"),
    ("&amp;", "&"),
)


def html_unescape(col: Column) -> Column:
    """Decode the pinned 6-entity set (rule 5). Literal ``replace`` chain
    — stays inside whole-stage codegen, no regex engine involved."""
    for ent, ch in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def html_escape(col: Column) -> Column:
    """Exact inverse of :func:`html_unescape` for the three structural
    characters: ``&`` FIRST, then ``<`` and ``>``. ``html_unescape(
    html_escape(x)) == x`` byte-identical for every string x — the
    fixture builder for round-trip oracles uses this."""
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    return col


def html_extract_text(col: Column, breaks: bool = True) -> Column:
    """Extract visible text from an HTML string column (rules 1-5).

    ``breaks=False`` is the byte-identity mode: for any page built as
    ``markup + html_escape(text) + markup`` (text in one text node) the
    result is exactly ``text`` plus the other text nodes — wrapping raw
    text in tags and extracting is the identity.
    """
    s = F.regexp_replace(col, SCRIPT_RE, "")
    s = F.regexp_replace(s, STYLE_RE, "")
    s = F.regexp_replace(s, COMMENT_RE, "")
    if breaks:
        s = F.regexp_replace(s, BREAK_RE, "\n")
    s = F.regexp_replace(s, TAG_RE, "")
    return html_unescape(s)


def html_title(col: Column) -> Column:
    """First ``<title>`` content, entity-decoded. Empty string when the
    page has no title (regexp_extract's no-match convention, shared by
    DuckDB)."""
    return html_unescape(F.regexp_extract(col, TITLE_RE, 1))


def html_links(col: Column) -> Column:
    """All double-quoted ``href`` values, in document order, verbatim
    (no entity decode — URLs are resolved by the crawl layer;
    functions/urls.py normalizes them). Returns ``array<string>``."""
    return F.regexp_extract_all(col, F.lit(HREF_RE), F.lit(1))


LANG_RE = r'(?is)<html\b[^>]*?\slang\s*=\s*["\']?([A-Za-z][A-Za-z0-9-]*)'
CANONICAL_RE = (r'(?is)<link\b[^>]*?rel\s*=\s*["\']?canonical["\']?'
                r'[^>]*?href\s*=\s*"([^"]*)"')
ROBOTS_META_RE = (r'(?is)<meta\b[^>]*?name\s*=\s*["\']?robots["\']?'
                  r'[^>]*?content\s*=\s*"([^"]*)"')


def html_canonical(col: Column) -> Column:
    """The ``<link rel="canonical" href="...">`` target (first match,
    verbatim; empty when absent). The canonical URL is the page's OWN
    declared dedup key — re-crawled mirrors and tracking-param variants
    of one article all point at the same canonical, so
    ``coalesce(nullif(canonical,''), url_normalize(url))`` collapses them
    ahead of any content hashing."""
    return F.regexp_extract(col, CANONICAL_RE, 1)


def html_meta(col: Column, name: str) -> Column:
    """Content of the first ``<meta name="<name>" content="...">``
    (case-insensitive on the name; empty when absent). ``name`` is pinned
    at plan-build time (it becomes part of the compiled regex), matching
    letters/digits/dash/underscore names only."""
    import re as _re

    if not _re.fullmatch(r"[A-Za-z0-9_-]+", name):
        raise ValueError(f"unsupported meta name {name!r}")
    pat = (r'(?is)<meta\b[^>]*?name\s*=\s*["\']?' + name
           + r'["\']?[^>]*?content\s*=\s*"([^"]*)"')
    return F.regexp_extract(col, pat, 1)


def html_noindex(col: Column) -> Column:
    """True when the page's robots meta declares ``noindex`` (or ``none``,
    its alias) — the page itself asked to be left out of the corpus; a
    compliant pipeline filters these before any quality scoring."""
    c = F.lower(F.regexp_extract(col, ROBOTS_META_RE, 1))
    return c.rlike(r"(^|[,\s])(noindex|none)([,\s]|$)")


def html_lang(col: Column) -> Column:
    """Declared document language: the ``lang`` attribute of the first
    ``<html>`` tag (BCP-47 tag like ``en`` / ``pt-BR``), lowercased;
    empty string when absent. The cheap seed signal a pipeline combines
    with content language-ID (functions/text.lang_id_table) — declared
    and detected language disagreeing is itself a quality flag."""
    return F.lower(F.regexp_extract(col, LANG_RE, 1))


def html_to_string(col: Column) -> Column:
    """Lossy UTF-8 decode of an ``html:binary`` column, JVM-side.

    WARC payloads legally contain non-UTF-8 byte runs (the synthesizer
    reproduces this — synth.py appends noise after ``</html>``). Spark
    4's ``decode(…, 'UTF-8')`` is strict and would fail the task, so we
    cast (UTF8String wraps bytes unvalidated) and repair with
    ``make_valid_utf8`` (invalid sequences → U+FFFD), which never
    touches the valid markup bytes. Zero Python, zero shuffle.
    """
    return F.make_valid_utf8(col.cast("string"))


# windows-1252's 0x80-0x9F block (the bytes where it differs from
# ISO-8859-1), built from the codec itself so the table can't drift; the
# five undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) pass through as C1
# controls, matching WHATWG decoders
_CP1252_PAIRS = [(chr(b), bytes([b]).decode("cp1252", "ignore"))
                 for b in range(0x80, 0xA0)]
_CP1252_SRC = "".join(s for s, d in _CP1252_PAIRS if d)
_CP1252_DST = "".join(d for s, d in _CP1252_PAIRS if d)

_CHARSET_SNIFF_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_.:-]+)"""

# pinned alias table (WHATWG-ish): browsers decode declared latin-1 as
# windows-1252, so both families land on the cp1252 path
_CHARSET_CP1252 = (
    "windows-1252", "cp1252", "x-cp1252", "windows1252",
    "iso-8859-1", "iso8859-1", "latin1", "latin-1", "l1", "csisolatin1",
)
_CHARSET_UTF8 = ("utf-8", "utf8", "us-ascii", "ascii", "csutf8")


def html_charset(col: Column) -> Column:
    """Charset declared by the page's ``<meta charset=…>`` /
    ``<meta http-equiv … content="…; charset=…">``, sniffed from the first
    2048 chars (HTML5 prescan window), lowercased; empty string when the
    page declares none. Works on binary or string pages."""
    head = F.substring(F.make_valid_utf8(col.cast("string")), 1, 2048)
    return F.lower(F.regexp_extract(head, _CHARSET_SNIFF_RE, 1))


def html_to_string_charset(col: Column) -> Column:
    """Charset-aware decode of an ``html:binary`` column (pinned subset):

    - declared windows-1252 / iso-8859-1 family → ISO-8859-1 byte map
      (total — every byte is valid) + the cp1252 0x80-0x9F translation,
      the WHATWG treatment of latin-1-declared pages;
    - declared UTF-8/ASCII, any OTHER charset, or no declaration →
      lossy UTF-8 (``html_to_string``), invalid sequences → U+FFFD.

    Entirely JVM expressions (decode/translate/regexp), zero Python, zero
    shuffle — at crawl scale this is a projection over the page scan, and
    the sniff reuses the same bytes the decode reads."""
    cs = html_charset(col)
    cp1252 = F.translate(F.decode(col, "ISO-8859-1"), _CP1252_SRC, _CP1252_DST)
    return F.when(cs.isin(*_CHARSET_CP1252), cp1252) \
            .otherwise(html_to_string(col))


def link_graph(df, url_col: str = "url", html_col: str = "html"):
    """Domain-level outlink graph from a page table: harvest every href
    from the page markup (binary columns are lossy-decoded first), map
    both ends through public-suffix-lite ``registered_domain``, and
    aggregate to ``(src_domain, dst_domain, n_links)`` — the edge table
    :func:`nail_parquet_spark.functions.graph.pagerank` ranks and a
    crawl frontier prioritizes.

    Self-links (intra-site navigation) are kept — callers filter
    ``src_domain != dst_domain`` when they want the external graph only.
    Relative hrefs yield an empty dst domain and are dropped (they have
    no cross-site meaning). Scale shape: the explode is in-partition;
    the ONLY Exchange is the final (src, dst) hash-aggregate, partial
    map-side."""
    from pyspark.sql.types import BinaryType

    from nail_parquet_spark.functions.urls import registered_domain

    page = F.col(html_col)
    if isinstance(df.schema[html_col].dataType, BinaryType):
        page = html_to_string(page)
    e = df.select(
        registered_domain(F.col(url_col)).alias("src_domain"),
        F.explode(html_links(page)).alias("__href"),
    )
    return (e.select("src_domain",
                     registered_domain(F.col("__href")).alias("dst_domain"))
            .filter(F.col("dst_domain") != "")
            .groupBy("src_domain", "dst_domain")
            .agg(F.count("*").alias("n_links")))


def html_body_text(col: Column, breaks: bool = True) -> Column:
    """Visible text of the ``<body>`` region of an ``html:binary``
    column: lossy-decode → take the first body block → rules 1-5.
    Restricting to body before extraction means trailing non-HTML bytes
    (WARC noise) never reach the text — this is the column the
    byte-identity invariant is checked against (see
    tests/test_html.py::test_binary_body_roundtrip_identity on the
    synthetic web table)."""
    return html_extract_text(
        F.regexp_extract(html_to_string(col), BODY_RE, 1), breaks=breaks
    )
