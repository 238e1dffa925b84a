"""URL canonicalization for web-corpus dedup keys.

Exact-dup rates on web crawls are inflated by URL noise: fragment-only
variants, tracking query params, case-variant hosts, default ports. A
normalized URL is the standard join/dedup key before content hashing.

Everything is JVM-side ``pyspark.sql.functions`` (no Python hot path) with
DuckDB-twin semantics so the oracle checks values exactly. The rule set is
a deliberately pinned subset of WHATWG canonicalization (documented below),
NOT a full parser — normalization must be deterministic and cheap at
100 TB, and every rule is order-sensitive.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# params stripped from query strings (marketing/click trackers)
TRACKING_RE = r"([?&])(utm_[^=&]*|fbclid|gclid)(=[^&]*)?(&|$)"
_PREFIX_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)"


def url_normalize(col: Column) -> Column:
    """Normalize a URL with these pinned, ordered rules:

    1. drop the fragment (#...)
    2. lowercase the scheme and the host[:port] part of the authority —
       case-sensitive userinfo (user:pass@) is preserved verbatim (the
       host is everything after the LAST '@' in the authority, per RFC
       3986; ADVICE r4)
    3. strip default ports (http :80, https :443) — pinned to
       authorities whose only ':' is the port's (a ':' inside userinfo
       disables the strip; lossless, the port just stays)
    4. remove tracking query params (utm_*, fbclid, gclid) — the
       replacement runs a FIXED 4 passes, so up to 4 consecutive tracking
       params collapse (regexp_replace scans non-overlapping per pass);
       then trailing '?'/'&' are stripped
    5. a bare '/' path collapses to the empty path

    URLs with no scheme://host prefix pass through rules 1/4 only (the
    prefix regex matches nothing, so the whole string is 'rest').
    """
    s = F.split(col, "#").getItem(0)
    prefix = F.regexp_extract(s, _PREFIX_RE, 1)
    rest = F.substring(s, F.length(prefix) + F.lit(1), F.length(s))
    # lowercase scheme:// and host[:port] only; greedy (.*@) pins the
    # userinfo boundary at the LAST '@' of the authority
    scheme = F.regexp_extract(prefix, r"^([A-Za-z][A-Za-z0-9+.\-]*://)", 1)
    auth = F.substring(prefix, F.length(scheme) + F.lit(1), F.length(prefix))
    userinfo = F.regexp_extract(auth, r"^(.*@)", 1)
    hostport = F.substring(auth, F.length(userinfo) + F.lit(1), F.length(auth))
    prefix = F.concat(F.lower(scheme), userinfo, F.lower(hostport))
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]*):80$", "$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]*):443$", "$1")
    for _ in range(4):
        rest = F.regexp_replace(rest, TRACKING_RE, "$1")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.when(rest == "/", F.lit("")).otherwise(rest)
    return F.concat(prefix, rest)


# ---------------------------------------------------------------------------
# domain analysis (host extraction, registered domain, per-domain budgeting)
# ---------------------------------------------------------------------------

# two-level public suffixes we resolve to three labels ("bbc.co.uk"), a
# pinned SUBSET of the Mozilla public-suffix list: the full list is ~9k
# entries and versioned; web-corpus domain capping needs the common ccTLD
# second levels, not the long tail, and a pinned set keeps the oracle exact.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.kr", "or.kr", "re.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.za", "org.za", "web.za",
    "com.tr", "org.tr", "edu.tr", "gov.tr",
    "com.ar", "com.sg", "com.hk", "com.tw", "co.nz", "org.nz",
)


def url_host(col: Column) -> Column:
    """Lowercased host of a URL: authority minus userinfo minus port.
    Empty string when there is no ``scheme://`` prefix (relative URL)."""
    auth = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    host = F.regexp_extract(auth, r"([^@]*)$", 1)       # after the LAST '@'
    host = F.regexp_replace(host, r":[0-9]*$", "")      # strip any port
    return F.lower(host)


def registered_domain(col: Column) -> Column:
    """Registrable domain of a host or URL column ("public-suffix-lite"):
    the last two labels, or the last three when the last two are a pinned
    two-level suffix (``TWO_LEVEL_SUFFIXES``). IPv4 hosts and single-label
    hosts pass through unchanged. Accepts either a bare host or a full URL
    (anything with '://' or '/' goes through ``url_host`` first, so a
    relative URL yields the empty domain, never a path fragment)."""
    host = F.when(col.contains("://") | col.contains("/"),
                  url_host(col)).otherwise(F.lower(col))
    is_ip = host.rlike(r"^[0-9.]+$")
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    dom = F.when(is_ip | (~host.contains(".")), host).otherwise(
        F.when(
            last2.isin(*TWO_LEVEL_SUFFIXES) & (last3 != ""), last3
        ).otherwise(last2)
    )
    return dom


def domain_stats(df, url_col: str = "url", text_col: "str | None" = None):
    """Per-registered-domain corpus budget: document count, plus char count
    and mean doc length when ``text_col`` is given. ONE hash-aggregate on
    the domain key — the standard first look before domain capping. Adds
    ``share`` (fraction of all docs) via a broadcast of the scalar total."""
    dom = registered_domain(F.col(url_col)).alias("domain")
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if text_col is not None:
        aggs.append(F.sum(F.length(text_col)).cast("bigint").alias("n_chars"))
        aggs.append(F.avg(F.length(text_col)).alias("mean_chars"))
    # MEASURED DEAD END (r06): replacing this count() with an in-plan
    # total was tried four ways and every gate-compliant variant LOST —
    # broadcast 1-row agg re-runs the groupBy subtree (no exchange reuse,
    # 6 jobs / 3.14 s vs 5 / 3.07), an explicit repartition
    # materialization point still didn't reuse across the broadcast
    # boundary (6 / 3.91), localCheckpoint costs more than it saves
    # (5 / 3.65), and the only variant that won (global window over the
    # domain table, 4 / 2.94) is banned by the single-partition-window
    # straggler gate. The two-action shape stays; at scale the second
    # pass is the count of an already-projected frame.
    out = df.select(dom, *([text_col] if text_col else [])).groupBy("domain").agg(*aggs)
    total = df.count()
    return out.withColumn("share", F.col("n_docs") / F.lit(float(total)))


def domain_cap(df, url_col: str = "url", max_docs: int = 1000,
               order_col: "str | None" = None):
    """Cap documents per registered domain (the RefinedWeb/C4 anti-spam
    move: no single domain may dominate the corpus). Keeps the first
    ``max_docs`` docs per domain ordered by ``order_col`` (required for a
    deterministic result; pass a unique id). The window partitions by
    domain — no global window, scales as a hash shuffle on the domain key;
    a pathologically hot domain is bounded by the cap itself (row_number
    short-circuits nothing, but the skewed partition is one key's rows —
    salt upstream if one domain exceeds a single executor's spill budget)."""
    if order_col is None:
        raise ValueError("domain_cap needs an order_col for determinism")
    from pyspark.sql import Window

    w = Window.partitionBy(registered_domain(F.col(url_col))).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_docs)
        .drop("__rn")
    )


def filter_blocked_domains(df, blocklist, url_col: str = "url",
                           domain_col: str = "domain",
                           invert: bool = False):
    """URL blocklist filtering (the RefinedWeb/C4 pre-filter: drop every
    page whose REGISTERED domain is on a curated blocklist — adult/spam/
    malware lists run to a few million entries, far below fact-table
    scale). ``blocklist`` is a DataFrame with ``domain_col`` holding bare
    registrable domains (matched case-insensitively after the same
    public-suffix-lite normalization, so ``Sub.Bad.com`` entries and
    ``www.bad.com`` page hosts both land on ``bad.com``). ``invert=True``
    keeps ONLY the blocked rows (audit view).

    Scale shape: one ``left_anti`` (or ``left_semi``) join keyed on the
    derived domain, with the blocklist explicitly broadcast — the fact
    side never shuffles and duplicate blocklist entries cannot duplicate
    kept rows. NULL urls / empty domains never match, so they are kept by
    the anti-join (filter them separately if unwanted).
    """
    b = (blocklist
         .select(registered_domain(F.col(domain_col)).alias("__blocked"))
         .distinct())
    how = "left_semi" if invert else "left_anti"
    key = registered_domain(F.col(url_col))
    return df.join(F.broadcast(b), key == F.col("__blocked"), how)


# ---------------------------------------------------------------------------
# URL-level quality signals (RefinedWeb §3.1-style first-stage filtering)
# ---------------------------------------------------------------------------

# asset/binary extensions a text pipeline drops before ever fetching the
# body (pinned set — the oracle and filter must agree byte-for-byte)
BANNED_EXTENSIONS = (
    "jpg", "jpeg", "png", "gif", "webp", "svg", "ico", "bmp", "tiff",
    "css", "js", "woff", "woff2", "ttf", "eot",
    "mp3", "mp4", "avi", "mov", "mkv", "wav", "flac", "ogg", "webm",
    "zip", "gz", "tar", "rar", "7z", "bz2",
    "exe", "dmg", "apk", "msi", "iso", "bin",
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx",
)

# pinned rule book (documented defaults; override per call)
URL_QUALITY_RULES = {
    "max_url_len": 2048,       # no real page; crawler artifacts
    "max_digit_frac": 0.5,     # session ids / hashes dominating the URL
    "max_path_depth": 12,      # calendar/faceted-navigation traps
    "max_query_params": 8,     # tracking / infinite facet spaces
    "ban_extensions": True,    # BANNED_EXTENSIONS on the path
}


def _url_path(col: Column) -> Column:
    """Path component: after ``scheme://authority``, before '?'/'#'.
    Relative URLs (no prefix) expose their pre-query part as the path."""
    with_prefix = F.regexp_extract(
        col, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(col.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), with_prefix) \
        .otherwise(F.split(F.split(col, r"\?").getItem(0), "#").getItem(0))


def url_signals_table(df, id_col: str, url_col: str = "url"):
    """Per-URL quality signals as ONE Exchange-free projection (id, url_len,
    digit_frac, path_depth, n_query_params, subdomain_depth, extension):

    - ``url_len``          total characters
    - ``digit_frac``       decimal digits / length (0.0 for empty)
    - ``path_depth``       '/' count in the path component
    - ``n_query_params``   0 when no '?', else 1 + '&' count in the query
    - ``subdomain_depth``  '.' count in the host ("www.x.com" -> 2)
    - ``extension``        lowercased final path extension (<=5 alnum
                           chars after the last '.'), '' when none

    All Catalyst expressions with exact DuckDB twins (tests pin parity);
    floats divide as ``digits / len`` in double precision — mirror the
    same division in any oracle.
    """
    sig = url_signal_exprs(F.col(url_col))
    return df.select(F.col(id_col),
                     *[c.alias(name) for name, c in sig.items()])


def url_signal_exprs(url: Column) -> dict[str, Column]:
    """The six signal expressions as pure Columns over a url Column —
    shared by :func:`url_signals_table` (batch verdict table) and
    :func:`url_quality_keep_expr` (streaming/stateless filter form)."""
    path = _url_path(url)
    host = url_host(url)
    # fragment cut FIRST: a '?' inside '#frag?x' is fragment text, not a
    # query (RFC 3986 order) — pinned, mirrored in the oracle
    q = F.regexp_extract(F.split(url, "#").getItem(0), r"\?(.*)", 1)
    digits = F.length(F.regexp_replace(url, r"[^0-9]", ""))
    return {
        "url_len": F.length(url),
        "digit_frac": F.when(
            F.length(url) > 0,
            digits.cast("double") / F.length(url).cast("double"))
        .otherwise(F.lit(0.0)),
        "path_depth": (F.length(path)
                       - F.length(F.regexp_replace(path, "/", ""))),
        "n_query_params": F.when(q == "", F.lit(0)).otherwise(
            F.length(q) - F.length(F.regexp_replace(q, "&", "")) + F.lit(1))
        .cast("int"),
        "subdomain_depth": (F.length(host)
                            - F.length(F.regexp_replace(host, r"\.", ""))),
        "extension": F.lower(
            F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1)),
    }


def _url_checks(sig: dict, r: dict) -> dict:
    checks = {
        "ok_len": sig["url_len"] <= int(r["max_url_len"]),
        "ok_digits": sig["digit_frac"] <= float(r["max_digit_frac"]),
        "ok_depth": sig["path_depth"] <= int(r["max_path_depth"]),
        "ok_params": sig["n_query_params"] <= int(r["max_query_params"]),
    }
    if r["ban_extensions"]:
        checks["ok_extension"] = ~sig["extension"].isin(*BANNED_EXTENSIONS)
    return checks


def url_quality_keep_expr(url: Column, rules: dict | None = None) -> Column:
    """The composed URL rule book as ONE boolean Column (NULL url ->
    false) — the stateless filter form for Structured Streaming stages
    and inline gates; same pinned rules as :func:`url_quality_filter`."""
    r = dict(URL_QUALITY_RULES)
    r.update(rules or {})
    checks = _url_checks(url_signal_exprs(url), r)
    keep = None
    for c in checks.values():
        c = F.coalesce(c, F.lit(False))
        keep = c if keep is None else keep & c
    return keep


def url_quality_filter(df, id_col: str, url_col: str = "url",
                       rules: dict | None = None):
    """Composed URL-rule verdict table (id, passes boolean + one boolean
    per rule) — the crawl-frontier/ingest gate run BEFORE fetching or
    extracting a body. Rules from :data:`URL_QUALITY_RULES` (overridable
    per call); a NULL url fails every rule (pinned). One Exchange-free
    projection; compose with ``df.join(verdict.filter('passes'), id,
    'left_semi')`` to keep cardinality (ADVICE r4)."""
    r = dict(URL_QUALITY_RULES)
    r.update(rules or {})
    checks = _url_checks(url_signal_exprs(F.col(url_col)), r)
    out = df.select(
        F.col(id_col),
        *[F.coalesce(c, F.lit(False)).alias(name)
          for name, c in checks.items()])
    passes = None
    for name in checks:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes", passes)
