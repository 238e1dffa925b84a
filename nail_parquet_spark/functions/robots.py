"""robots.txt parsing and URL filtering (RFC 9309 subset, pinned).

Crawl corpora ship robots.txt bodies alongside pages (Common Crawl
publishes a robots capture per segment); respecting them — or auditing
which pages a given agent may fetch — is a standard curation pass. The
reference has no robots support; this module is beyond-reference,
crawl-native surface.

Pinned parsing contract (documented subset of RFC 9309):

- lines split on ``\\n``; ``#`` comments stripped first; whitespace
  trimmed; blank lines ignored (they do NOT end a group, RFC 9309 §2.2).
- directives are case-insensitive; recognized: ``user-agent``, ``allow``,
  ``disallow``. Any other non-blank directive (``sitemap``,
  ``crawl-delay``, …) is ignored for rules but DOES end a user-agent
  header run, like a rule line would.
- a group = one or more consecutive ``user-agent`` lines followed by its
  rules; a ``user-agent`` line after a non-UA non-blank line starts a new
  group.
- agent match is an exact case-insensitive token match, or ``*``. If any
  group names the agent specifically, only those groups apply (RFC 9309
  §2.2.1), else the ``*`` groups.
- rule paths must start with ``/``; empty paths and paths containing the
  ``*``/``$`` wildcards are dropped (wildcards are a documented
  out-of-scope extension; percent-encoding is matched byte-literally).
- matching is longest-prefix-wins over the URL path (query excluded);
  on a length tie ``allow`` wins; a URL whose host has no matching rule
  (or no robots.txt at all) is allowed.

Everything is Catalyst expressions — the parser is a per-row
``aggregate`` fold over the line array (zero shuffle, zero Python), and
the filter is ONE host-keyed join against per-host rule sets followed by
a per-row fold. At crawl scale the rules table is millions of hosts
(small next to the page table): leave ``broadcast_rules=False`` for a
shuffle join, or set it when the corpus is a curated subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nail_parquet_spark.functions.urls import url_host

_UA_RE = r"(?i)^user-agent\s*:\s*(.*)$"
_RULE_RE = r"(?i)^(dis)?allow\s*:\s*(.*)$"


def url_path(col: Column) -> Column:
    """Path component of a URL (query/fragment excluded), ``/`` when the
    URL has none — the string robots rules match against."""
    p = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def _parse_rules_expr(body: Column, agent: str) -> Column:
    """array<struct<prefix,allow>> of the rules that apply to ``agent``,
    per the pinned contract — one fold over the body's lines."""
    agent_lc = agent.strip().lower()
    rule_t = "array<struct<prefix:string,allow:boolean>>"
    init = F.struct(
        F.lit(False).alias("ua"),            # inside a user-agent header run
        F.lit(False).alias("st"),            # current group names '*'
        F.lit(False).alias("sp"),            # current group names the agent
        F.array().cast(rule_t).alias("srul"),
        F.array().cast(rule_t).alias("prul"),
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*", ""))
        ua_name = F.lower(F.trim(F.regexp_extract(line, _UA_RE, 1)))
        is_ua = line.rlike(_UA_RE)
        is_rule = line.rlike(_RULE_RE)
        is_allow = ~F.regexp_extract(line, _RULE_RE, 1).rlike("(?i)^dis$")
        path = F.trim(F.regexp_extract(line, _RULE_RE, 2))
        ok_path = path.startswith("/") & ~path.contains("*") & ~path.contains("$")
        blank = line == ""
        # header-run bookkeeping: a UA line extends/starts the run, a blank
        # line leaves it open, any other non-blank line closes it
        new_ua = F.when(is_ua, F.lit(True)).when(blank, acc.ua).otherwise(F.lit(False))
        new_st = F.when(
            is_ua, (acc.ua & acc.st) | (ua_name == "*")).otherwise(acc.st)
        new_sp = F.when(
            is_ua, (acc.ua & acc.sp) | (ua_name == agent_lc)).otherwise(acc.sp)
        emit = is_rule & ok_path
        rule = F.array(F.struct(path.alias("prefix"), is_allow.alias("allow")))
        return F.struct(
            new_ua.alias("ua"), new_st.alias("st"), new_sp.alias("sp"),
            F.when(emit & acc.st, F.concat(acc.srul, rule))
             .otherwise(acc.srul).alias("srul"),
            F.when(emit & acc.sp, F.concat(acc.prul, rule))
             .otherwise(acc.prul).alias("prul"),
        )

    # specific-agent groups override the '*' groups when any exist
    return F.aggregate(
        F.split(F.coalesce(body, F.lit("")), "\n"), init, step,
        lambda acc: F.when(F.size(acc.prul) > 0, acc.prul).otherwise(acc.srul),
    )


def parse_robots(df: DataFrame, host_col: str = "host",
                 body_col: str = "robots_txt", agent: str = "*") -> DataFrame:
    """Parse a robots corpus into a rules table: one row per applicable
    rule, in file order — (host, prefix, allow). Hosts whose robots.txt
    yields no applicable rule produce no rows (absence = allow-all,
    exactly how ``robots_verdict`` treats a missing host)."""
    return (df.select(F.col(host_col).alias("host"),
                      _parse_rules_expr(F.col(body_col), agent).alias("__r"))
            .select("host", F.explode("__r").alias("__e"))
            .select("host", F.col("__e.prefix").alias("prefix"),
                    F.col("__e.allow").alias("allow")))


def robots_verdict(df: DataFrame, rules: DataFrame, url_col: str = "url",
                   broadcast_rules: bool = False) -> DataFrame:
    """Annotate ``df`` with boolean ``robots_allowed``: longest-prefix rule
    for the URL's (host, path) wins, allow wins length ties, no match /
    unknown host = allowed.

    ONE join (host-keyed; rules pre-collapsed to one array per host) and a
    per-row fold — the page table is never re-shuffled or aggregated."""
    for c in ("host", "prefix", "allow"):
        if c not in rules.columns:
            raise ValueError(
                f"rules must carry (host, prefix, allow) — got {rules.columns}")
    sets = (rules.groupBy("host")
            .agg(F.collect_list(F.struct("prefix", "allow")).alias("__rules"))
            .withColumnRenamed("host", "__rhost"))
    if broadcast_rules:
        sets = F.broadcast(sets)
    u = F.col(url_col)
    out = (df.withColumn("__host", url_host(u))
             .withColumn("__path", url_path(u))
             .join(sets, F.col("__host") == F.col("__rhost"), "left")
             .drop("__rhost"))
    init = F.struct(F.lit(-1).cast("int").alias("l"),
                    F.lit(True).alias("a"))
    best = F.aggregate(
        F.coalesce(F.col("__rules"),
                   F.array().cast("array<struct<prefix:string,allow:boolean>>")),
        init,
        lambda acc, r: F.when(
            F.col("__path").startswith(r.prefix)
            & ((F.length(r.prefix).cast("int") > acc.l)
               | ((F.length(r.prefix).cast("int") == acc.l) & r.allow)),
            F.struct(F.length(r.prefix).cast("int").alias("l"),
                     r.allow.alias("a")),
        ).otherwise(acc),
    )
    return (out.withColumn("robots_allowed", best.getField("a"))
               .drop("__host", "__path", "__rules"))


def robots_filter(df: DataFrame, rules: DataFrame, url_col: str = "url",
                  broadcast_rules: bool = False) -> DataFrame:
    """Keep only the rows robots.txt allows (see ``robots_verdict``)."""
    return (robots_verdict(df, rules, url_col, broadcast_rules)
            .filter(F.col("robots_allowed")).drop("robots_allowed"))


_DELAY_RE = r"(?i)^crawl-delay\s*:\s*([0-9]+(?:\.[0-9]+)?)\s*$"
_SITEMAP_RE = r"(?i)^sitemap\s*:\s*(\S+)\s*$"


def robots_directives(df: DataFrame, host_col: str = "host",
                      body_col: str = "robots_txt",
                      agent: str = "*") -> DataFrame:
    """Crawl-politeness directives per host: ``crawl_delay`` (seconds, the
    LAST occurrence in the groups that apply to ``agent`` wins,
    specific-agent groups beating ``*`` — same group semantics as
    ``parse_robots``; NULL when none declared or non-numeric) and
    ``sitemaps`` (every ``Sitemap:`` URL in file order — group-INDEPENDENT
    per RFC 9309 §2.3, so they collect regardless of user-agent). One row
    per input host, Exchange-free."""
    agent_lc = agent.strip().lower()
    lines = F.split(F.coalesce(F.col(body_col), F.lit("")), "\n")
    init = F.struct(
        F.lit(False).alias("ua"), F.lit(False).alias("st"),
        F.lit(False).alias("sp"),
        F.lit(None).cast("double").alias("sd"),
        F.lit(None).cast("double").alias("pd"),
        F.lit(False).alias("anyp"),   # some group named the agent
    )

    def step(acc, raw):
        line = F.trim(F.regexp_replace(raw, "#.*", ""))
        ua_name = F.lower(F.trim(F.regexp_extract(line, _UA_RE, 1)))
        is_ua = line.rlike(_UA_RE)
        blank = line == ""
        new_ua = F.when(is_ua, F.lit(True)).when(blank, acc.ua).otherwise(F.lit(False))
        new_st = F.when(is_ua, (acc.ua & acc.st) | (ua_name == "*")).otherwise(acc.st)
        new_sp = F.when(is_ua, (acc.ua & acc.sp) | (ua_name == agent_lc)).otherwise(acc.sp)
        d = F.regexp_extract(line, _DELAY_RE, 1)
        has_d = d != ""
        dv = d.cast("double")
        return F.struct(
            new_ua.alias("ua"), new_st.alias("st"), new_sp.alias("sp"),
            F.when(has_d & acc.st, dv).otherwise(acc.sd).alias("sd"),
            F.when(has_d & acc.sp, dv).otherwise(acc.pd).alias("pd"),
            (acc.anyp | (is_ua & (ua_name == agent_lc))).alias("anyp"),
        )

    delay = F.aggregate(
        lines, init, step,
        # specific groups beat '*' whenever the agent is named at all
        lambda acc: F.when(acc.anyp, acc.pd).otherwise(acc.sd))
    trimmed = F.transform(lines, lambda x: F.trim(F.regexp_replace(x, "#.*", "")))
    sitemaps = F.transform(
        F.filter(trimmed, lambda x: x.rlike(_SITEMAP_RE)),
        lambda x: F.regexp_extract(x, _SITEMAP_RE, 1))
    return df.select(F.col(host_col).alias("host"),
                     delay.alias("crawl_delay"),
                     sitemaps.alias("sitemaps"))


def robots_corpus(spark, path: str) -> DataFrame:
    """Load a robots corpus from ``path``, whatever its shape: a raw WARC
    robots segment becomes (host, robots_txt) via
    ``robots_corpus_from_warc``; any other readable format is expected to
    carry those columns already."""
    from nail_parquet_spark.sources.io import _fmt_of, read_data

    if _fmt_of(path, None) in ("warc", "wet"):
        return robots_corpus_from_warc(spark, path)
    return read_data(spark, path)


def robots_corpus_from_warc(spark, path: str) -> DataFrame:
    """(host, robots_txt) corpus from a WARC directory of robots.txt
    captures (Common Crawl publishes one robots segment per crawl):
    response records whose URL path is exactly ``/robots.txt``, body
    lossy-decoded, LATEST capture per host wins (hosts get re-fetched
    within a segment). Feed straight into ``parse_robots``."""
    from nail_parquet_spark.functions.html import html_to_string
    from nail_parquet_spark.sources.warc import read_warc

    recs = read_warc(spark, path)
    recs = recs.filter(url_path(F.col("url")) == "/robots.txt")
    recs = recs.select(url_host(F.col("url")).alias("host"),
                       F.col("warc_ts"),
                       html_to_string(F.col("html")).alias("robots_txt"))
    # latest capture per host: max(struct(ts, body)) needs no window
    return (recs.groupBy("host")
            .agg(F.max(F.struct("warc_ts", "robots_txt")).alias("__m"))
            .select("host", F.col("__m.robots_txt").alias("robots_txt")))
