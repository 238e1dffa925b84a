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
