"""PII detection and masking for web-corpus curation.

Training-data pipelines scrub personally identifiable information before
anything else touches the text (C4 strips lines by blocklist; Dolma/RefinedWeb
mask emails, phone numbers and IP addresses with fixed tokens). This module
is the Spark-first version of that pass: every rule is a pinned regex applied
JVM-side (``regexp_extract_all`` / ``regexp_replace`` — no Python in the hot
path), so at 100 TB the scrub is a single no-shuffle projection that fuses
into whatever scan feeds it.

Dialect contract: the patterns are written for the Java-regex/RE2 common
subset — NO lookaround, NO backreferences, ``\\b`` boundaries only — so the
DuckDB oracle runs the very same strings and values match exactly.

Pinned rule set (deliberately conservative — a false positive deletes real
text, a false negative leaks one string; both documented):

- EMAIL  local@domain.tld with a letter/digit head on each side.
- IPV4   four dotted octets, each 0-255, digit-boundary guarded.
- SSN    US social-security shape ddd-dd-dddd.
- CARD   16 digits in 4-4-4-4 groups separated by '-' or ' '.
  (No Luhn check — a checksum needs per-digit aggregation, not a regex;
  the grouped shape alone is already rare in organic text.)
- PHONE  two conservative shapes: '+' international with space/dash groups
  (+cc ddd ddd dddd), or bare groups joined ONLY by '-' or '.'
  (digits-with-spaces is too close to numeric prose to mask safely).

Masking order is pinned and matters: EMAIL -> IPV4 -> SSN -> CARD -> PHONE.
IPs mask before phones because '10.123.456.789'-shaped strings parse as
dotted phone groups once the IP rule no longer owns them; emails first so
digits inside a local part never half-match a phone.

Reference parity note: the reference engine has no PII pass (its scope stops
at table ops) — this is part of the beyond-reference curation surface, same
tier as functions/quality.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# pinned patterns (Java/RE2 common subset; keep in sync with oracle SQL)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9][A-Za-z0-9._%+\-]*@[A-Za-z0-9][A-Za-z0-9.\-]*\.[A-Za-z]{2,}"
_OCT = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
IPV4_RE = rf"\b{_OCT}(\.{_OCT}){{3}}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
CARD_RE = r"\b[0-9]{4}([- ][0-9]{4}){3}\b"
# international: +cc then 2-4 groups of 2-4 digits, '-' or ' ' separated;
# bare: a 2-3 digit head then 2-3 groups of 3-4 digits, '-' or '.' only
PHONE_RE = (
    r"(\+[0-9]{1,3}([ -][0-9]{2,4}){2,4}\b"
    r"|\b[0-9]{2,3}([-.][0-9]{3,4}){2,3}\b)"
)

# (name, pattern, mask token) in the pinned masking order
PII_RULES = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("card", CARD_RE, "<CARD>"),
    ("phone", PHONE_RE, "<PHONE>"),
]
_RULES_BY_NAME = {n: (p, t) for n, p, t in PII_RULES}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII kind in ``col`` (0 for NULL text)."""
    pat, _ = _RULES_BY_NAME[kind]
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))), F.lit(0)
    ).cast("bigint")


def pii_signals_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII occurrence counts: adds ``n_<kind>`` for every rule
    plus ``has_pii``. One no-shuffle projection; counts overlap-free per
    kind but kinds are counted independently (an SSN inside a longer digit
    run may also count as a phone — the MASK path resolves overlaps by its
    pinned order, the count path reports each detector raw)."""
    out = df
    for name, _, _ in PII_RULES:
        out = out.withColumn(f"n_{name}", pii_count(F.col(text_col), name))
    flags = [F.col(f"n_{n}") > 0 for n, _, _ in PII_RULES]
    has = flags[0]
    for fl in flags[1:]:
        has = has | fl
    return out.withColumn("has_pii", has)


def pii_mask(col: Column, kinds: "list[str] | None" = None) -> Column:
    """Replace every PII occurrence with its fixed token, applying the
    pinned rule order (subset via ``kinds``, order still pinned)."""
    wanted = set(kinds) if kinds is not None else {n for n, _, _ in PII_RULES}
    unknown = wanted - {n for n, _, _ in PII_RULES}
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = col
    for name, pat, tok in PII_RULES:
        if name in wanted:
            out = F.regexp_replace(out, pat, tok)
    return out


def pii_mask_table(df: DataFrame, text_col: str = "text",
                   kinds: "list[str] | None" = None,
                   out_col: str | None = None) -> DataFrame:
    """Masked-text projection; ``out_col`` defaults to replacing
    ``text_col`` in place."""
    target = out_col or text_col
    return df.withColumn(target, pii_mask(F.col(text_col), kinds))


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level scrub audit: total occurrences and affected-doc counts
    per kind, one aggregate scan. Columns: kind, n_hits, n_docs."""
    sig = pii_signals_table(df, text_col)
    aggs = []
    for name, _, _ in PII_RULES:
        aggs.append(F.sum(f"n_{name}").alias(f"hits_{name}"))
        aggs.append(
            F.sum(F.when(F.col(f"n_{name}") > 0, 1).otherwise(0)).alias(f"docs_{name}")
        )
    wide = sig.agg(*aggs)
    pairs = ", ".join(
        f"'{n}', struct(hits_{n} AS n_hits, docs_{n} AS n_docs)" for n, _, _ in PII_RULES
    )
    return (
        wide.select(F.explode(F.expr(f"map({pairs})")).alias("kind", "s"))
        .select("kind", F.col("s.n_hits").cast("bigint").alias("n_hits"),
                F.col("s.n_docs").cast("bigint").alias("n_docs"))
    )
