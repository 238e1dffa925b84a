"""Unicode text normalization, script profiling, and blocklist filtering.

CCNet-style web pipelines normalize typography BEFORE fingerprinting so that
near-identical pages differing only in curly quotes, NBSP, or zero-width
characters collapse to one dedup key; script-composition counts are the
standard cheap precursor to language ID and a strong junk/spam signal; the
mojibake markers catch double-encoded UTF-8 (a real Common-Crawl failure
mode); the word blocklist is the C4-style "bad words" document filter.

Every function here is a pure Exchange-free JVM projection (translate /
replace / regexp on codegen'd expressions — no Python row path, no shuffle)
and is pinned to constructs with byte-identical DuckDB semantics (verified
value-exact by the normalize_text / script_profile / mojibake_stats /
badwords_filter oracle entries).

Reference scope: nail-parquet has no text-normalization surface; this module
extends the engine for web-corpus curation (SURVEY §2-LLM), composing with
quality.gopher_filter and the dedup family.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# pinned normalization alphabet (documented contract — applied in ONE
# translate pass, so later sets cannot interact with earlier ones)
# ---------------------------------------------------------------------------
#: unicode space separators mapped to ASCII space (NBSP, OGHAM, EN/EM/THIN/
#: HAIR quad family, NNBSP, MMSP, IDEOGRAPHIC)
SPACE_CHARS = ("\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006"
               "\u2007\u2008\u2009\u200a\u202f\u205f\u3000")
#: curly/low-9/prime single quotes mapped to "'"
SINGLE_QUOTES = "\u2018\u2019\u201a\u201b\u2032"
#: curly/low-9/prime double quotes mapped to '"'
DOUBLE_QUOTES = "\u201c\u201d\u201e\u201f\u2033"
#: hyphen..horizontal-bar range + minus sign mapped to '-'
DASH_CHARS = "\u2010\u2011\u2012\u2013\u2014\u2015\u2212"
#: invisibles DELETED outright: ZWSP ZWNJ ZWJ BOM/ZWNBSP SOFT-HYPHEN
INVISIBLE_CHARS = "\u200b\u200c\u200d\ufeff\u00ad"

#: C0 controls + DEL, DELETED in the same translate pass (newline and tab
#: survive; tab is folded into the space-run collapse below). Folding these
#: into translate instead of a dedicated regexp_replace saves one full
#: regex scan per row — measured +22% chain throughput at 500k docs.
CONTROL_CHARS = "".join(chr(i) for i in
                        (*range(0x00, 0x09), 0x0B, 0x0C,
                         *range(0x0E, 0x20), 0x7F))

#: printable part kept separate so the DuckDB oracle can embed it as a
#: string literal and append the controls as chr() concatenations
_TRANSLATE_SRC_PRINTABLE = (SPACE_CHARS + SINGLE_QUOTES + DOUBLE_QUOTES
                            + DASH_CHARS + INVISIBLE_CHARS)
_TRANSLATE_SRC = _TRANSLATE_SRC_PRINTABLE + CONTROL_CHARS
_TRANSLATE_DST = (" " * len(SPACE_CHARS) + "'" * len(SINGLE_QUOTES)
                  + '"' * len(DOUBLE_QUOTES) + "-" * len(DASH_CHARS))


#: pinned Latin diacritic fold (CCNet strips accents before dedup
#: fingerprinting). Covers every Latin-1 Supplement / Latin Extended-A
#: letter whose NFD decomposition is a single A-Za-z base, plus the
#: stroked/dotless forms NFD alone misses (Ø Đ Ħ Ł Ŧ Ŋ ı ſ Ð). The table
#: is a FROZEN literal (generated once, not computed at import) so the
#: contract can never drift with the runtime's unicodedata version.
#: Multi-char decompositions (Æ ß Œ Þ ŉ) are deliberately untouched —
#: translate is 1:1 and silently mapping them would corrupt words.
ACCENT_SRC = ("ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝàáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
              "ĀāĂăĄąĆćĈĉĊċČčĎďĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĨĩĪīĬĭĮįİĴĵĶķ"
              "ĹĺĻļĽľŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŨũŪūŬŭŮůŰűŲų"
              "ŴŵŶŷŸŹźŻżŽžØøĐđĦħŁłŦŧŊŋıſÐð")
ACCENT_DST = ("AAAAAACEEEEIIIINOOOOOUUUUYaaaaaaceeeeiiiinooooouuuuyy"
              "AaAaAaCcCcCcCcDdEeEeEeEeEeGgGgGgGgHhIiIiIiIiIJjKk"
              "LlLlLlNnNnNnOoOoOoRrRrRrSsSsSsSsTtTtUuUuUuUuUuUu"
              "WwYyYZzZzZzOoDdHhLlTtNnisDd")
assert len(ACCENT_SRC) == len(ACCENT_DST)


def strip_accents(col: Column) -> Column:
    """Fold Latin diacritics to their ASCII base letters — ONE pinned
    ``translate`` pass over ``ACCENT_SRC``/``ACCENT_DST`` (Exchange-free,
    NULL-safe, idempotent)."""
    return F.translate(col, ACCENT_SRC, ACCENT_DST)


def normalize_text(col: Column, lowercase: bool = False,
                   accents: bool = False) -> Column:
    """Pinned typography/whitespace normalization, in order:

    1. one ``translate`` pass: unicode spaces → ' ', curly single/double
       quotes → ``'`` / ``"``, dash family → ``-``, invisibles AND
       control chars except newline/tab (``CONTROL_CHARS``) deleted;
    2. ellipsis ``…`` → ``...`` (literal replace);
    3. collapse every run of spaces/tabs to ONE space (newlines preserved);
    4. trim outer ASCII spaces; 5. optional lowercase.

    ``accents=True`` prepends the pinned :func:`strip_accents` fold (its
    alphabet is disjoint from the typography table, so pass order cannot
    change the result — pinned anyway: accents first).

    Idempotent (re-normalizing is a no-op — pinned by test) and NULL-safe
    (NULL passes through). Exchange-free single projection.
    """
    c = strip_accents(col) if accents else col
    c = F.translate(c, _TRANSLATE_SRC, _TRANSLATE_DST)
    c = F.replace(c, F.lit("…"), F.lit("..."))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return c


# ---------------------------------------------------------------------------
# script profiling
# ---------------------------------------------------------------------------
#: script name -> (Java regex class, RE2/DuckDB regex class). Kept to the
#: majors a web crawl actually routes on; anything else lands in other_chars.
SCRIPT_CLASSES: dict[str, tuple[str, str]] = {
    "latin": (r"\p{IsLatin}", r"\p{Latin}"),
    "cyrillic": (r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    "han": (r"\p{IsHan}", r"\p{Han}"),
    "arabic": (r"\p{IsArabic}", r"\p{Arabic}"),
    "hangul": (r"\p{IsHangul}", r"\p{Hangul}"),
    "devanagari": (r"\p{IsDevanagari}", r"\p{Devanagari}"),
    "digit": ("[0-9]", "[0-9]"),
}

#: chars excluded from the nonspace denominator — pinned to the explicit
#: class [ \t\n\r] because Java's \s and RE2's \s disagree on \x0B.
_SPACE_DENOM_CLASS = r"[ \t\n\r]"


def script_counts(col: Column) -> list[Column]:
    """Per-script character counts (one ``regexp_count`` each) plus
    ``nonspace_chars`` (chars outside ``[ \\t\\n\\r]``) — raw building
    blocks; use :func:`script_profile_table` for bulk scoring."""
    out = [F.regexp_count(col, F.lit(java)).cast("long").alias(f"{name}_chars")
           for name, (java, _) in SCRIPT_CLASSES.items()]
    out.append(
        # regexp_count, not length - length(regexp_replace(.., "")): no
        # stripped copy of the document; the class matches one code point
        # per hit so the count is identical
        F.regexp_count(col, F.lit(_SPACE_DENOM_CLASS))
        .cast("long").alias("space_chars"))
    return out


def script_profile_table(df: DataFrame, id_col: str, text_col: str,
                         dominant_min_frac: float = 0.5,
                         engine: str = "sql") -> DataFrame:
    """(id, <script>_chars..., nonspace_chars, other_chars, dominant_script)
    via a STAGED projection (stage 1 counts once per class, stage 2 argmax
    over plain attributes — the lang_id_table lesson: Catalyst does not CSE
    multi-referenced subexpressions, staged selects make sharing structural).

    ``dominant_script`` is the argmax script by count, first-wins ties in
    SCRIPT_CLASSES order, ``'und'`` when the best script covers fewer than
    ``dominant_min_frac`` of nonspace chars (mixed-script spam shows up as
    'und' rather than a confident label). NULL text yields NULL counts and
    'und'. Zero shuffles.

    ``engine='arrow'`` swaps the count stage for the single-searchsorted
    codepoint kernel (functions/normalize_arrow — one decode pass instead
    of eight Java-regex scans, count-identical by test); the dominance
    projection below is shared, so labels cannot diverge.
    """
    names = list(SCRIPT_CLASSES)
    if engine == "arrow":
        from nail_parquet_spark.functions.normalize_arrow import (
            script_counts_arrow,
        )

        s1 = script_counts_arrow(df, id_col, text_col)
    elif engine == "sql":
        s1 = df.select(
            F.col(id_col),
            F.length(F.col(text_col)).cast("long").alias("__len"),
            *script_counts(F.col(text_col)))
    else:
        raise ValueError(f"engine must be 'sql' or 'arrow', got {engine!r}")
    nonspace = (F.col("__len") - F.col("space_chars")).cast("long")
    s2 = s1.select(
        F.col(id_col),
        *[F.col(f"{n}_chars") for n in names],
        nonspace.alias("nonspace_chars"),
        (nonspace - sum(F.col(f"{n}_chars") for n in names))
        .cast("long").alias("other_chars"))
    best, best_cnt = F.lit("und"), F.lit(0).cast("long")
    for n in names:
        c = F.col(f"{n}_chars")
        cond = c > best_cnt
        best = F.when(cond, F.lit(n)).otherwise(best)
        best_cnt = F.when(cond, c).otherwise(best_cnt)
    dominant = F.when(
        best_cnt.cast("double")
        >= F.lit(dominant_min_frac) * F.col("nonspace_chars"), best) \
        .otherwise(F.lit("und"))
    dominant = F.when(F.col("nonspace_chars") > 0, dominant) \
        .otherwise(F.lit("und"))
    return s2.select(
        F.col(id_col),
        *[F.col(f"{n}_chars") for n in names],
        "nonspace_chars", "other_chars",
        F.coalesce(dominant, F.lit("und")).alias("dominant_script"))


# ---------------------------------------------------------------------------
# mojibake detection
# ---------------------------------------------------------------------------
#: pinned printable UTF-8-read-as-Latin-1 digraph markers (é è á ó ö ü ñ as
#: mojibake, plus the ’ “ – — punctuation family). Literal substrings —
#: counted with length arithmetic, portable to any SQL engine.
MOJIBAKE_MARKERS: tuple[str, ...] = (
    "Ã©", "Ã¨", "Ã¡", "Ã³",
    "Ã¶", "Ã¼", "Ã±",
    "â€™", "â€œ",
    "â€“", "â€”",
)
REPLACEMENT_CHAR = "�"


def _occurrence_count(col: Column, needle: str) -> Column:
    """(length(x) - length(replace(x, n, ''))) / length(n) — exact substring
    occurrence count without regex (text._count_occurrences twin, kept local
    so the module is dependency-free)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(needle))))
            / F.lit(len(needle))).cast("long")


def mojibake_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, replacement_chars, mojibake_hits, suspect) — U+FFFD count,
    summed pinned-marker occurrences, and the boolean junk verdict
    (either count > 0). NULL text → 0 counts, suspect=false (pinned).
    One Exchange-free projection."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    repl = _occurrence_count(c, REPLACEMENT_CHAR)
    hits: Column = F.lit(0).cast("long")
    for m in MOJIBAKE_MARKERS:
        hits = hits + _occurrence_count(c, m)
    return df.select(
        F.col(id_col),
        repl.alias("replacement_chars"),
        hits.alias("mojibake_hits"),
        ((repl > 0) | (hits > 0)).alias("suspect"))


# ---------------------------------------------------------------------------
# word blocklist (C4-style "bad words" document filter)
# ---------------------------------------------------------------------------
_WORD_OK = re.compile(r"^[A-Za-z0-9'&-]+$")


def _badwords_pattern(words: list[str]) -> str:
    """Case-blind word-boundary alternation over the blocklist. Words are
    validated to a portable token alphabet (letters/digits/'&-) so the
    escaped pattern means the same thing in Java regex and RE2."""
    if not words:
        raise ValueError("badwords: empty word list")
    bad = [w for w in words if not _WORD_OK.match(w)]
    if bad:
        raise ValueError(f"badwords: unsupported characters in {bad[:3]!r}; "
                         "allowed: letters, digits, ' & -")
    return r"\b(?:" + "|".join(re.escape(w.lower()) for w in words) + r")\b"


def badwords_flag(col: Column, words: list[str]) -> Column:
    """True when any blocklisted word appears as a whole word
    (case-insensitive via lower()). NULL text → false (pinned)."""
    return F.coalesce(
        F.regexp_like(F.lower(col), F.lit(_badwords_pattern(words))),
        F.lit(False))


def badwords_filter(df: DataFrame, id_col: str, text_col: str,
                    words: list[str], remove: bool = False) -> DataFrame:
    """Verdict table (id, has_badword) or, with ``remove=True``, the
    surviving input rows (filter on the projection — no join, cardinality
    preserved under duplicate ids). Exchange-free either way."""
    flag = badwords_flag(F.col(text_col), words)
    if remove:
        return df.filter(~flag)
    return df.select(F.col(id_col), flag.alias("has_badword"))
