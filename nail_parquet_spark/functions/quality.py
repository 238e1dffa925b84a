"""Gopher/C4-style document-quality filters for web-scale training corpora.

The reference engine (nail-parquet) stops at generic per-column statistics;
a 100-TB web-text pipeline additionally needs the published heuristic
quality rules (Gopher, Rae et al. 2021 §A1.1; C4, Raffel et al. 2020 §2.2)
as first-class relational operators. Everything here is built from JVM-side
``pyspark.sql.functions`` (whole-stage codegen, no Python in the hot path)
and every signal has an exact ANSI-SQL twin so the DuckDB oracle verifies
it value-for-value.

Scale notes:
- ``gopher_signals`` is a pure per-row projection — no shuffle at all.
- ``repetition_stats`` / ``top_ngram_char_frac`` explode to per-(doc, line)
  or per-(doc, ngram) rows and aggregate back BY doc id — the shuffle key is
  the doc id, so cardinality is bounded by the corpus row count and
  partial aggregation combines map-side. No global windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nail_parquet_spark.functions.text import token_count

# Gopher rule: a document must contain >= 2 of these stopwords.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

BULLET_PREFIXES = ["- ", "* ", "•", "●"]  # -, *, bullet, black circle
ELLIPSIS_SUFFIXES = ["...", "…"]


def _symbol_count(col: Column) -> Column:
    """'#' + '...' + '…' occurrences in ONE regex pass. The alternation's
    left-to-right non-overlapping scan counts exactly what three separate
    replace-based passes count (the needles share no characters except
    dots, and '\\.{3}' consumes greedily like replace) — property-checked
    against the per-needle model over the full symbol alphabet."""
    return F.regexp_count(col, F.lit(r"#|\.{3}|…")).cast("long")


def _words(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def _lines(col: Column) -> Column:
    """Non-blank lines (trimmed); '' splits to [''] which is filtered out."""
    return F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))


def _starts_any(l: Column) -> Column:
    c = F.lit(False)
    for p in BULLET_PREFIXES:
        c = c | l.startswith(p)
    return c


def _ends_any(l: Column, suffixes: list[str]) -> Column:
    c = F.lit(False)
    for s in suffixes:
        c = c | l.endswith(s)
    return c


SIGNAL_COLUMNS = ["n_words", "mean_word_len", "frac_words_alpha",
                  "n_stop_hits", "symbol_word_ratio", "frac_lines_bullet",
                  "frac_lines_ellipsis", "frac_lines_end_punct"]


def gopher_signals(col: Column) -> list[Column]:
    """The per-document Gopher quality signals as self-contained column
    expressions (usable in any single select, e.g. over a stream).

    Returns columns: n_words, mean_word_len, frac_words_alpha,
    n_stop_hits, symbol_word_ratio, frac_lines_bullet, frac_lines_ellipsis,
    frac_lines_end_punct (the C4 terminal-punctuation signal).

    PERF: because these are standalone expressions, Catalyst re-evaluates
    the embedded word-split inside every ratio that references n_words —
    for a bulk scoring pass use ``gopher_signals_table`` (staged
    projection, each expensive subexpression evaluated once; ~2.8x faster
    at GB scale, bit-identical output — pinned by
    test_gopher_signals_table_matches_columns).

    Reference scope check: nail-parquet's closest surface is
    `src/commands/stats.rs` (generic numeric/char stats) — these
    web-text-specific rules are beyond-reference, per the pipeline brief.
    """
    # one lowered split serves n_words AND the stopword intersect (token
    # counts and lengths are case-invariant); char totals and alpha-token
    # counts come from single-pass regexes instead of per-word lambdas
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n_words = F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(words)).cast("long")
    lines = _lines(col)
    n_lines = F.size(lines)

    # length - regexp_count, NOT length(regexp_replace(.., "")): the
    # replace form allocates a stripped copy of every document just to
    # take its length; \s matches exactly one code point so the counts
    # are identical (pinned by the table/columns identity test)
    word_chars = F.length(col) - F.regexp_count(col, F.lit(r"\s"))
    alpha_words = F.regexp_count(col, F.lit(r"\S*[A-Za-z]\S*"))
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    symbols = _symbol_count(col)

    bullet_lines = F.size(F.filter(lines, _starts_any))
    ellipsis_lines = F.size(F.filter(lines, lambda l: _ends_any(l, ELLIPSIS_SUFFIXES)))
    punct_lines = F.size(
        F.filter(lines, lambda l: _ends_any(l, [".", "!", "?", '"']))
    )

    return [
        n_words.alias("n_words"),
        _frac(word_chars, n_words).alias("mean_word_len"),
        _frac(alpha_words, n_words).alias("frac_words_alpha"),
        stop_hits.cast("long").alias("n_stop_hits"),
        _frac(symbols, n_words).alias("symbol_word_ratio"),
        _frac(bullet_lines, n_lines).alias("frac_lines_bullet"),
        _frac(ellipsis_lines, n_lines).alias("frac_lines_ellipsis"),
        _frac(punct_lines, n_lines).alias("frac_lines_end_punct"),
    ]


def gopher_signals_table(df: DataFrame, id_col: str, text_col: str,
                         extra: dict[str, Column] | None = None) -> DataFrame:
    """(id, <signals>) via a STAGED projection: stage 1 materializes the
    split/lines arrays and single-pass regex counts as named columns, stage
    2 derives the ratios from those attributes. Multi-referenced expensive
    expressions are plain attribute reads in stage 2, and CollapseProject
    keeps the stages separate exactly because they are multi-referenced and
    non-cheap — so each split/regex runs ONCE per row instead of once per
    ratio. Still zero shuffles; output is bit-identical to
    ``df.select(id, *gopher_signals(text))``.

    ``extra`` adds stage-2 columns computed from the stage-1 attributes
    ``__words``/``__lines``/``__text`` (used by gopher_filter for the
    dup-line fraction).
    """
    col = F.col(text_col)
    stage1 = df.select(
        F.col(id_col),
        col.alias("__text"),
        F.split(F.lower(F.trim(col)), r"\s+").alias("__words"),
        _lines(col).alias("__lines"),
        (F.length(col) - F.regexp_count(col, F.lit(r"\s"))).alias("__word_chars"),
        F.regexp_count(col, F.lit(r"\S*[A-Za-z]\S*")).alias("__alpha_words"),
        (F.trim(col) == "").alias("__blank"),
    )
    t = F.col("__text")
    words, lines = F.col("__words"), F.col("__lines")
    stage2 = stage1.select(
        F.col(id_col),
        F.when(F.col("__blank"), F.lit(0)).otherwise(F.size(words)).cast("long").alias("n_words"),
        F.col("__word_chars").alias("__wc"),
        F.col("__alpha_words").alias("__aw"),
        F.size(F.array_intersect(
            words, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
        ).cast("long").alias("n_stop_hits"),
        _symbol_count(t).alias("__sym"),
        F.size(lines).alias("__nl"),
        F.size(F.filter(lines, _starts_any)).alias("__bullet"),
        F.size(F.filter(lines, lambda l: _ends_any(l, ELLIPSIS_SUFFIXES))).alias("__ell"),
        F.size(F.filter(lines, lambda l: _ends_any(l, [".", "!", "?", '"']))).alias("__punct"),
        *[(expr if isinstance(expr, Column) else F.lit(expr)).alias(name)
          for name, expr in (extra or {}).items()],
    )
    nw, nl = F.col("n_words"), F.col("__nl")
    return stage2.select(
        F.col(id_col),
        nw,
        _frac(F.col("__wc"), nw).alias("mean_word_len"),
        _frac(F.col("__aw"), nw).alias("frac_words_alpha"),
        F.col("n_stop_hits"),
        _frac(F.col("__sym"), nw).alias("symbol_word_ratio"),
        _frac(F.col("__bullet"), nl).alias("frac_lines_bullet"),
        _frac(F.col("__ell"), nl).alias("frac_lines_ellipsis"),
        _frac(F.col("__punct"), nl).alias("frac_lines_end_punct"),
        *[F.col(name) for name in (extra or {})],
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate-line repetition signals per document (Gopher §A1.1).

    Returns (id, n_lines, dup_line_frac, dup_line_char_frac) where
    - dup_line_frac       = 1 - distinct_lines / n_lines
    - dup_line_char_frac  = chars on lines occurring > once / total line chars
    over non-blank trimmed lines. Documents with no non-blank lines get 0.0.

    Shape: explode lines -> groupBy (doc, line) -> groupBy doc. Both
    aggregations partial-combine map-side and shuffle only on the doc id —
    bounded at any corpus size; no windows, no driver pull.

    Precondition (all id-keyed operators in this module): ``id_col`` must
    uniquely identify documents — rows sharing an id are merged into one
    logical document by the groupBy (ADVICE r4).
    """
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(_lines(F.col(text_col))).alias("line"),
    )
    per_line = (
        lines.groupBy("__doc", "line")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("__doc", "cnt", F.length("line").alias("clen"))
    )
    out = per_line.groupBy("__doc").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("cnt"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.col("clen")).otherwise(0))
            / F.sum(F.col("cnt") * F.col("clen")),
            6,
        ).alias("dup_line_char_frac"),
    )
    blank = (
        df.select(F.col(id_col).alias("__doc"))
        .join(out.select("__doc"), "__doc", "left_anti")
        .select(
            "__doc",
            F.lit(0).cast("long").alias("n_lines"),
            F.lit(0.0).alias("dup_line_frac"),
            F.lit(0.0).alias("dup_line_char_frac"),
        )
    )
    return out.unionByName(blank).withColumnRenamed("__doc", id_col)


def top_ngram_char_frac(df: DataFrame, id_col: str, text_col: str,
                        n: int = 2) -> DataFrame:
    """Fraction of document characters covered by its most frequent word
    n-gram (Gopher's top-2/3/4-gram repetition signal).

    Coverage is count * length(ngram text) / length(document) with the
    n-gram text joined by single spaces — a deterministic, SQL-portable
    definition (the paper does not pin whitespace handling). Ties break on
    lexicographically-smallest n-gram. Documents with fewer than n words
    get frac 0.0 and a NULL ngram.

    Shape: per-row n-gram array (no self-join), explode, count by
    (doc, ngram), keyed max-struct aggregation — shuffles only on doc id.
    Precondition: ``id_col`` unique per document (see repetition_stats).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    # the word array is STAGED through its own projection (word_shingles
    # rule): referenced inside the per-gram lambda, an inlined split would
    # re-evaluate once per gram element — O(words²) per row
    staged = df.select(
        F.col(id_col).alias("__doc"),
        F.length(F.col(text_col)).alias("__chars"),
        _words(F.col(text_col)).alias("__tngf_w"),
    )
    words = F.col("__tngf_w")
    # sequence(1, 0) DESCENDS in Spark, so docs with < n words must short-
    # circuit to an empty gram array (their rows re-enter via the anti-join).
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = staged.select(
        "__doc", "__chars", F.explode(grams).alias("ngram"),
    ).filter(F.col("ngram") != "")
    counted = ex.groupBy("__doc", "__chars", "ngram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # winner = max count, then lexicographically-smallest ngram. Two keyed
    # aggregations + a same-key join (AQE collapses the exchange) — portable
    # to SQL, no window, deterministic.
    maxc = counted.groupBy("__doc", "__chars").agg(F.max("cnt").alias("maxc"))
    winner = (
        counted.join(maxc, ["__doc", "__chars"])
        .filter(F.col("cnt") == F.col("maxc"))
        .groupBy("__doc", "__chars", "maxc")
        .agg(F.min("ngram").alias("top_ngram"))
    )
    scored = winner.select(
        F.col("__doc"),
        F.col("top_ngram"),
        F.col("maxc").cast("long").alias("cnt"),
        F.when(
            F.col("__chars") > 0,
            F.round(F.col("maxc") * F.length("top_ngram") / F.col("__chars"), 6),
        ).otherwise(0.0).alias("char_frac"),
    )
    short = (
        df.select(F.col(id_col).alias("__doc"))
        .join(scored.select("__doc"), "__doc", "left_anti")
        .select(
            "__doc",
            F.lit(None).cast("string").alias("top_ngram"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(0.0).alias("char_frac"),
        )
    )
    return scored.unionByName(short).withColumnRenamed("__doc", id_col)


def c4_clean_text(col: Column, min_words: int = 3) -> Column:
    """C4-style line-level cleaning as one no-shuffle projection: keep only
    lines that (a) have >= min_words whitespace words, (b) end in terminal
    punctuation (. ! ? "), and (c) contain neither 'javascript' nor
    'lorem ipsum' (case-insensitive) nor a '{'. Surviving lines re-join
    with newlines; a fully-cleaned document becomes the empty string
    (compose with gopher_filter to drop it)."""

    def _keep(l: Column) -> Column:
        words = F.size(F.split(l, r"\s+"))
        ends = l.endswith(".") | l.endswith("!") | l.endswith("?") | l.endswith('"')
        low = F.lower(l)
        banned = (
            low.contains("javascript") | low.contains("lorem ipsum")
            | low.contains("{")
        )
        return (words >= min_words) & ends & ~banned

    return F.array_join(F.filter(_lines(col), _keep), "\n")


def _dedup_units_global(df: DataFrame, id_col: str, text_col: str,
                        units: Column, sep: str) -> DataFrame:
    """Shared engine for corpus-global unit dedup (lines, paragraphs):
    every distinct unit keeps exactly ONE occurrence — smallest (doc id,
    position) — and docs are rebuilt joining survivors with ``sep``."""
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(units).alias("pos", "line"),
    ).withColumn("__h", F.md5(F.encode(F.col("line"), "UTF-8")))
    # The winner element carries its unit text THROUGH the aggregation:
    # (__doc, pos) is unique per exploded row, so min over (__doc, pos,
    # line) structs elects exactly the same smallest-(doc, pos) occurrence
    # as min over (__doc, pos) — the text field never tie-breaks. This
    # removes the join back to `lines` (whose probe side re-evaluated the
    # entire corpus explode) and one hash-keyed exchange: the explode now
    # runs once and the survivors fall straight out of the aggregate.
    kept = (
        lines.groupBy("__h")
        .agg(F.min(F.struct("__doc", "pos", "line")).alias("__w"))
        .select(F.col("__w.__doc").alias("__doc"),
                F.col("__w.pos").alias("pos"),
                F.col("__w.line").alias("line"))
    )
    return _rebuild_docs(df, id_col, text_col, kept, sep)


def _rebuild_docs(df: DataFrame, id_col: str, text_col: str,
                  kept: DataFrame, sep: str) -> DataFrame:
    """Rebuild one row per input document from surviving ``(__doc, pos,
    line)`` units, joined with ``sep`` in position order; documents whose
    units were ALL removed (or that had none) come back as ``''`` via the
    left-join coalesce. One doc-keyed shuffle.

    Shape note: one LEFT join from the doc-id spine, not union(rebuilt,
    anti-join) — the anti-join's build side re-evaluated the whole
    ``kept`` subtree (a second corpus explode, merely column-pruned); the
    left join consumes the rebuilt aggregate exactly once and fills the
    all-units-removed docs with '' via coalesce (array_join never yields
    NULL, so a NULL right side IS the anti-join membership test)."""
    rebuilt = kept.groupBy("__doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        df.select(F.col(id_col).alias("__doc"))
        .join(rebuilt, "__doc", "left")
        .select("__doc", F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
        .withColumnRenamed("__doc", id_col)
    )


def dedup_lines_global(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-global line dedup (C4 §2.2's three-sentence-span rule, pinned
    to lines): every distinct non-blank trimmed line keeps exactly ONE
    occurrence — the one with the smallest (doc id, line position) — and
    every other occurrence is dropped; documents are rebuilt with their
    surviving lines in order (possibly the empty string).

    Scale shape: posexplode -> one groupBy on the 64-bit-keyed line hash
    (md5 text keeps the oracle portable) whose min-struct winner carries
    its line text out of the aggregate (no join back — the corpus explodes
    once), one groupBy on doc id to rebuild — every shuffle is keyed on
    line hash or doc id, partial-aggregating map-side; no windows, no
    driver state. Text is normalized to its trimmed non-blank lines (same rule as
    every operator in this module); docs left with no surviving lines come
    back as '' via the anti-join branch.
    Precondition: ``id_col`` unique per document (see repetition_stats).
    """
    return _dedup_units_global(df, id_col, text_col,
                               _lines(F.col(text_col)), "\n")


def remove_boilerplate_lines(df: DataFrame, id_col: str, text_col: str,
                             group_col: str, max_doc_frac: float = 0.5,
                             min_docs: int = 2,
                             min_line_docs: int = 2) -> DataFrame:
    """Within-group boilerplate line removal — the site-level cleaner every
    web pipeline runs between extraction and corpus-global dedup: nav
    bars, cookie banners, and footers repeat on most pages OF THE SAME
    SITE, so a trimmed non-blank line is boilerplate within a group
    (``group_col`` — typically ``registered_domain(url)``) when it occurs
    in ``>= max_doc_frac`` of the group's documents AND in at least
    ``min_line_docs`` distinct documents (a line seen in one document is
    repetition-free by definition, whatever its ratio — this floor keeps
    small groups from losing their unique prose), provided the group has
    at least ``min_docs`` documents. EVERY occurrence of a boilerplate line
    is dropped (unlike :func:`dedup_lines_global`, which keeps one
    winner — boilerplate has no legitimate first copy), and documents are
    rebuilt from their surviving lines in order (possibly ``''``).

    Scale shape: posexplode → one hash-aggregate on ``(group, line
    hash)`` with per-doc distinct counting for document frequency, one
    tiny one-row-per-group doc-count aggregate joined group-keyed, one
    ``left_anti`` join back on ``(group, hash)`` (the boilerplate set is
    small — only lines over the frequency bar — so AQE broadcasts it),
    and the shared one-doc-keyed-shuffle rebuild. No windows, no driver
    state; a hot domain's lines spread over its (group, hash) keys, so
    the only true hot key is a single line repeated across one domain's
    pages — exactly the thing being counted, and counting is a partial
    map-side agg.

    Documents whose ``group_col`` is NULL are never filtered (NULL
    never equi-joins to the boilerplate set); they are returned rebuilt
    from all their lines. Precondition: ``id_col`` unique per document
    (see repetition_stats). The document-frequency ratio is compared as
    ``df / n >= max_doc_frac`` in double precision — mirror the same
    division in any oracle.
    """
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.col(group_col).alias("__grp"),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    ).withColumn("__h", F.md5(F.encode(F.col("line"), "UTF-8")))
    ndocs = df.groupBy(F.col(group_col).alias("__grp")).agg(
        F.count_distinct(F.col(id_col)).alias("__n"))
    freq = lines.groupBy("__grp", "__h").agg(
        F.count_distinct("__doc").alias("__df"))
    boiler = (
        freq.join(ndocs, "__grp")
        .filter((F.col("__n") >= F.lit(int(min_docs)))
                & (F.col("__df") >= F.lit(int(min_line_docs)))
                & (F.col("__df") / F.col("__n") >= F.lit(float(max_doc_frac))))
        .select("__grp", "__h")
    )
    kept = (lines.join(boiler, ["__grp", "__h"], "left_anti")
            .select("__doc", "pos", "line"))
    return _rebuild_docs(df, id_col, text_col, kept, "\n")


def _paragraphs(col: Column) -> Column:
    """Blank-line-separated paragraphs, each whitespace-trimmed (regex, not
    ``trim`` — a paragraph can carry a trailing lone newline, which the
    space-only trim would keep), empties dropped; internal single newlines
    inside a paragraph are preserved."""
    return F.filter(
        F.transform(F.split(col, r"\n\s*\n+"),
                    lambda p: F.regexp_replace(p, r"^\s+|\s+$", "")),
        lambda p: p != "",
    )


def dedup_paragraphs_global(df: DataFrame, id_col: str,
                            text_col: str) -> DataFrame:
    """Corpus-global PARAGRAPH dedup — the coarser C4-style pass real
    pipelines run before (or instead of) line dedup: boilerplate blocks
    (footers, cookie banners, nav text) repeat as whole paragraphs across
    pages of a site; dropping repeats at paragraph granularity preserves
    in-paragraph prose that line dedup would shred.

    Same keep-smallest-(doc, position) winner rule, same keyed-shuffle
    scale shape as :func:`dedup_lines_global` (shared engine); documents
    are rebuilt joining surviving paragraphs with a blank line.
    Precondition: ``id_col`` unique per document."""
    return _dedup_units_global(df, id_col, text_col,
                               _paragraphs(F.col(text_col)), "\n\n")


# Sentence-boundary mark (RS, U+001E): the splitter is RE2-safe by design —
# DuckDB's regexp engine has no lookbehind, so instead of splitting on
# "(?<=[.!?])\s+" the boundary is MARKED with a capture-group replace
# ("([.!?]+)\s+" -> "$1<RS>") and then split on the literal mark. Both
# engines support capture references in replacements, neither needs
# lookaround. A literal U+001E in the input would add a spurious boundary;
# pinned as out of contract for plain-text corpora (it is a control byte).
_SENT_MARK = "\x1e"


def _sentences(col: Column) -> Column:
    """Pinned sentence splitter: a boundary is a run of sentence
    terminators ``[.!?]+`` followed by whitespace; the terminator run stays
    with the left sentence, the boundary whitespace is consumed, each
    sentence is whitespace-trimmed, empties dropped. A final sentence
    without trailing whitespace needs no boundary. Deliberately simple
    (no abbreviation/quote handling) so the DuckDB oracle can reproduce it
    byte-for-byte."""
    marked = F.regexp_replace(col, r"([.!?]+)\s+", "$1" + _SENT_MARK)
    return F.filter(
        F.transform(F.split(marked, _SENT_MARK),
                    lambda s: F.regexp_replace(s, r"^\s+|\s+$", "")),
        lambda s: s != "",
    )


def dedup_sentence_spans_global(df: DataFrame, id_col: str, text_col: str,
                                span: int = 3) -> DataFrame:
    """The literal C4 §2.2 dedup rule: "we removed any three-sentence span
    that occurred more than once" — for every duplicated ``span``-sentence
    window, ONE occurrence (smallest ``(doc id, start position)``, pinned)
    keeps its sentences; every other occurrence's covered sentences are
    removed, and documents are rebuilt from the survivors in order.

    Differences from :func:`dedup_sentences_global` (single-sentence unit):
    a sentence is only removed when it sits inside a REPEATED multi-sentence
    run, so short formulaic sentences that legitimately recur ("Thanks!")
    survive unless a whole span around them repeats. Docs with fewer than
    ``span`` sentences contribute no spans and pass through rebuilt.

    Removal semantics (pinned): an occurrence is the span STARTING at
    position p; losing occurrences mark positions p..p+span-1; a sentence
    survives iff NO losing occurrence covers it (a sentence of a winning
    span can still be removed if a different, losing span also covers it —
    occurrence-level accounting, exactly reproducible in the oracle).

    Scale shape: sentence arrays stay in-row (``_sentences`` projection);
    spans explode as (hash, doc, start) — the span TEXT never shuffles,
    only its md5 — ONE materialized hash repartition feeds both the winner
    groupBy and the same-key join back (the split + span-md5 build runs
    once), one covered-position explode + distinct, one ``(doc, pos)``
    anti-join, and the shared doc-keyed rebuild. No windows, no driver
    state.
    Precondition: ``id_col`` unique per document.
    """
    if span < 1:
        raise ValueError("dedup_sentence_spans_global: span must be >= 1")
    sents = df.select(
        F.col(id_col).alias("__doc"),
        _sentences(F.col(text_col)).alias("__ss"),
    )
    # in-row span hashes: start positions 0..n-span; US (U+001F) joins the
    # span's sentences so ("a b", "c") never collides with ("a", "b c")
    spans = sents.filter(F.size("__ss") >= int(span)).select(
        "__doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__ss") - F.lit(int(span))),
                lambda i: F.md5(F.encode(
                    F.array_join(F.slice("__ss", i + 1, int(span)), "\x1f"),
                    "UTF-8")),
            )
        ).alias("pos", "__h"),
    # one hash repartition materializes the span table for BOTH the winner
    # aggregate and the join probe (partial-agg vs project subtrees would
    # otherwise defeat ReuseExchange and the sentence-split + span-md5
    # build would run twice over the corpus — _duplicate_positions' rule)
    ).repartition("__h")
    winners = spans.groupBy("__h").agg(
        F.min(F.struct("__doc", "pos")).alias("__w"))
    losers = (
        spans.join(winners, "__h")
        .filter(~((F.col("__doc") == F.col("__w.__doc"))
                  & (F.col("pos") == F.col("__w.pos"))))
        .select("__doc", "pos")
    )
    bad = losers.select(
        "__doc",
        F.explode(F.sequence(F.col("pos"),
                             F.col("pos") + F.lit(int(span) - 1))).alias("pos"),
    ).distinct()
    lines = sents.select(
        "__doc", F.posexplode("__ss").alias("pos", "line"))
    kept = lines.join(bad, ["__doc", "pos"], "left_anti")
    return _rebuild_docs(df, id_col, text_col, kept, " ")


def dedup_sentences_global(df: DataFrame, id_col: str,
                           text_col: str) -> DataFrame:
    """Corpus-global SENTENCE dedup — the exact granularity of C4 §2.2's
    "three-sentence span" rule's unit: templated sentences (legal
    disclaimers, share-this prompts) repeat across unrelated pages even
    when their surrounding lines differ, so line/paragraph dedup misses
    them.

    Same keep-smallest-(doc, position) winner rule, same keyed-shuffle
    scale shape as :func:`dedup_lines_global` (shared engine — posexplode,
    one winner groupBy on the sentence hash, one same-key join back, one
    doc-keyed rebuild); documents are rebuilt joining surviving sentences
    with a single space (the boundary whitespace is normalized, pinned).
    Precondition: ``id_col`` unique per document."""
    return _dedup_units_global(df, id_col, text_col,
                               _sentences(F.col(text_col)), " ")


# Gopher rule book: (signal, op, threshold) — the published defaults.
GOPHER_RULES = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "min_frac_words_alpha": 0.8,
    "min_stop_hits": 2,
    "max_frac_lines_bullet": 0.9,
    "max_frac_lines_ellipsis": 0.3,
    "max_dup_line_frac": 0.3,
}


def dup_line_frac_expr(col: Column) -> Column:
    """1 - distinct/total over non-blank trimmed lines, as a pure array
    projection (no explode, no shuffle) — numerically identical to
    repetition_stats' dup_line_frac."""
    lines = _lines(col)
    return F.when(
        F.size(lines) > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6),
    ).otherwise(F.lit(0.0))


def _rule_checks(r: dict) -> dict:
    """rule name -> FAIL condition over the signal columns (shared by
    gopher_filter and the streaming keep filter so the rule book has
    exactly one definition)."""
    return {
        "min_words": F.col("n_words") < r["min_words"],
        "max_words": F.col("n_words") > r["max_words"],
        "min_mean_word_len": F.col("mean_word_len") < r["min_mean_word_len"],
        "max_mean_word_len": F.col("mean_word_len") > r["max_mean_word_len"],
        "max_symbol_word_ratio": F.col("symbol_word_ratio") > r["max_symbol_word_ratio"],
        "min_frac_words_alpha": F.col("frac_words_alpha") < r["min_frac_words_alpha"],
        "min_stop_hits": F.col("n_stop_hits") < r["min_stop_hits"],
        "max_frac_lines_bullet": F.col("frac_lines_bullet") > r["max_frac_lines_bullet"],
        "max_frac_lines_ellipsis": F.col("frac_lines_ellipsis") > r["max_frac_lines_ellipsis"],
        "max_dup_line_frac": F.col("dup_line_frac") > r["max_dup_line_frac"],
    }


def _fail_count(checks: dict) -> Column:
    fails = None
    for cond in checks.values():
        fails = cond.cast("int") if fails is None else fails + cond.cast("int")
    return fails


def merged_rules(rules: dict | None) -> dict:
    """GOPHER_RULES with validated overrides applied."""
    r = dict(GOPHER_RULES)
    if rules:
        unknown = set(rules) - set(r)
        if unknown:
            raise ValueError(f"unknown rule(s): {sorted(unknown)}")
        r.update(rules)
    return r


def gopher_keep_stream(df: DataFrame, text_col: str,
                       rules: dict | None = None) -> DataFrame:
    """Filter to rule-passing documents PRESERVING every column, built only
    from stateless staged selects — the streaming-compatible twin of
    ``gopher_filter`` (which returns a verdict table keyed by id; joining
    that back is a stream-stream join Structured Streaming refuses).

    Signal arithmetic mirrors ``gopher_signals_table`` stage for stage
    (split/lines/regex counts materialized once, ratios derived from the
    attributes), and the rule book comes from the shared ``_rule_checks``
    — so kept ids are bit-identical to ``gopher_filter(...).passes``
    (pinned by test). Works on batch DataFrames too.
    """
    r = merged_rules(rules)
    col = F.col(text_col)
    orig = [F.col(c) for c in df.columns]
    stage1 = df.select(
        *orig,
        F.split(F.lower(F.trim(col)), r"\s+").alias("__q_words"),
        _lines(col).alias("__q_lines"),
        (F.length(col) - F.regexp_count(col, F.lit(r"\s"))).alias("__q_wc"),
        F.regexp_count(col, F.lit(r"\S*[A-Za-z]\S*")).alias("__q_aw"),
        (F.trim(col) == "").alias("__q_blank"),
        _symbol_count(col).alias("__q_sym"),
    )
    words, lines = F.col("__q_words"), F.col("__q_lines")
    dup = F.when(
        F.size(lines) > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6),
    ).otherwise(F.lit(0.0))
    stage2 = stage1.select(
        *orig,
        F.when(F.col("__q_blank"), F.lit(0)).otherwise(F.size(words))
         .cast("long").alias("n_words"),
        F.col("__q_wc"),
        F.col("__q_aw"),
        F.size(F.array_intersect(
            words, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
        ).cast("long").alias("n_stop_hits"),
        F.col("__q_sym"),
        F.size(lines).alias("__q_nl"),
        F.size(F.filter(lines, _starts_any)).alias("__q_bullet"),
        F.size(F.filter(lines, lambda l: _ends_any(l, ELLIPSIS_SUFFIXES))).alias("__q_ell"),
        dup.alias("dup_line_frac"),
    )
    nw, nl = F.col("n_words"), F.col("__q_nl")
    stage3 = stage2.select(
        *orig,
        nw,
        _frac(F.col("__q_wc"), nw).alias("mean_word_len"),
        _frac(F.col("__q_aw"), nw).alias("frac_words_alpha"),
        F.col("n_stop_hits"),
        _frac(F.col("__q_sym"), nw).alias("symbol_word_ratio"),
        _frac(F.col("__q_bullet"), nl).alias("frac_lines_bullet"),
        _frac(F.col("__q_ell"), nl).alias("frac_lines_ellipsis"),
        F.col("dup_line_frac"),
    )
    fails = _fail_count(_rule_checks(r))
    return stage3.filter(fails == 0).select(*[F.col(c) for c in df.columns])


def gopher_filter(df: DataFrame, id_col: str, text_col: str,
                  rules: dict | None = None,
                  explain: bool = False,
                  engine: str = "sql") -> DataFrame:
    """Apply the composed Gopher quality rules; returns
    (id, n_words, n_fail, passes) per document — plus one boolean
    ``fail_<rule>`` column per rule when ``explain=True`` (audit mode: at
    100 TB you want the rejection histogram, not just the count).

    The ENTIRE rule book is shuffle-free: signals come from the staged
    projection (gopher_signals_table — each split/regex once per row) and
    dup_line_frac uses the array-distinct form over the already-built
    lines array instead of the relational repetition_stats — so a 100-TB
    filter pass is a pure map stage. ``rules`` overrides individual
    thresholds from ``GOPHER_RULES``.

    ``engine='arrow'`` swaps the signal stage for the single-pass byte
    kernel (functions/quality_arrow — ~2.6x at GB scale, bit-identical
    output by shared ratio arithmetic + property test); the rule checks
    and output schema are the same Catalyst projection either way.
    """
    r = merged_rules(rules)
    if engine == "arrow":
        from nail_parquet_spark.functions.quality_arrow import (
            gopher_signals_table_arrow,
        )

        j = gopher_signals_table_arrow(df, id_col, text_col, with_dup=True)
    elif engine == "sql":
        lines = F.col("__lines")
        dup = F.when(
            F.size(lines) > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines), 6),
        ).otherwise(F.lit(0.0))
        j = gopher_signals_table(df, id_col, text_col,
                                 extra={"dup_line_frac": dup})
    else:
        raise ValueError(f"engine must be 'sql' or 'arrow', got {engine!r}")
    checks = _rule_checks(r)
    fails = _fail_count(checks)
    cols = [
        F.col(id_col),
        F.col("n_words"),
        fails.cast("long").alias("n_fail"),
        (fails == 0).alias("passes"),
    ]
    if explain:
        cols += [cond.alias(f"fail_{name}") for name, cond in checks.items()]
    return j.select(*cols)
