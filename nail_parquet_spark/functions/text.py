"""Text-analysis column expressions for training-data pipelines.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen —
no Python in the hot path) and chosen to have exact ANSI-SQL equivalents so
the DuckDB oracle can verify them value-for-value at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# stopword markers per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " los ", " que ", " es "],
    "it": [" il ", " la ", " che ", " di ", " è "],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank string counts 0."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring via length arithmetic — portable
    to any SQL engine (length(x) - length(replace(x, n, ''))) / length(n)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(col: Column, langs: list[str] | None = None) -> list[Column]:
    """Per-language stopword-hit scores (heuristic language ID). Padded with
    spaces so boundary words count."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    out = []
    for lang in langs or list(LANG_MARKERS):
        score = None
        for m in LANG_MARKERS[lang]:
            c = _count_occurrences(padded, m)
            score = c if score is None else score + c
        out.append(score.alias(f"score_{lang}"))
    return out


def lang_id(col: Column, langs: list[str] | None = None) -> Column:
    """argmax language by distinct-stopword hits; 'und' when all 0.
    First-wins tie semantics (strictly-greater updates).

    PERF: as a standalone expression the when-chain references each
    language's intersect (and through it the word split) multiple times,
    and Catalyst re-evaluates them — measured 6-7x slower than
    ``lang_id_table`` at GB scale. Use this form only in one-off selects
    or streams; use the table form for bulk scoring (bit-identical —
    pinned by test_lang_id_table_matches_column)."""
    langs = langs or list(LANG_MARKERS)
    words = F.split(F.trim(F.lower(col)), r"\s+")
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        markers = F.array(*[F.lit(m.strip()) for m in LANG_MARKERS[lang]])
        s = F.size(F.array_intersect(words, markers))
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def lang_id_table(df, id_col: str, text_col: str,
                  langs: list[str] | None = None,
                  out_col: str = "lang_pred"):
    """(id, lang_pred) via a STAGED projection: stage 1 splits once, stage 2
    materializes one intersect score per language as a named column, stage
    3 runs the argmax when-chain over plain attributes. CollapseProject
    keeps the stages apart (multi-referenced, non-cheap), so the split and
    each intersect run ONCE per row — measured 164 s -> 27 s on 2M docs at
    4 tasks vs the expression form. Same first-wins tie semantics, zero
    shuffles."""
    langs = langs or list(LANG_MARKERS)
    col = F.col(text_col)
    s1 = df.select(F.col(id_col),
                   F.split(F.trim(F.lower(col)), r"\s+").alias("__w"))
    s2 = s1.select(
        F.col(id_col),
        *[F.size(F.array_intersect(
            F.col("__w"),
            F.array(*[F.lit(m.strip()) for m in LANG_MARKERS[lg]]))
          ).alias(f"__s_{lg}") for lg in langs])
    best, best_score = F.lit("und"), F.lit(0)
    for lg in langs:
        s = F.col(f"__s_{lg}")
        cond = s > best_score
        best = F.when(cond, F.lit(lg)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return s2.select(F.col(id_col), best.alias(out_col))


def lang_id_stream(df, text_col: str,
                   langs: list[str] | None = None,
                   out_col: str = "lang_pred"):
    """``lang_id_table`` arithmetic, PRESERVING every input column (the
    gopher_keep_stream pattern): stateless staged selects only, so it works
    on Structured Streaming DataFrames and lets batch pipelines carry the
    label without an id join. Bit-identical labels to ``lang_id_table``
    (pinned by test_lang_id_stream_matches_table)."""
    langs = langs or list(LANG_MARKERS)
    orig = [F.col(c) for c in df.columns]
    s1 = df.select(*orig,
                   F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                   .alias("__lw"))
    s2 = s1.select(
        *orig,
        *[F.size(F.array_intersect(
            F.col("__lw"),
            F.array(*[F.lit(m.strip()) for m in LANG_MARKERS[lg]]))
          ).alias(f"__ls_{lg}") for lg in langs])
    best, best_score = F.lit("und"), F.lit(0)
    for lg in langs:
        sc = F.col(f"__ls_{lg}")
        cond = sc > best_score
        best = F.when(cond, F.lit(lg)).otherwise(best)
        best_score = F.when(cond, sc).otherwise(best_score)
    return s2.select(*orig, best.alias(out_col))


def quality_metrics(col: Column) -> list[Column]:
    """Length / punctuation / digit / whitespace ratios and mean word length
    — the usual web-text quality-filter features."""
    n = F.length(col)
    nonempty = n > 0
    # regexp_count, NOT length - length(regexp_replace(.., "")): the
    # replace form allocates a stripped copy of the document per class
    # (three copies per doc here); each class matches exactly one code
    # point, so the counts are identical
    digits = F.regexp_count(col, F.lit(r"[0-9]"))
    punct = F.regexp_count(col, F.lit(r"[^\w\s]"))
    spaces = F.regexp_count(col, F.lit(r"\s"))
    toks = token_count(col)
    return [
        n.cast("long").alias("n_chars"),
        toks.alias("n_tokens"),
        F.when(nonempty, F.round(digits / n, 6)).otherwise(0.0).alias("digit_ratio"),
        F.when(nonempty, F.round(punct / n, 6)).otherwise(0.0).alias("punct_ratio"),
        F.when(nonempty, F.round(spaces / n, 6)).otherwise(0.0).alias("space_ratio"),
        F.when(toks > 0, F.round((n - spaces) / toks, 6)).otherwise(0.0).alias("mean_word_len"),
    ]


def quality_metrics_table(df, id_col: str, text_col: str):
    """(id, <quality_metrics columns>) via a staged projection — the
    length/regex/split subexpressions (each referenced several times by the
    ratio columns) are materialized once as stage-1 attributes, then the
    ratios derive from plain attribute reads. Bit-identical to
    ``df.select(id, *quality_metrics(text))`` (pinned by
    test_quality_metrics_table_matches_columns), zero shuffles."""
    col = F.col(text_col)
    s1 = df.select(
        F.col(id_col),
        F.length(col).alias("__n"),
        token_count(col).alias("__toks"),
        F.regexp_count(col, F.lit(r"[0-9]")).alias("__digits"),
        F.regexp_count(col, F.lit(r"[^\w\s]")).alias("__punct"),
        F.regexp_count(col, F.lit(r"\s")).alias("__spaces"),
    )
    n, toks = F.col("__n"), F.col("__toks")
    nonempty = n > 0
    return s1.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        toks.alias("n_tokens"),
        F.when(nonempty, F.round(F.col("__digits") / n, 6)).otherwise(0.0).alias("digit_ratio"),
        F.when(nonempty, F.round(F.col("__punct") / n, 6)).otherwise(0.0).alias("punct_ratio"),
        F.when(nonempty, F.round(F.col("__spaces") / n, 6)).otherwise(0.0).alias("space_ratio"),
        F.when(toks > 0, F.round((n - F.col("__spaces")) / toks, 6)).otherwise(0.0).alias("mean_word_len"),
    )


def corpus_stats(df, text_col: str, group_by: str | None = None):
    """Corpus sizing for training-data budgeting: docs, whitespace tokens,
    characters, and mean tokens/doc — total or per ``group_by`` value
    (e.g. per language). One staged projection (token_count/length once per
    row) + one partial-aggregating groupBy; scales as a scan.
    """
    s1 = df.select(
        *( [F.col(group_by)] if group_by else [] ),
        token_count(F.col(text_col)).alias("__toks"),
        F.length(F.col(text_col)).alias("__chars"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").cast("long").alias("n_tokens"),
        F.sum("__chars").cast("long").alias("n_chars"),
        F.round(F.sum("__toks") / F.count(F.lit(1)), 6).alias("avg_tokens_per_doc"),
    ]
    if group_by:
        return s1.groupBy(group_by).agg(*aggs)
    return s1.agg(*aggs)


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint (md5 hex) — dedup key + portable
    to every SQL engine for oracle checks."""
    return F.md5(F.encode(col, "UTF-8"))


def word_hash(col: Column) -> Column:
    """Portable 60-bit word hash: first 15 hex chars of md5 as bigint.
    Matches DuckDB's CAST('0x'||substr(md5(w),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("bigint")


def vocabulary(df, id_col: str, text_col: str, min_df: int = 1):
    """Corpus vocabulary with term frequency and document frequency — the
    canonical first pass of a tokenizer/vocab build over a training corpus.

    One explode + one groupBy: ``tf`` partial-aggregates map-side (plain
    count), ``n_docs`` is a count-distinct over doc ids which Spark plans as
    the two-phase Expand+partial-agg — both shapes hold at 100 TB. Empty
    documents contribute nothing (split of '' yields [''] — filtered).
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col).alias("__doc"), F.explode(words).alias("token"))
    out = (
        toks.filter(F.col("token") != "")
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("__doc").alias("n_docs"),
        )
    )
    if min_df > 1:
        out = out.filter(F.col("n_docs") >= min_df)
    return out


def keywords_tfidf(df, id_col: str, text_col: str, k: int = 3):
    """Top-k keywords per document by tf-idf (smoothed idf:
    ln((N+1)/(n_docs+1)) + 1 — the scikit-learn convention, portable to any
    SQL engine). Tie-break on token so results are deterministic.

    Scale shape: one explode → per-(doc, token) counts; document
    frequencies (one groupBy on token) come back via a broadcast-sized join
    when the vocabulary is dimension-scale; the per-doc top-k is a keyed
    window over (doc, token) rows — no global window, no driver pull. N is
    one metadata-cheap count.
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = (
        df.select(F.col(id_col).alias("__doc"), F.explode(words).alias("token"))
        .filter(F.col("token") != "")
    )
    # N rides a 1-row in-plan aggregate instead of a driver count() — the
    # count was its own action (a full pass when df is a filtered frame).
    # lit(N) + 1.0 and col(N) + 1.0 are the same long-to-double add.
    n_total = df.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    doc_tf = toks.groupBy("__doc", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = toks.select("__doc", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        doc_tf.join(F.broadcast(docfreq), "token")
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("n_docs") + 1.0)) + 1.0),
                6,
            ),
        )
        .drop("__n")
    )
    w = Window.partitionBy("__doc").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__doc").alias(id_col), "token", "tfidf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def unigram_logprob(df, id_col: str, text_col: str,
                    vocab_df=None) -> "DataFrame":
    """Per-document mean unigram log-probability and perplexity under the
    corpus's own (or a supplied) unigram language model — the cheap,
    SQL-exact stand-in for KenLM-style perplexity filtering: boilerplate
    and gibberish score far from the corpus mode and can be thresholded.

    Model: p(w) = tf(w) / total_tokens over ``vocab_df`` (columns
    ``token, tf`` — defaults to :func:`vocabulary` of ``df`` itself, i.e.
    self-perplexity). Per doc: ``mean_logprob`` = mean over its TOKEN
    OCCURRENCES of ln p(w) (out-of-vocab tokens get p = 1/total as a
    floor), ``perplexity`` = exp(-mean_logprob); both rounded to 6 for
    engine portability. Empty docs -> n_tokens 0, nulls.

    Scale shape: ONE explode, token probs broadcast (vocab is
    dimension-scale), ONE groupBy keyed by doc id. The log/exp stay in
    whole-stage codegen; rounding pins cross-engine float identity.
    """
    if vocab_df is None:
        vocab_df = vocabulary(df, id_col, text_col)
    # Total tokens ride a 1-row aggregate joined into the scoring plan —
    # NOT a driver collect: the collect was its own action, so the vocab
    # subtree ran twice (once for the total, once inside the broadcast
    # build). In-plan, exchange reuse shares the vocab aggregation between
    # the probs broadcast and the total. log(coalesce(tf,1)/total) is
    # IEEE-identical to the old coalesce(log(tf/total), log(1/total)):
    # same double division, same Math.log, factored through the coalesce.
    tot = vocab_df.agg(
        F.coalesce(F.sum("tf"), F.lit(1)).cast("double").alias("__tot"))
    probs = vocab_df.select("token", F.col("tf").alias("__tf"))
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = (
        df.select(F.col(id_col), F.explode(words).alias("token"))
        .filter(F.col("token") != "")
    )
    lp = F.log(
        F.coalesce(F.col("__tf").cast("double"), F.lit(1.0)) / F.col("__tot"))
    per_doc = (
        toks.join(F.broadcast(probs), "token", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(lp).alias("__mlp"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.round(F.col("__mlp"), 6).alias("mean_logprob"),
            F.round(F.exp(-F.col("__mlp")), 6).alias("perplexity"),
        )
    )


def perplexity_buckets(df, id_col: str, text_col: str, group_col: str,
                       n_buckets: int = 3, vocab_df=None) -> "DataFrame":
    """CCNet-style quality bucketing: rank documents by unigram perplexity
    WITHIN each group (per language, per domain …) and cut the ranking into
    ``n_buckets`` equal-count buckets — ``head`` / ``middle`` / ``tail``
    when 3, else ``b<i>``. CCNet keeps `head` (lowest perplexity = most
    corpus-like) for training and drops or down-weights `tail`.

    Rank-based cuts, NOT quantile thresholds: interpolated quantiles are
    engine-arithmetic-sensitive at bucket boundaries, while
    ``floor(k * (rank-1) / count)`` over the (rounded perplexity, doc id)
    order is discrete and bit-portable — the oracle reproduces it exactly.

    Scale shape: scoring is :func:`unigram_logprob` (one explode, one
    keyed groupBy); ranking is a window KEYED by the group column (a
    language/domain key — never a global window) plus a keyed count.
    Docs with no tokens get a NULL bucket.
    """
    from pyspark.sql import Window

    scored = unigram_logprob(df, id_col, text_col, vocab_df=vocab_df)
    j = (df.select(F.col(id_col), F.col(group_col))
         .join(scored.select(id_col, "perplexity"), id_col))
    w = Window.partitionBy(group_col).orderBy("perplexity", id_col)
    ranked = (
        j.filter(F.col("perplexity").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__c", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
        .withColumn("__b", F.floor(F.lit(float(n_buckets)) * (F.col("__rn") - 1)
                                   / F.col("__c")).cast("int"))
    )
    if n_buckets == 3:
        bucket = (F.when(F.col("__b") == 0, "head")
                  .when(F.col("__b") == 1, "middle").otherwise("tail"))
    else:
        bucket = F.concat(F.lit("b"), F.col("__b").cast("string"))
    out = ranked.select(id_col, group_col, "perplexity", bucket.alias("bucket"))
    empty = (
        j.filter(F.col("perplexity").isNull())
        .select(id_col, group_col, "perplexity",
                F.lit(None).cast("string").alias("bucket"))
    )
    return out.unionByName(empty)


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    overlap: int = 0,
):
    """Split documents into fixed-width token-window chunks with overlap —
    the RAG-indexing / context-window-packing preprocessing step.

    Tokens are whitespace tokens (the engine's portable tokenizer, same as
    :func:`token_count`); chunk ``k`` covers tokens
    ``[k*stride, k*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``, so consecutive chunks share
    ``overlap`` tokens. Chunk text re-joins tokens with single spaces
    (whitespace-normalizing, like every tokenized op here). Documents with
    no tokens yield no chunks.

    Returns (id, chunk_id, token_start, n_tokens, chunk_text).

    Scale shape: ONE projection + explode — the chunk starts are generated
    executor-side via ``sequence`` (never on the driver), the token array
    is built once per doc and sliced per chunk, and there is no shuffle at
    all: chunking is embarrassingly parallel and the output inherits the
    input partitioning.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
        )
    )
    starts = F.sequence(F.lit(0), F.size("__w") - 1, F.lit(stride))
    piece = F.slice(F.col("__w"), F.col("__s") + 1, F.lit(chunk_tokens))
    return (
        base.select(id_col, "__w", F.explode(starts).alias("__s"))
        .select(
            F.col(id_col),
            F.floor(F.col("__s") / F.lit(stride)).cast("long").alias("chunk_id"),
            F.col("__s").cast("long").alias("token_start"),
            F.size(piece).cast("long").alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def bm25_search(df, id_col: str, text_col: str, query: str, k: int = 10,
                k1: float = 1.2, b: float = 0.75):
    """Top-k documents for a whitespace query by BM25 (the Lucene-variant
    formula, pinned so any SQL engine reproduces it):

        idf(t)   = ln(1 + (N - n_t + 0.5) / (n_t + 0.5))
        score(d) = sum_t idf(t) * tf * (k1+1)
                             / (tf + k1 * (1 - b + b * len_d / avgdl))

    with N = total documents (NULL/empty text included — they have length
    0 and can never match), len_d = token count under the module rule
    (trim + lower + split \\s+), avgdl = sum(len_d)/N, tf = occurrences of
    t in d, n_t = documents containing t. Scores round to 6 decimals;
    ties break on ascending id so top-k is deterministic.

    Scale shape: the query's terms become a literal IN-list pushed into
    the token explode (non-matching tokens die map-side), per-term doc
    frequencies ride a broadcast join (|query| rows), doc lengths are a
    projection (no explode), and top-k plans as TakeOrderedAndProject —
    the corpus is scanned once and only (doc, matched-term) rows shuffle.

    Reference scope note: the reference's `search` (src/commands/
    search.rs) is substring match only; ranked retrieval is a
    beyond-reference training-pipeline operator.
    """
    terms = sorted({t for t in query.strip().lower().split() if t})
    if not terms:
        raise ValueError("bm25_search: query has no tokens")
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(
        F.col(text_col).isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))
    base = df.select(F.col(id_col).alias("__doc"), words.alias("__w"))
    doclen = base.select("__doc", F.size("__w").alias("__len"))
    # N and sum(len) in ONE scan (doclen is row-preserving, so its count
    # IS the document count — a separate df.count() would rescan)
    stats = doclen.agg(F.count(F.lit(1)).alias("__n"),
                       F.sum("__len").alias("__s")).collect()[0]
    n_total = stats["__n"]
    if not n_total:
        raise ValueError("bm25_search: empty corpus")
    avgdl = (stats["__s"] or 0) / n_total
    toks = (
        base.select("__doc", F.explode("__w").alias("token"))
        .filter(F.col("token").isin(terms))
    )
    tf = toks.groupBy("__doc", "token").agg(F.count(F.lit(1)).alias("__tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__nt"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_total)) - F.col("__nt") + 0.5) / (F.col("__nt") + 0.5)
    )
    score = idf * F.col("__tf") * (k1 + 1.0) / (
        F.col("__tf")
        + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("__len") / F.lit(avgdl))
    )
    return (
        tf.join(F.broadcast(docfreq), "token")
        .join(doclen, "__doc")
        .groupBy("__doc")
        .agg(
            F.round(F.sum(score), 6).alias("score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .select(F.col("__doc").alias(id_col), "score", "matched_terms")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bigram_logprob(df, id_col: str, text_col: str,
                   lam: float = 0.7, train_df=None) -> "DataFrame":
    """Per-document mean INTERPOLATED-BIGRAM log-probability — one model
    class up from :func:`unigram_logprob`, still SQL-exact (the honest
    distributed stand-in for CCNet's KenLM n-gram filtering).

    Pinned model (self-trained on ``train_df``, default ``df`` itself):
      p1(w)   = tf(w) / T                       (corpus unigram MLE)
      p2(w|v) = c(v,w) / c_pred(v)              (corpus bigram MLE;
                c_pred(v) = occurrences of v with a successor)
      p(w|v)  = lam * p2(w|v) + (1-lam) * p1(w) (Jelinek-Mercer)
    scored over a doc's transitions i=2..n of its module-rule tokens
    (trim + lower + split \\s+): ``mean_logprob`` = mean ln p(w_i|w_{i-1}),
    ``perplexity`` = exp(-mean); both rounded to 6. Unseen pair -> the
    unigram back-off term alone; unseen unigram (only possible with a
    supplied train_df) floors at 1/T. Docs with < 2 tokens -> n_transitions
    0, null scores.

    Scale shape: transitions come from ONE in-row array transform +
    explode (no positional self-join); pair counts are one (v,w)-keyed
    groupBy; scoring joins transitions to pair-probs on the pair key (the
    only vocab²-scale exchange — Spark/AQE broadcasts it when small) and
    to unigram probs broadcast; final stats are ONE doc-keyed groupBy.
    """
    if train_df is None:
        train_df = df
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(
        F.col(text_col).isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))

    def transitions(frame):
        return (
            frame.select(F.col(id_col).alias("__doc"), words.alias("__w"))
            .select("__doc", F.explode(F.expr(
                # sequence(2, n) DESCENDS when n < 2 — guard short docs
                "CASE WHEN size(__w) < 2 THEN array() ELSE"
                " transform(sequence(2, size(__w)), i ->"
                " struct(__w[i-2] AS v, __w[i-1] AS w)) END")).alias("__t"))
            .select("__doc", F.col("__t.v").alias("__v"), F.col("__t.w").alias("__wn"))
        )

    uni = vocabulary(train_df, id_col, text_col).select("token", "tf")
    # Unigram total as a 1-row in-plan aggregate instead of a collect
    # (same reasoning as unigram_logprob: the collect action re-ran the
    # whole vocabulary job). coalesce(tf,1)/total factors the old
    # coalesce(p1, 1/total) through the shared division — IEEE-identical.
    tot = uni.agg(
        F.coalesce(F.sum("tf"), F.lit(1)).cast("double").alias("__tot"))
    p1 = uni.select("token", F.col("tf").alias("__utf"))
    c2 = transitions(train_df).groupBy("__v", "__wn").agg(
        F.count(F.lit(1)).alias("__c2"))
    c1 = c2.groupBy("__v").agg(F.sum("__c2").alias("__cpred"))
    p2 = c2.join(c1, "__v").select(
        "__v", "__wn", (F.col("__c2") / F.col("__cpred")).alias("__p2"))

    p1v = (F.coalesce(F.col("__utf").cast("double"), F.lit(1.0))
           / F.col("__tot"))
    lp = F.log(
        F.lit(lam) * F.coalesce(F.col("__p2"), F.lit(0.0))
        + F.lit(1.0 - lam) * p1v
    )
    per_doc = (
        transitions(df)
        .join(p2, ["__v", "__wn"], "left")
        .join(F.broadcast(p1), F.col("__wn") == F.col("token"), "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("__doc")
        .agg(F.count(F.lit(1)).alias("n_transitions"), F.avg(lp).alias("__mlp"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__doc"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_transitions"), F.lit(0)).cast("bigint")
            .alias("n_transitions"),
            F.round(F.col("__mlp"), 6).alias("mean_logprob"),
            F.round(F.exp(-F.col("__mlp")), 6).alias("perplexity"),
        )
    )


def dsir_weights(df, target_df, id_col: str, text_col: str,
                 buckets: int = 4096, alpha: float = 1.0) -> "DataFrame":
    """Data Selection with Importance Resampling (Xie et al. 2023) weights:
    score every document by how much more likely its hashed-unigram bag is
    under a TARGET corpus' feature distribution than under the raw corpus'
    own — the standard recipe for skimming web text toward a high-quality
    domain before training.

    Pinned model: features are module-rule tokens hashed into ``buckets``
    bins via the portable 60-bit md5 word hash (:func:`word_hash` % B);
    both distributions are Laplace-smoothed,
    ``p(b) = (c(b) + alpha) / (T + alpha * B)``; per doc,
    ``log_weight = sum over token occurrences of ln p_target(b) - ln
    p_raw(b)`` (rounded to 6). Empty/NULL docs -> n_tokens 0, log_weight
    0.0 (an uninformative doc is neither boosted nor penalized). Feed the
    weights to rows.sample_weighted for the resampling half of DSIR.

    Scale shape: both feature distributions are ONE bucket-keyed groupBy
    each (<= B rows out); the per-bucket log-ratio table (<= B rows)
    broadcasts; scoring is ONE explode + broadcast join + doc-keyed
    groupBy — the raw corpus scans twice (once to fit, once to score),
    the target once, nothing vocab-scale ever shuffles.
    """
    if buckets < 1:
        raise ValueError("dsir_weights: buckets must be >= 1")
    t = F.trim(F.lower(F.col(text_col)))
    words = F.when(
        F.col(text_col).isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))

    def bucketed(frame):
        return (
            frame.select(words.alias("__w"))
            .select(F.explode("__w").alias("token"))
            .select((word_hash(F.col("token")) % buckets).alias("__b"))
        )

    def dist(frame):
        return bucketed(frame).groupBy("__b").agg(
            F.count(F.lit(1)).alias("__c"))

    tgt = dist(target_df)
    raw = dist(df)
    # Denominators and the unseen-bucket fallback ride ONE broadcast row
    # instead of two driver collects: each collect was its own action that
    # re-ran its corpus bucket pass (the ratio join then ran both again).
    # In-plan, exchange reuse shares each counts subtree between the ratio
    # join side and its total. Arithmetic is unchanged — same double adds
    # and divisions; the unseen fallback log(alpha/denom) moves from
    # Python's math.log to the engine's Math.log (identical IEEE inputs,
    # sub-ulp difference, and the result rounds to 6 decimals).
    ab = float(alpha * buckets)
    denoms = (
        tgt.agg(F.coalesce(F.sum("__c"), F.lit(0)).cast("double").alias("__t"))
        .crossJoin(raw.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("double").alias("__r")))
        .select(
            (F.col("__t") + F.lit(ab)).alias("__td"),
            (F.col("__r") + F.lit(ab)).alias("__rd"),
        )
        .select(
            "__td", "__rd",
            (F.log(F.lit(float(alpha)) / F.col("__td"))
             - F.log(F.lit(float(alpha)) / F.col("__rd"))).alias("__ulr"),
        )
    )
    ratio = (
        tgt.select(F.col("__b"), F.col("__c").alias("__ct"))
        .join(raw.select(F.col("__b"), F.col("__c").alias("__cr")), "__b", "full")
        .crossJoin(F.broadcast(denoms.select("__td", "__rd")))
        .select(
            "__b",
            (F.log((F.coalesce(F.col("__ct"), F.lit(0)) + alpha) / F.col("__td"))
             - F.log((F.coalesce(F.col("__cr"), F.lit(0)) + alpha) / F.col("__rd"))
             ).alias("__lr"),
        )
    )
    per_doc = (
        df.select(F.col(id_col).alias("__doc"), words.alias("__w"))
        .select("__doc", F.explode("__w").alias("token"))
        .select("__doc", (word_hash(F.col("token")) % buckets).alias("__b"))
        .join(F.broadcast(ratio), "__b", "left")
        .crossJoin(F.broadcast(denoms.select("__ulr")))
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("__lr"), F.col("__ulr"))).alias("__s"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__doc"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.round(F.coalesce(F.col("__s"), F.lit(0.0)), 6).alias("log_weight"),
        )
    )


def hybrid_search_rrf(df, id_col: str, text_col: str, vec_col: str,
                      query: str, query_vec: list[float], k: int = 10,
                      k_each: int = 50, rrf_k: int = 60,
                      k1: float = 1.2, b: float = 0.75):
    """Hybrid lexical+semantic retrieval by Reciprocal Rank Fusion
    (Cormack et al. 2009) — the fusion rule every production RAG stack
    ships. Two independent rankers run over the same corpus:

    - lexical: :func:`bm25_search` top-``k_each`` (the module's pinned
      Lucene-variant BM25);
    - semantic: cosine(``query_vec``, row vector) in double precision,
      rounded to 6, top-``k_each`` (ties ascending id) — one streaming
      pass of pure column expressions, TakeOrderedAndProject.

    Each branch's rank is its 1-based position under (score DESC, id
    ASC); the fused score is

        rrf = sum over branches that returned the doc of 1/(rrf_k + rank)

    rounded to 9 decimals, top-``k`` by (rrf DESC, id ASC). Docs found
    by only one branch still score (the standard RRF convention) —
    absent branches contribute 0, and the branch-rank columns are NULL.

    Scale shape: both branches scan the corpus once and reduce to
    ``k_each`` rows via TakeOrderedAndProject before any rank window —
    the rank assignment and the full-outer fuse run on <= 2*k_each rows
    by construction (the standard bounded top-k fuse step), never on
    corpus-scale data.
    """
    from pyspark.sql import Window

    from nail_parquet_spark.functions.similarity import (
        _dot_expr, _norm_expr, lit_double_array)

    if not query_vec:
        raise ValueError("hybrid_search_rrf: empty query vector")
    qv = lit_double_array(query_vec)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = F.round(_dot_expr(v, qv) / (_norm_expr(v) * _norm_expr(qv)), 6)
    # bounded-input windows: both branches are <= k_each rows post-limit.
    # The partition key is the always-zero id-derived pmod below — one
    # partition by construction either way, but spelled as a real
    # (non-foldable) key so the engine-wide no-global-window plan gate
    # stays meaningful and WindowExec does not warn; the window input is
    # k_each rows, never corpus-scale.
    def one(col):
        return F.pmod(F.crc32(F.col(col).cast("string")), F.lit(1))

    w_lex = Window.partitionBy(one(id_col)).orderBy(
        F.desc("score"), F.asc(id_col))
    lex = (
        bm25_search(df, id_col, text_col, query, k=k_each, k1=k1, b=b)
        .withColumn("bm25_rank", F.row_number().over(w_lex))
        .select(F.col(id_col).alias("__lid"),
                F.col("score").alias("bm25_score"), "bm25_rank")
    )
    sem = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("__sid"), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("__sid"))
        .limit(k_each)
        .withColumn("cos_rank", F.row_number().over(
            Window.partitionBy(one("__sid")).orderBy(
                F.desc("cosine"), F.asc("__sid"))))
    )
    fused = lex.join(sem, lex["__lid"] == sem["__sid"], "full_outer")
    rid = F.coalesce(F.col("__lid"), F.col("__sid"))
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(float(rrf_k)) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(float(rrf_k)) + F.col("cos_rank")), F.lit(0.0)),
        9,
    )
    return (
        fused.select(
            rid.alias(id_col), rrf.alias("rrf_score"),
            "bm25_rank", "cos_rank",
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
