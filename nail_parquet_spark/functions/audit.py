"""One-call corpus health report — the first look a team takes at a new
crawl drop before spending compute on curation.

Composes the repo's attested operators (corpus_stats, the Gopher rule
book, dup-line fraction, URL quality, deterministic quantiles) into a
handful of aggregate jobs and returns a plain dict of driver-side
scalars — no corpus data is ever collected. Every heavy component here is
the same expression the oracle-checked operators use; the only
report-grade shortcut is Spark's native ``approx_count_distinct`` (HLL++)
for dup rates, which is not cross-engine-reproducible and therefore lives
only in this report, never in a ``queries()`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def corpus_audit(df: DataFrame, id_col: str, text_col: str = "text",
                 url_col: str | None = None,
                 lang_col: str | None = None,
                 quality_rules: dict | None = None,
                 qs: tuple = (0.25, 0.5, 0.95),
                 sketch_k: int = 4096,
                 top_langs: int = 10) -> dict:
    """Return a corpus health dict:

    - ``size``: n_docs / n_tokens / n_chars / avg_tokens_per_doc
      (functions/text.corpus_stats)
    - ``dup``: approx distinct text fingerprints (HLL++, ±~2%) and the
      implied exact-dup rate; mean dup-line fraction (the Gopher signal)
    - ``quality``: Gopher rule-book pass rate (shuffle-free staged
      projection, same book as ``gopher_filter``)
    - ``length_quantiles``: char-length quantiles from the deterministic
      min-k id-hash sample (functions/sketch.approx_quantiles)
    - ``langs``: top-N ``lang_col`` values with counts (when given)
    - ``urls``: URL-rule pass rate + approx distinct hosts (when given)

    Execution: one wide aggregate over a single staged projection for
    size/dup/quality/urls, one TakeOrderedAndProject sample job for the
    quantiles, and one small groupBy for the language histogram — three
    jobs total, all scan-shaped, nothing collected but scalars.
    """
    from nail_parquet_spark.functions.quality import (
        _fail_count, _rule_checks, dup_line_frac_expr, gopher_signals_table,
        merged_rules)
    from nail_parquet_spark.functions.sketch import approx_quantiles
    from nail_parquet_spark.functions.text import doc_fingerprint, token_count
    from nail_parquet_spark.functions.urls import (
        url_host, url_quality_keep_expr)

    text = F.coalesce(F.col(text_col), F.lit(""))
    cols = {
        "__toks": token_count(text),
        "__chars": F.length(text),
        "__fp": doc_fingerprint(text),
        "__dlf": dup_line_frac_expr(text),
    }
    if url_col is not None:
        cols["__url_ok"] = url_quality_keep_expr(F.col(url_col)).cast("int")
        cols["__host"] = url_host(F.col(url_col))
    staged = df.select(F.col(id_col),
                       *([F.col(lang_col)] if lang_col else []),
                       *[c.alias(n) for n, c in cols.items()])
    # the Gopher book needs its own staged signal projection (same extra
    # dup-line signal wiring as gopher_filter's sql engine)
    lines = F.col("__lines")
    dup = F.when(
        F.size(lines) > 0,
        F.round(F.lit(1.0)
                - F.size(F.array_distinct(lines)) / F.size(lines), 6),
    ).otherwise(F.lit(0.0))
    sig = gopher_signals_table(
        df.select(F.col(id_col), text.alias("__t")), id_col, "__t",
        extra={"dup_line_frac": dup})
    rules = merged_rules(quality_rules)
    passes = (_fail_count(_rule_checks(rules)) == 0).cast("int")
    quality_pass_rate = sig.agg(F.avg(passes)).first()[0]

    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").cast("long").alias("n_tokens"),
        F.sum("__chars").cast("long").alias("n_chars"),
        F.avg("__toks").alias("avg_tokens_per_doc"),
        F.approx_count_distinct("__fp").alias("n_distinct_texts"),
        F.avg("__dlf").alias("mean_dup_line_frac"),
    ]
    if url_col is not None:
        aggs.append(F.avg("__url_ok").alias("url_pass_rate"))
        aggs.append(F.approx_count_distinct("__host").alias("n_hosts"))
    row = staged.agg(*aggs).first().asDict()

    n = row["n_docs"] or 1
    report: dict = {
        "size": {
            "n_docs": row["n_docs"],
            "n_tokens": row["n_tokens"],
            "n_chars": row["n_chars"],
            "avg_tokens_per_doc": round(row["avg_tokens_per_doc"] or 0.0, 4),
        },
        "dup": {
            "n_distinct_texts_approx": row["n_distinct_texts"],
            "exact_dup_rate_approx": round(
                max(0.0, 1.0 - row["n_distinct_texts"] / n), 6),
            "mean_dup_line_frac": round(row["mean_dup_line_frac"] or 0.0, 6),
        },
        "quality": {
            "gopher_pass_rate": round(quality_pass_rate or 0.0, 6),
            "rules": rules,
        },
    }
    lq = approx_quantiles(
        df.select(F.col(id_col), F.length(text).alias("__len")),
        id_col, ["__len"], list(qs), k=sketch_k).collect()
    report["length_quantiles"] = {str(r["q"]): r["value"] for r in lq}
    if lang_col:
        top = (df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n"))
               .orderBy(F.desc("n"), F.col(lang_col).asc())
               .limit(top_langs).collect())
        report["langs"] = {str(r[lang_col]): r["n"] for r in top}
    if url_col is not None:
        report["urls"] = {
            "url_pass_rate": round(row["url_pass_rate"] or 0.0, 6),
            "n_hosts_approx": row["n_hosts"],
        }
    return report
