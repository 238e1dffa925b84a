"""Decontamination, cluster quality-keep, and unigram-LM scoring tests."""
import math

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.decontam import (
    decontaminate,
    eval_ngram_hashes,
    ngram_overlap,
)
from nail_parquet_spark.functions.graph import keep_best_in_cluster
from nail_parquet_spark.functions.text import unigram_logprob


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "what is the capital of france paris is the answer"),  # = eval q
        (3, "a totally clean document about query engines and sparks"),
        (4, "what is the capital of france i am not sure at all"),  # partial
        (5, ""),
        (6, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def evalset(spark):
    rows = [
        (100, "what is the capital of france paris"),
        (101, "name the largest planet jupiter obviously"),
    ]
    return spark.createDataFrame(rows, "eid long, text string")


class TestDecontam:
    def test_eval_hashes_distinct(self, spark, evalset):
        h = eval_ngram_hashes(evalset, "text", n=3)
        got = h.collect()
        assert len(got) == len({r["__h"] for r in got})
        # 5 + 4 trigram positions, all distinct strings
        assert len(got) == 9

    def test_overlap_report(self, spark, corpus, evalset):
        rep = {r["doc_id"]: r for r in
               ngram_overlap(corpus, evalset, "doc_id", "text", n=3).collect()}
        assert len(rep) == 6
        # doc 2 contains the full eval question: 5 of its trigrams hit
        assert rep[2]["n_hit"] == 5
        assert rep[2]["n_grams"] == 8
        assert rep[2]["contam_frac"] == pytest.approx(5 / 8, abs=1e-6)
        # doc 4 shares only the leading trigrams
        assert 0 < rep[4]["n_hit"] < rep[4]["n_grams"]
        # clean docs and short/empty docs
        assert rep[1]["n_hit"] == 0 and rep[3]["n_hit"] == 0
        assert rep[5]["n_grams"] == 0 and rep[5]["contam_frac"] == 0.0
        assert rep[6]["n_grams"] == 0  # "short doc" has < 3 words

    def test_filter_default_rule(self, spark, corpus, evalset):
        kept = decontaminate(corpus, evalset, "doc_id", "text", n=3)
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == {1, 3, 5, 6}  # 2 and 4 flagged (>=1 hit)
        # schema and values preserved
        assert kept.columns == corpus.columns

    def test_filter_frac_threshold(self, spark, corpus, evalset):
        kept = decontaminate(corpus, evalset, "doc_id", "text", n=3,
                             min_frac=0.5)
        ids = {r["doc_id"] for r in kept.collect()}
        assert ids == {1, 3, 4, 5, 6}  # only doc 2 reaches 5/8

    def test_no_broadcast_same_result(self, spark, corpus, evalset):
        a = ngram_overlap(corpus, evalset, "doc_id", "text", n=3).collect()
        b = ngram_overlap(corpus, evalset, "doc_id", "text", n=3,
                          broadcast_eval=False).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestKeepBest:
    def test_keeps_highest_score(self, spark):
        df = spark.createDataFrame(
            [(1, 0.9), (2, 0.95), (3, 0.1), (4, 0.5), (5, 0.5)],
            "id long, q double",
        )
        # cluster {1,2,3} (transitive via 2), cluster {4,5} tie on score
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        kept = keep_best_in_cluster(df, "id", "q", pairs)
        ids = sorted(r["id"] for r in kept.collect())
        assert ids == [2, 4]  # 2 wins cluster one; tie -> smallest id 4

    def test_singletons_kept(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, 2.0), (9, 0.0)],
                                   "id long, q double")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        ids = sorted(r["id"] for r in
                     keep_best_in_cluster(df, "id", "q", pairs).collect())
        assert ids == [2, 9]

    def test_null_score_loses(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, 0.1)], "id long, q double"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        ids = [r["id"] for r in
               keep_best_in_cluster(df, "id", "q", pairs).collect()]
        assert ids == [2]


class TestUnigramLM:
    def test_self_model_values(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a b"), (3, "")],
            "doc_id long, text string",
        )
        # corpus tf: a=3, b=2, total=5
        got = {r["doc_id"]: r for r in
               unigram_logprob(df, "doc_id", "text").collect()}
        pa_, pb = 3 / 5, 2 / 5
        m1 = (2 * math.log(pa_) + math.log(pb)) / 3
        assert got[1]["n_tokens"] == 3
        assert got[1]["mean_logprob"] == pytest.approx(m1, abs=1e-6)
        assert got[1]["perplexity"] == pytest.approx(math.exp(-m1), abs=1e-5)
        assert got[3]["n_tokens"] == 0 and got[3]["mean_logprob"] is None

    def test_external_vocab_and_oov_floor(self, spark):
        df = spark.createDataFrame([(1, "a z")], "doc_id long, text string")
        vocab = spark.createDataFrame([("a", 9)], "token string, tf long")
        got = unigram_logprob(df, "doc_id", "text", vocab_df=vocab).collect()[0]
        # p(a)=1.0, oov floor p(z)=1/9
        m = (math.log(1.0) + math.log(1 / 9)) / 2
        assert got["mean_logprob"] == pytest.approx(m, abs=1e-6)

    def test_gibberish_scores_worse(self, spark):
        rows = [(i, "the model trains on clean web text data") for i in range(10)]
        rows.append((99, "zxqv jkwp qqyz mmzx vvbn"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["perplexity"] for r in
               unigram_logprob(df, "doc_id", "text").collect()}
        assert got[99] > got[0]


class TestPerplexityBuckets:
    def test_tercile_assignment(self, spark):
        from nail_parquet_spark.functions.text import perplexity_buckets

        # 6 docs in one lang with distinct perplexities -> 2 per bucket
        rows = [(i, "en", " ".join(["common"] * 5 + ["rare%d" % j for j in range(i)]))
                for i in range(6)]
        rows.append((99, "en", ""))  # empty -> NULL bucket
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {r["doc_id"]: r["bucket"] for r in
               perplexity_buckets(df, "doc_id", "text", "lang").collect()}
        assert got[99] is None
        from collections import Counter
        c = Counter(v for k, v in got.items() if k != 99)
        assert c == {"head": 2, "middle": 2, "tail": 2}
        # doc 0 is all-common -> lowest perplexity -> head
        assert got[0] == "head"

    def test_custom_bucket_count(self, spark):
        from nail_parquet_spark.functions.text import perplexity_buckets

        rows = [(i, "g", "w%d w%d" % (i, i)) for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {r["bucket"] for r in
               perplexity_buckets(df, "doc_id", "text", "lang",
                                  n_buckets=2).collect()}
        assert got == {"b0", "b1"}


class TestSemanticDecontam:
    @staticmethod
    def _fixture(spark):
        rows = [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha extra"),   # near-paraphrase of eval
            (3, "completely unrelated subject matter entirely"),
            (4, None),
            (5, "   "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ev = spark.createDataFrame(
            [(100, "alpha beta gamma delta")], "eid long, text string")
        return docs, ev

    def test_overlap_report(self, spark):
        from nail_parquet_spark.functions.decontam import semantic_overlap

        docs, ev = self._fixture(spark)
        got = {r["doc_id"]: r["max_cosine"] for r in
               semantic_overlap(docs, ev, "doc_id", "text", dim=16).collect()}
        assert got[1] == 1.0                      # verbatim
        assert got[2] is not None and 0.8 < got[2] < 1.0   # paraphrase+extra
        assert got[3] is None or got[3] < 0.8     # unrelated (may share no bucket)
        assert got[4] is None and got[5] is None  # no embedding -> NULL

    def test_filter_drops_paraphrase_keeps_nulls(self, spark):
        from nail_parquet_spark.functions.decontam import semantic_decontaminate

        docs, ev = self._fixture(spark)
        kept = sorted(r["doc_id"] for r in semantic_decontaminate(
            docs, ev, "doc_id", "text", tau=0.8, dim=16).collect())
        assert kept == [3, 4, 5]
        assert semantic_decontaminate(
            docs, ev, "doc_id", "text", tau=1.1, dim=16).count() == 5

    def test_empty_eval_keeps_everything(self, spark):
        from nail_parquet_spark.functions.decontam import (
            semantic_decontaminate, semantic_overlap)

        docs, ev = self._fixture(spark)
        empty = ev.filter("eid < 0")
        assert semantic_decontaminate(
            docs, empty, "doc_id", "text", dim=16).count() == 5
        rep = semantic_overlap(docs, empty, "doc_id", "text", dim=16)
        assert all(r["max_cosine"] is None for r in rep.collect())


class TestScrubEvalSpans:
    def test_scrubs_only_leaked_spans(self, spark):
        from nail_parquet_spark.functions.decontam import scrub_eval_spans

        docs = spark.createDataFrame(
            [(1, "clean words then the secret benchmark answer appears here"),
             (2, "fully clean document nothing shared at all"),
             (3, None),
             (4, "the secret benchmark answer")],   # fully covered
            "doc_id long, text string")
        ev = spark.createDataFrame(
            [(9, "quiz: the secret benchmark answer")], "eid long, text string")
        got = {r["doc_id"]: r["text"] for r in scrub_eval_spans(
            docs, ev, "doc_id", "text", w=4).collect()}
        # doc1: windows 4..7 of the eval text match its tokens 4..7? the
        # leaked 4-gram "the secret benchmark answer" covers tokens 4-7
        assert got[1] == "clean words then appears here"
        assert got[2] == "fully clean document nothing shared at all"
        assert got[3] is None
        assert got[4] == ""

    def test_empty_eval_is_identity_normalized(self, spark):
        from nail_parquet_spark.functions.decontam import scrub_eval_spans

        docs = spark.createDataFrame(
            [(1, "  Mixed   CASE text ")], "doc_id long, text string")
        ev = spark.createDataFrame([(9, "zzz")], "eid long, text string") \
            .filter("eid < 0")
        got = scrub_eval_spans(docs, ev, "doc_id", "text", w=4).collect()[0]
        # contract: rebuilt text is normalized even when nothing is scrubbed
        assert got["text"] == "mixed case text"

    def test_overlapping_windows_union(self, spark):
        from nail_parquet_spark.functions.decontam import scrub_eval_spans

        # eval has a 5-token run -> two overlapping leaked 4-windows in the
        # doc; covered union is 5 tokens, not 8
        docs = spark.createDataFrame(
            [(1, "x a b c d e y")], "doc_id long, text string")
        ev = spark.createDataFrame(
            [(9, "a b c d e")], "eid long, text string")
        got = scrub_eval_spans(docs, ev, "doc_id", "text", w=4).collect()[0]
        assert got["text"] == "x y"
