"""Hashed bag-of-words embeddings (functions/embed.py)."""
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.embed import (
    hashed_ngram_embedding,
    semantic_dedup_text,
)


def _model(text, dim):
    """Independent python model of the pinned contract."""
    if text is None or text.strip() == "":
        return None
    v = [0.0] * dim
    for tok in text.strip().lower().split():
        h = hashlib.md5(tok.encode()).hexdigest()
        b = int(h[:7], 16) % dim
        s = 1.0 if int(h[7], 16) % 2 == 0 else -1.0
        v[b] += s
    n = math.sqrt(sum(x * x for x in v))
    return v if n == 0 else [round(x / n, 6) for x in v]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),          # exact dup of 1
        (3, "THE  Quick   Brown fox "),      # same tokens after normalize
        (4, "completely different subject matter here"),
        (5, None),
        (6, "   "),
        (7, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embedding_matches_python_model(spark, docs):
    got = {r["doc_id"]: r["embedding"] for r in
           hashed_ngram_embedding(docs, "text", dim=16).collect()}
    for r in docs.collect():
        want = _model(r["text"], 16)
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_embedding_null_and_blank(spark, docs):
    got = {r["doc_id"]: r["embedding"] for r in
           hashed_ngram_embedding(docs, "text", dim=8).collect()}
    assert got[5] is None and got[6] is None


def test_embedding_unit_norm(spark, docs):
    for r in hashed_ngram_embedding(docs, "text", dim=32).collect():
        if r["embedding"] is not None:
            n = math.sqrt(sum(x * x for x in r["embedding"]))
            assert abs(n - 1.0) < 1e-4


def test_embedding_identical_texts_identical_vectors(spark, docs):
    got = {r["doc_id"]: r["embedding"] for r in
           hashed_ngram_embedding(docs, "text", dim=16).collect()}
    assert got[1] == got[2] == got[3]  # tokenizer normalizes case/space


def test_embedding_plan_no_shuffle(spark, docs):
    from nail_parquet_spark.plans.explain import plan_text

    plan = plan_text(hashed_ngram_embedding(docs, "text", dim=16))
    assert "Exchange" not in plan, plan


def test_embedding_rejects_bad_args(spark, docs):
    with pytest.raises(ValueError):
        hashed_ngram_embedding(docs, "text", dim=0)
    with pytest.raises(ValueError):
        hashed_ngram_embedding(docs.withColumn("embedding", F.lit(1)), "text")


def test_semantic_dedup_text_drops_exact_dups(spark, docs):
    kept = sorted(r["doc_id"] for r in semantic_dedup_text(
        docs, "doc_id", "text", dim=16, k=2, iters=1, tau=0.99).collect())
    # 1/2/3 are embedding-identical -> keep-first keeps 1; null/blank rows
    # never enter the pair space and are always kept
    assert kept == [1, 4, 5, 6, 7]
    # schema is preserved (no internal embedding column leaks)
    out = semantic_dedup_text(docs, "doc_id", "text", dim=16, k=2)
    assert out.columns == docs.columns


def test_semantic_dedup_text_keep_best(spark, docs):
    scored = docs.withColumn("score", F.col("doc_id").cast("double"))
    kept = sorted(r["doc_id"] for r in semantic_dedup_text(
        scored, "doc_id", "text", dim=16, k=2, tau=0.99,
        score_col="score").collect())
    assert kept == [3, 4, 5, 6, 7]  # highest-scoring member of {1,2,3}
