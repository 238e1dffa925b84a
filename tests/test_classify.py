"""Hashed linear text classifier (functions/classify.py): hand-computed
scores against a tiny model; the cross-engine value-exact check is the
driver oracle (entry classifier_scores)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

DIM = 1 << 16


def fid(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:7], 16) % DIM


def test_scores_hand_computed(spark):
    from nail_parquet_spark.functions.classify import linear_text_classifier

    docs = spark.createDataFrame(
        [(1, "Good GOOD prose"), (2, "bad"), (3, ""), (4, None),
         (5, "unseen words only")],
        "doc_id long, text string")
    w = {fid("good"): 2.0, fid("bad"): -3.0, fid("prose"): 1.0}
    weights = spark.createDataFrame(
        [(k, v) for k, v in w.items()], "feature_id long, weight double")
    got = {r["doc_id"]: r for r in
           linear_text_classifier(docs, "doc_id", "text", weights, DIM,
                                  bias=0.5).collect()}
    # doc 1: tokens good good prose -> (2+2+1)/3 + 0.5
    l1 = 0.5 + 5.0 / 3
    assert got[1]["logit"] == pytest.approx(l1)
    assert got[1]["score"] == pytest.approx(1 / (1 + math.exp(-l1)))
    assert got[1]["n_tokens"] == 3
    assert got[2]["logit"] == pytest.approx(0.5 - 3.0)
    # empty and NULL docs: logit = bias
    for i in (3, 4):
        assert got[i]["n_tokens"] == 0
        assert got[i]["logit"] == pytest.approx(0.5)
    # OOV-only doc: weights 0 (md5 collisions into the 3 trained ids are
    # possible in principle; these tokens don't collide)
    assert got[5]["logit"] == pytest.approx(0.5)
    assert len(got) == 5


def test_duplicate_weight_rows_sum(spark):
    from nail_parquet_spark.functions.classify import linear_text_classifier

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    weights = spark.createDataFrame(
        [(fid("x"), 1.0), (fid("x"), 0.5)], "feature_id long, weight double")
    r = linear_text_classifier(docs, "doc_id", "text", weights, DIM).first()
    assert r["logit"] == pytest.approx(1.5)


def test_filter_and_score_join(spark):
    from nail_parquet_spark.functions.classify import classify_filter

    docs = spark.createDataFrame(
        [(1, "good good"), (2, "bad bad")], "doc_id long, text string")
    weights = spark.createDataFrame(
        [(fid("good"), 4.0), (fid("bad"), -4.0)],
        "feature_id long, weight double")
    kept = classify_filter(docs, "doc_id", "text", weights, DIM)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    scored = classify_filter(docs, "doc_id", "text", weights, DIM,
                             keep_score=True)
    r = scored.first()
    assert r["doc_id"] == 1 and r["score"] > 0.9 and "text" in scored.columns


def test_plan_broadcasts_weights(spark):
    from nail_parquet_spark.functions.classify import linear_text_classifier
    from nail_parquet_spark.plans.explain import plan_text

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    weights = spark.createDataFrame([(0, 1.0)], "feature_id long, weight double")
    plan = plan_text(linear_text_classifier(docs, "doc_id", "text",
                                            weights, DIM))
    assert "BroadcastHashJoin" in plan


def test_cli_classify(spark, tmp_path):
    from nail_parquet_spark.cli import main

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "good text"), (2, "bad text")],
        "doc_id long, text string").write.parquet(docs)
    wp = str(tmp_path / "weights.parquet")
    spark.createDataFrame(
        [(fid("good"), 5.0), (fid("bad"), -5.0)],
        "feature_id long, weight double").write.parquet(wp)
    out = str(tmp_path / "scores.parquet")
    assert main(["quality", docs, "--mode", "classify", "--weights", wp,
                 "--dim", str(DIM), "-o", out]) == 0
    got = spark.read.parquet(out)
    assert {"doc_id", "n_tokens", "logit", "score"} <= set(got.columns)
    kept = str(tmp_path / "kept.parquet")
    assert main(["quality", docs, "--mode", "classify", "--weights", wp,
                 "--dim", str(DIM), "--remove", "-o", kept]) == 0
    assert [r["doc_id"] for r in spark.read.parquet(kept).collect()] == [1]
