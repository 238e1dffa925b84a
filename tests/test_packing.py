"""Shard packing: pinned floor rule vs a driver-side model, budget bounds,
and the no-global-window plan guarantee."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.packing import pack_shards, shard_stats


def _docs(spark, n=500):
    return spark.range(0, n, 1, 8).selectExpr(
        "id AS doc_id", "cast(50 + id % 400 as bigint) AS n_tok")


def test_pack_shards_matches_model(spark):
    df = _docs(spark)
    got = {r.doc_id: r.shard_id
           for r in pack_shards(df, "n_tok", 3000, "doc_id").collect()}
    run = 0
    for i in range(500):
        assert got[i] == run // 3000, i
        run += 50 + i % 400
    assert len(set(got.values())) > 1


def test_shard_token_mass_within_one_doc_of_budget(spark):
    budget, max_doc = 3000, 449
    packed = pack_shards(_docs(spark), "n_tok", budget, "doc_id")
    stats = shard_stats(packed, "n_tok").orderBy("shard_id").collect()
    # every full shard (all but the last) holds budget +/- one max document
    for r in stats[:-1]:
        assert budget - max_doc <= r.n_tokens <= budget + max_doc, r
    assert sum(r.n_tokens for r in stats) == \
        sum(50 + i % 400 for i in range(500))
    assert sum(r.n_docs for r in stats) == 500


def test_pack_shards_no_global_window(spark):
    from nail_parquet_spark.plans.explain import global_windows

    packed = pack_shards(_docs(spark, 2000), "n_tok", 10_000, "doc_id")
    assert global_windows(packed) == []


def test_pack_shards_validates_budget(spark):
    with pytest.raises(ValueError, match="shard_tokens"):
        pack_shards(_docs(spark), "n_tok", 0, "doc_id")
