"""pre_grouped decode (r06): skipping the co-locating shuffle is
bit-identical on encode-output-shaped plans, and a violated adjacency
assumption refuses loudly instead of mis-decoding."""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.decode import (
    decode_sample,
    decode_table,
    decode_table_where,
    decode_topk,
)
from nail_parquet_spark.codec.encode import encode_table


@pytest.fixture(scope="module")
def enc(spark):
    df = (
        spark.range(200)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 7 % 100).cast("double").alias("v"),
            F.concat(F.lit("s"), F.format_string("%04d", F.col("id"))).alias("s"),
        )
        .repartition(3)
        .sortWithinPartitions("k")
    )
    blocks = encode_table(
        df, codecs={"k": "for_bitpack", "v": "plain", "s": "zstd"},
        block_rows=16).cache()
    blocks.count()
    return df, blocks


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("k").collect()]


def test_pre_grouped_decode_identical(spark, enc):
    df, blocks = enc
    base = decode_table(blocks, columns=["k", "v", "s"])
    fast = decode_table(blocks, columns=["k", "v", "s"], pre_grouped=True)
    assert _sorted_rows(base) == _sorted_rows(fast)
    # and the decode-side shuffle really is gone: the live plan above the
    # cache boundary is a pure map (the cached InMemoryRelation's RECORDED
    # lineage still prints the encode's own exchange — not re-executed)
    from nail_parquet_spark.plans.explain import plan_text

    live = lambda df: plan_text(df).split("InMemoryRelation")[0]  # noqa: E731
    assert "Exchange" in live(base)
    assert "Exchange" not in live(fast)


def test_pre_grouped_survives_pair_filters(spark, enc):
    df, blocks = enc
    # a narrow pair filter (the pushdown shape) keeps adjacency
    sub = blocks.filter(F.col("block_id").isin([0, 2, 3]))
    base = decode_table(sub, columns=["k", "v"])
    fast = decode_table(sub, columns=["k", "v"], pre_grouped=True)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, fast.collect()))


def test_pre_grouped_operators_match_default(spark, enc):
    df, blocks = enc
    top_a = decode_topk(blocks, "v", 7, tiebreak="k").collect()
    top_b = decode_topk(blocks, "v", 7, tiebreak="k",
                        pre_grouped=True).collect()
    assert [tuple(r) for r in top_a] == [tuple(r) for r in top_b]

    wa = decode_table_where(blocks, "k", ">=", 150)
    wb = decode_table_where(blocks, "k", ">=", 150, pre_grouped=True)
    assert _sorted_rows(wa) == _sorted_rows(wb)

    sa = decode_sample(blocks, "k", 0.25, seed=3)
    sb = decode_sample(blocks, "k", 0.25, seed=3, pre_grouped=True)
    assert _sorted_rows(sa) == _sorted_rows(sb)


def test_pre_grouped_refuses_scrambled_blocks(spark, enc):
    df, blocks = enc
    # a round-robin repartition breaks group adjacency: the strict group
    # assembly must refuse loudly, never return wrong rows
    scrambled = blocks.repartition(7).cache()
    scrambled.count()
    with pytest.raises(Exception, match="missing|column"):
        decode_table(scrambled, columns=["k", "v", "s"],
                     pre_grouped=True).collect()
    scrambled.unpersist()
