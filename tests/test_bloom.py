"""Per-block bloom-filter index: build/probe kernels, the SQL probe
expression's bit-exact parity with the Python twin, encode wiring, and
equality-pushdown pruning + exactness through decode_table_where."""
import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_probe_sql,
    expected_fpp,
)
from nail_parquet_spark.codec.decode import (
    decode_table_where,
    prune_blocks_bloom,
)
from nail_parquet_spark.codec.encode import encode_table

rng = np.random.default_rng(5)


def test_bloom_no_false_negatives_and_low_fpp():
    vals = pa.array([f"https://site{i}.com/p/{i * 7}" for i in range(5000)])
    b = bloom_build(vals)
    for v in vals.slice(0, 500).to_pylist():
        assert bloom_might_contain(b, v, "str")
    misses = sum(
        bloom_might_contain(b, f"https://absent{i}.org/x", "str")
        for i in range(2000))
    m_bits = int.from_bytes(b[1:5], "big")
    assert misses / 2000 < max(0.05, 3 * expected_fpp(5000, m_bits))


def test_bloom_int_and_unsupported_kinds():
    ints = pa.array(list(range(1000)), pa.int64())
    b = bloom_build(ints)
    assert bloom_might_contain(b, 7, "int")
    assert not all(bloom_might_contain(b, v, "int") for v in range(2000, 2050))
    assert bloom_build(pa.array([1.5, 2.5])) is None
    # all-null block: empty-domain bloom prunes every probe
    b0 = bloom_build(pa.array([None, None], pa.string()))
    assert not bloom_might_contain(b0, "x", "str")


def test_bloom_probe_sql_matches_python(spark):
    vals = pa.array([f"k{i}" for i in range(512)])
    b = bloom_build(vals)
    probes = [f"k{i}" for i in range(0, 512, 37)] + [f"absent{i}" for i in range(40)]
    df = spark.createDataFrame([(b,)], "bloom binary")
    for v in probes:
        got = df.select(F.expr(bloom_probe_sql("bloom", v, "str")).alias("m")) \
            .first()["m"]
        assert got == bloom_might_contain(b, v, "str"), v


def _blocks(spark, n=2000):
    df = spark.range(0, n, 1, 4).selectExpr(
        "id", "concat('https://h', id, '.com') AS url",
        "cast(id as double) AS score")
    return encode_table(df, bloom_columns=["url", "id"]), df


def test_encode_emits_blooms_only_for_requested(spark):
    blocks, _ = _blocks(spark)
    per_col = blocks.groupBy("column").agg(
        F.sum(F.when(F.col("bloom").isNull(), 0).otherwise(1)).alias("with_bloom"),
        F.count("*").alias("n")).collect()
    m = {r["column"]: r for r in per_col}
    assert m["url"].with_bloom == m["url"].n
    assert m["id"].with_bloom == m["id"].n
    assert m["score"].with_bloom == 0


def test_bloom_rejects_unencoded_column(spark):
    df = spark.range(10).selectExpr("id", "cast(id as string) AS s")
    with pytest.raises(ValueError, match="bloom_columns"):
        encode_table(df, columns=["id"], bloom_columns=["s"])


def test_prune_blocks_bloom_prunes_and_is_exact(spark):
    # 4 partitions x 1 block each; urls unique per block, so an equality
    # probe should survive in exactly ONE group
    blocks, df = _blocks(spark)
    blocks = blocks.cache()
    total = blocks.select("part_id", "block_id").distinct().count()
    kept = prune_blocks_bloom(blocks, "url", "https://h1500.com") \
        .select("part_id", "block_id").distinct().count()
    assert kept < total
    out = decode_table_where(blocks, "url", "=", "https://h1500.com",
                             columns=["id", "url"], file_keyed=False).collect()
    assert [(r.id, r.url) for r in out] == [(1500, "https://h1500.com")]
    # int probe through the conjunction path too
    out2 = decode_table_where(blocks, "id", "=", 42, columns=["id", "score"],
                              file_keyed=False).collect()
    assert [(r.id, r.score) for r in out2] == [(42, 42.0)]
    # absent value: everything pruned, empty result with the right schema
    out3 = decode_table_where(blocks, "url", "=", "https://absent.com",
                              columns=["id", "url"], file_keyed=False)
    assert out3.count() == 0 and out3.columns == ["id", "url"]
    blocks.unpersist()


def test_bloomless_blocks_unaffected(spark):
    df = spark.range(0, 100, 1, 2).selectExpr("id", "concat('u', id) AS u")
    blocks = encode_table(df)  # no bloom_columns
    out = decode_table_where(blocks, "u", "=", "u7", columns=["id", "u"],
                             file_keyed=False).collect()
    assert [(r.id, r.u) for r in out] == [(7, "u7")]
    # legacy dirs: a blocks table WITHOUT the bloom column at all
    legacy = blocks.drop("bloom")
    out2 = decode_table_where(legacy, "u", "=", "u7", columns=["id", "u"],
                              file_keyed=False).collect()
    assert [(r.id, r.u) for r in out2] == [(7, "u7")]


def test_prefix_bloom_build_and_twin():
    from nail_parquet_spark.codec.bloom import bloom_prefix_len_of

    vals = pa.array(
        [f"https://h{i % 50}.example.com/page/{i}" for i in range(3000)])
    b = bloom_build(vals, prefix_len=12)
    assert bloom_prefix_len_of(b) == 12
    # eq probes still work on the flagged layout
    assert bloom_might_contain(b, "https://h7.example.com/page/7", "str")
    assert sum(
        bloom_might_contain(b, f"https://zz{i}.org/x", "str")
        for i in range(500)) / 500 < 0.05
    # prefix probes: present host prefix hits, absent host mostly misses;
    # a query prefix LONGER than P truncates soundly (still hits)
    assert bloom_might_contain(b, "https://h7.e", "str", op="prefix")
    assert bloom_might_contain(b, "https://h7.example.com/", "str", op="prefix")
    assert sum(
        bloom_might_contain(b, f"https://zz{i}.org/some/long/path", "str",
                            op="prefix")
        for i in range(500)) / 500 < 0.05
    # query prefix shorter than P, or no-prefix bitmap: keep (never wrong)
    assert bloom_might_contain(b, "https:", "str", op="prefix")
    assert bloom_might_contain(bloom_build(vals), "https://zznope",
                               "str", op="prefix")
    with pytest.raises(ValueError):
        bloom_build(pa.array([1, 2], pa.int64()), prefix_len=8)


def test_prefix_probe_sql_matches_python(spark):
    from nail_parquet_spark.codec.bloom import bloom_prefix_probe_sql

    vals = pa.array([f"host{i:03d}/path/{i}" for i in range(256)])
    b12 = bloom_build(vals, prefix_len=12)
    b_plain = bloom_build(vals)
    df = spark.createDataFrame([(b12,), (b_plain,), (None,)], "bloom binary")
    probes = ([f"host{i:03d}/path/x"[:14] for i in range(0, 256, 41)]
              + [f"nope{i:03d}/path/zzz" for i in range(20)])
    for v in probes:
        sql = bloom_prefix_probe_sql("bloom", v, [12])
        got = [r["m"] for r in df.select(
            (F.col("bloom").isNull() | F.expr(sql)).alias("m")).collect()]
        want = [bloom_might_contain(x, v, "str", op="prefix")
                for x in (b12, b_plain, None)]
        assert got == want, v
    # unusable P (longer than every query prefix) -> no expression
    assert bloom_prefix_probe_sql("bloom", "ab", [12]) is None


def test_prefix_bloom_end_to_end_pruning(spark):
    # hosts repeat per block region; a host-prefix probe should prune to a
    # strict subset of blocks and stay value-exact
    df = spark.range(0, 4000, 1, 4).selectExpr(
        "id", "concat('https://h', cast(id div 1000 as string), "
        "'.example.com/p/', id) AS url")
    blocks = encode_table(df, bloom_columns=["url:18"]).cache()
    total = blocks.select("part_id", "block_id").distinct().count()
    kept = prune_blocks_bloom(
        blocks, "url", "https://h2.example.com/", op="prefix"
    ).select("part_id", "block_id").distinct().count()
    assert kept < total
    out = decode_table_where(blocks, "url", "prefix", "https://h2.example.com/",
                             columns=["id", "url"], file_keyed=False)
    ids = sorted(r.id for r in out.collect())
    assert ids == list(range(2000, 3000))
    # dict-spec form + conjunction path stays exact with an absent prefix
    out2 = decode_table_where(blocks, "url", "prefix", "https://nope.com/",
                              columns=["id"], file_keyed=False)
    assert out2.count() == 0
    blocks.unpersist()
