"""Late-materialization lookup join (codec/decode.decode_semijoin)."""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.decode import decode_semijoin
from nail_parquet_spark.codec.encode import encode_table


@pytest.fixture(scope="module")
def enc(spark):
    # keys clustered so zone maps are selective (a real ingest layout)
    rows = [(i, f"u{i:04d}", i * 3 % 101) for i in range(200)]
    df = (spark.createDataFrame(rows, "k long, u string, v long")
          .repartition(1).sortWithinPartitions("k"))
    blocks = encode_table(
        df, codecs={"k": "for_bitpack", "u": "dict", "v": "plain"},
        block_rows=20)
    return df, blocks.cache()


def rows_of(df, cols=("k", "u", "v")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_semijoin_int_key(spark, enc):
    df, blocks = enc
    probe = spark.createDataFrame([(5,), (42,), (199,), (9999,)], "k long")
    got = rows_of(decode_semijoin(blocks, probe, "k"))
    want = rows_of(df.filter(F.col("k").isin(5, 42, 199)))
    assert got == want


def test_semijoin_string_key_and_dup_probe(spark, enc):
    df, blocks = enc
    probe = spark.createDataFrame(
        [("u0007",), ("u0007",), ("u0150",)], "u string")
    got = rows_of(decode_semijoin(blocks, probe, "u"))
    want = rows_of(df.filter(F.col("u").isin("u0007", "u0150")))
    assert got == want


def test_semijoin_dup_table_keys_each_row_once(spark):
    rows = [(1, "a"), (1, "b"), (2, "c"), (3, "d")]
    df = spark.createDataFrame(rows, "k long, s string").repartition(1)
    blocks = encode_table(df, codecs={"k": "plain", "s": "zstd"},
                          block_rows=2)
    probe = spark.createDataFrame([(1,)], "k long")
    got = rows_of(decode_semijoin(blocks, probe, "k"), cols=("k", "s"))
    assert got == [(1, "a"), (1, "b")]


def test_semijoin_null_keys_never_match(spark):
    rows = [(None, "x"), (1, "y"), (2, "z")]
    df = spark.createDataFrame(rows, "k long, s string").repartition(1)
    blocks = encode_table(df, codecs={"k": "plain", "s": "zstd"},
                          block_rows=2)
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    got = rows_of(decode_semijoin(blocks, probe, "k"), cols=("k", "s"))
    assert got == [(1, "y")]


def test_semijoin_empty_probe(spark, enc):
    _, blocks = enc
    probe = spark.createDataFrame([], "k long")
    out = decode_semijoin(blocks, probe, "k")
    assert out.count() == 0
    assert sorted(out.columns) == ["k", "u", "v"]


def test_semijoin_no_match(spark, enc):
    _, blocks = enc
    probe = spark.createDataFrame([(7777,)], "k long")
    assert decode_semijoin(blocks, probe, "k").count() == 0


def test_semijoin_large_probe_skips_inline_prune(spark, enc):
    df, blocks = enc
    vals = list(range(0, 200, 2)) + [10_000 + i for i in range(30)]
    probe = spark.createDataFrame([(v,) for v in vals], "k long")
    got = rows_of(decode_semijoin(blocks, probe, "k", inline_keys_max=16))
    want = rows_of(df.filter(F.col("k").isin(vals)))
    assert got == want


def test_semijoin_single_column_probe_renamed(spark, enc):
    df, blocks = enc
    probe = spark.createDataFrame([(3,), (4,)], "other long")
    got = rows_of(decode_semijoin(blocks, probe, "k"))
    want = rows_of(df.filter(F.col("k").isin(3, 4)))
    assert got == want


def test_semijoin_column_subset(spark, enc):
    df, blocks = enc
    probe = spark.createDataFrame([(11,), (12,)], "k long")
    out = decode_semijoin(blocks, probe, "k", columns=["u"])
    assert out.columns == ["u"]
    assert sorted(r[0] for r in out.collect()) == ["u0011", "u0012"]


def test_semijoin_validation(spark, enc):
    _, blocks = enc
    with pytest.raises(ValueError, match="not in the blocks"):
        decode_semijoin(blocks, spark.range(1), "nope")
    multi = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="no 'k' column"):
        decode_semijoin(blocks, multi, "k")


def test_cli_decode_semijoin(spark, tmp_path):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "src.parquet")
    rows = [(i, f"s{i}") for i in range(50)]
    (spark.createDataFrame(rows, "k long, s string")
     .repartition(1).sortWithinPartitions("k").write.parquet(src))
    enc_dir = str(tmp_path / "enc")
    assert main(["optimize", src, "-o", enc_dir]) == 0
    probe_path = str(tmp_path / "probe.parquet")
    spark.createDataFrame([(7,), (31,)], "k long").write.parquet(probe_path)
    out = str(tmp_path / "hits.parquet")
    assert main(["decode", enc_dir, "--semi-join", f"k@{probe_path}",
                 "-o", out]) == 0
    got = sorted(tuple(r) for r in
                 spark.read.parquet(out).select("k", "s").collect())
    assert got == [(7, "s7"), (31, "s31")]


def test_semijoin_applies_deletes(spark, enc):
    from nail_parquet_spark.codec.deletes import positions_where

    df, blocks = enc
    dels = positions_where(blocks, [("k", "<", 10)])
    probe = spark.createDataFrame([(5,), (42,)], "k long")
    got = rows_of(decode_semijoin(blocks, probe, "k", deletes=dels))
    # k=5 is deleted, only k=42 survives
    want = rows_of(df.filter(F.col("k") == 42))
    assert got == want


def test_cli_semijoin_snapshot_table_mor(spark, tmp_path):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.pipeline.checkpoint import encode_resumable
    from nail_parquet_spark.pipeline.deletes import delete_where

    src = str(tmp_path / "ssrc")
    (spark.createDataFrame([(i, f"s{i}") for i in range(30)],
                           "k long, s string")
     .repartition(1).sortWithinPartitions("k").write.parquet(src))
    out = str(tmp_path / "senc")
    encode_resumable(spark, src, out)
    delete_where(spark, out, [("k", "=", 7)])
    probe_path = str(tmp_path / "probe.parquet")
    spark.createDataFrame([(7,), (8,)], "k long").write.parquet(probe_path)
    dst = str(tmp_path / "hits.parquet")
    assert main(["decode", out, "--semi-join", f"k@{probe_path}",
                 "-o", dst]) == 0
    got = [tuple(r) for r in spark.read.parquet(dst)
           .select("k", "s").collect()]
    assert got == [(8, "s8")]  # the deleted k=7 row must NOT resurface
