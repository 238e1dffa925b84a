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
    return sorted((tuple(r) for r in df.select(*cols).collect()), key=repr)


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


# ---- key-stable sample with late materialization (decode_sample) ----

from nail_parquet_spark.codec.decode import decode_sample, decode_table  # noqa: E402


def lane(df, key, seed=0):
    ks = F.coalesce(F.col(key).cast("string"), F.lit("\x00"))
    return (F.conv(F.substring(
        F.md5(F.encode(F.concat(ks, F.lit(f":{seed}")), "UTF-8")), 1, 15),
        16, 10).cast("bigint").cast("double") / float(1 << 60))


def test_sample_matches_lane_model(spark, enc):
    df, blocks = enc
    got = rows_of(decode_sample(blocks, "k", 0.2, seed=3))
    want = rows_of(df.filter(lane(df, "k", 3) < 0.2))
    assert got == want and 0 < len(got) < 200


def test_sample_deterministic_and_seed_redeals(spark, enc):
    _, blocks = enc
    a = rows_of(decode_sample(blocks, "k", 0.15, seed=1))
    b = rows_of(decode_sample(blocks, "k", 0.15, seed=1))
    c = rows_of(decode_sample(blocks, "k", 0.15, seed=2))
    assert a == b and a != c


def test_sample_key_stable_duplicates_move_together(spark):
    rows = [(i % 5, f"s{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "k long, s string").repartition(2)
    blocks = encode_table(df, codecs={"k": "plain", "s": "zstd"},
                          block_rows=8).cache()
    got = decode_sample(blocks, "k", 0.5, seed=0, columns=["k"])
    counts = {r["k"]: r["n"] for r in
              got.groupBy("k").agg(F.count("*").alias("n")).collect()}
    # every picked key brings ALL 10 of its rows
    assert counts and all(n == 10 for n in counts.values())


def test_sample_null_keys_move_together(spark):
    rows = [(None, f"s{i}") for i in range(6)] + [(1, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "k long, s string").repartition(1)
    blocks = encode_table(df, codecs={"k": "plain", "s": "zstd"},
                          block_rows=4).cache()
    full = decode_table(blocks, columns=["k", "s"])
    for seed in range(4):
        got = decode_sample(blocks, "k", 0.5, seed=seed)
        n_null = got.filter(F.col("k").isNull()).count()
        assert n_null in (0, 6)
        want = rows_of(full.filter(lane(full, "k", seed) < 0.5),
                       cols=("k", "s"))
        assert rows_of(got, cols=("k", "s")) == want


def test_sample_fraction_bounds(spark, enc):
    df, blocks = enc
    assert decode_sample(blocks, "k", 0.0).count() == 0
    assert decode_sample(blocks, "k", 1.0).count() == 200
    with pytest.raises(ValueError, match="fraction"):
        decode_sample(blocks, "k", 1.5)


def test_cli_decode_sample(spark, tmp_path):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "src2.parquet")
    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)],
                               "k long, s string").repartition(1)
    df.write.parquet(src)
    enc_dir = str(tmp_path / "enc2")
    assert main(["optimize", src, "-o", enc_dir]) == 0
    out = str(tmp_path / "sampled.parquet")
    assert main(["decode", enc_dir, "--sample-keys", "k:0.3:7",
                 "-o", out]) == 0
    got = sorted(tuple(r) for r in
                 spark.read.parquet(out).select("k", "s").collect())
    want = sorted(tuple(r) for r in
                  df.filter(lane(df, "k", 7) < 0.3).collect())
    assert got == want


def test_cli_top_group_guard_fires_before_other_branches(spark, tmp_path):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "g2.parquet")
    spark.createDataFrame([(1, "a")], "k long, s string") \
        .repartition(1).write.parquet(src)
    enc_dir = str(tmp_path / "g2enc")
    assert main(["optimize", src, "-o", enc_dir]) == 0
    out = str(tmp_path / "g2out.parquet")
    # --top-group without --top must error even when another early-return
    # branch (--sample-keys) would otherwise swallow it
    with pytest.raises(SystemExit):
        main(["decode", enc_dir, "--sample-keys", "k:0.5",
              "--top-group", "s", "-o", out])
    with pytest.raises(SystemExit):
        main(["decode", enc_dir, "--top-group", "s", "-o", out])
