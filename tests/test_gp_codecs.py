"""brotli/lz4/gzip as first-class block codecs + the pyarrow parquet
container sink/scan that makes brotli parquet writable without the JVM
codec jar (reference compression menu, optimize.rs:47-108).

The per-kind round-trip matrices in test_kernels.py already cover the new
codecs via VALID_CODECS; this file pins the level-suffix parsing, the
selector menu wiring, and the distributed brotli parquet path."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nail_parquet_spark.codec.kernels import decode_array, encode_array
from nail_parquet_spark.codec.select import candidate_codecs, codec_speed, column_stats
from nail_parquet_spark.sources.io import (
    read_parquet_arrow,
    write_data,
    write_parquet_arrow,
)

rng = np.random.default_rng(11)


@pytest.mark.parametrize("codec", ["brotli:2", "brotli:9", "zstd:6", "gzip:1"])
def test_level_suffix_roundtrip(codec):
    vals = pa.array([f"the quick brown fox {i % 37}" for i in range(4000)])
    blk = encode_array(vals, codec)
    assert blk.header["codec"] == codec.split(":")[0]
    assert blk.header["params"]["level"] == int(codec.split(":")[1])
    assert decode_array(blk).equals(vals)


def test_lz4_ignores_level():
    vals = pa.array([b"abc" * 50] * 1000, type=pa.binary())
    assert decode_array(encode_array(vals, "lz4")).equals(vals)


def test_selector_menu_has_new_tiers():
    sample = pa.array([f"word{i} common text body " * 4 for i in range(2000)])
    cands = candidate_codecs("str", column_stats(sample))
    assert "lz4" in cands and "brotli:9" in cands
    # speed classes: lz4 is the fastest general-purpose tier, brotli:9 the
    # slowest; an unlisted level variant falls back to its base class
    assert codec_speed("lz4") > codec_speed("zstd:1")
    assert codec_speed("brotli:9") < codec_speed("zstd:9")
    assert codec_speed("brotli:7") == codec_speed("brotli")


def test_balanced_policy_floor_excludes_brotli9():
    from nail_parquet_spark.codec.select import choose_codec

    sample = pa.array([f"the quick brown fox jumps {i % 101} over" * 3
                       for i in range(3000)])
    codec, _ = choose_codec(sample, policy="balanced", min_mbps=40.0)
    assert codec_speed(codec) >= 40.0


def test_write_parquet_arrow_brotli_roundtrip(spark, tmp_path):
    df = spark.range(0, 5000, 1, 4).selectExpr(
        "id", "concat('body ', id % 97) AS text",
        "cast(id % 5 as double) AS score")
    out = str(tmp_path / "brotli_pq")
    manifest = write_parquet_arrow(df, out, compression="brotli",
                                   compression_level=5)
    assert sum(m["n_rows"] for m in manifest) == 5000
    # the container really is brotli
    first = manifest[0]["file"]
    md = pq.ParquetFile(first).metadata
    assert md.row_group(0).column(0).compression == "BROTLI"
    back = read_parquet_arrow(spark, out)
    # nullability relaxes through a parquet round trip; names/types hold
    assert [(f.name, f.dataType) for f in back.schema] == \
        [(f.name, f.dataType) for f in df.schema]
    a = sorted(df.collect())
    b = sorted(back.collect())
    assert a == b


def test_write_data_routes_brotli(spark, tmp_path):
    df = spark.range(0, 100, 1, 2).selectExpr("id", "concat('x', id) AS s")
    out = str(tmp_path / "via_write_data")
    write_data(df, out, fmt="parquet", compression="brotli")
    back = read_parquet_arrow(spark, out)
    assert back.count() == 100
    assert sorted(r.s for r in back.collect()) == sorted(f"x{i}" for i in range(100))


def test_fc_distributed_roundtrip_on_sorted_urls(spark):
    """Front coding end to end: a url-sorted layout (what optimize
    --sort-by/--zorder-by produces) encodes the url column with fc and
    decodes bit-identical; the auto-selector picks fc on its own."""
    from pyspark.sql import functions as F

    from nail_parquet_spark.codec.decode import decode_table
    from nail_parquet_spark.codec.encode import encode_table

    df = (
        spark.range(0, 20000, 1, 4)
        .select(
            F.concat(
                F.lit("https://www.site"),
                F.lpad((F.col("id") % 37).cast("string"), 3, "0"),
                F.lit(".example.org/section/"),
                F.lpad((F.abs(F.xxhash64(F.col("id"))) % 100000).cast("string"), 5, "0"),
                F.lit("/page-"),
                F.col("id").cast("string"),
                F.lit(".html"),
            ).alias("url"),
            (F.col("id") % 1000).alias("k"),
        )
        .orderBy("url")
    )
    enc = encode_table(df, codecs={"url": "fc"})
    hdr = (enc.filter(F.col("column") == "url")
              .select("header").limit(1).collect()[0][0])
    assert '"codec":"fc"' in hdr
    dec = decode_table(enc, columns=["url", "k"])
    assert dec.exceptAll(df).count() == 0 and df.exceptAll(dec).count() == 0

    # auto path: sorted urls -> selector lands on fc via the trial
    enc_auto = encode_table(df.select("url"))
    hdr2 = enc_auto.select("header").limit(1).collect()[0][0]
    assert '"codec":"fc"' in hdr2
