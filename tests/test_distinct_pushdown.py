"""distinct_pushdown: exact DISTINCT from dictionary sections only.

The fast path must equal df.select(col).distinct() bit-for-bit, include
NULL membership from metadata, fall back to a per-block decode for
non-dictionary codecs, and route xref columns through the grouped decoder.
"""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.encode import encode_table
from nail_parquet_spark.codec.inspect import distinct_pushdown


def _vals(df):
    return sorted((r[0] for r in df.collect()),
                  key=lambda v: (v is None, v))


class TestDistinctPushdown:
    def test_str_dict_with_nulls_dict_only(self, spark):
        df = spark.createDataFrame(
            [("en",), ("fr",), (None,), ("en",), ("de",), (None,)] * 50,
            "lang string")
        blocks = encode_table(df, codecs={"lang": "dict"}, block_rows=64)
        got = distinct_pushdown(blocks, "lang", dict_only=True)
        assert _vals(got) == _vals(df.select("lang").distinct())
        assert _vals(got)[-1] is None  # NULL membership from metadata

    def test_str_rle_dict_only(self, spark):
        df = spark.createDataFrame(
            [("a" * (i % 3 + 1),) for i in range(300)], "s string")
        blocks = encode_table(df, codecs={"s": "rle"}, block_rows=64)
        got = distinct_pushdown(blocks, "s", dict_only=True)
        assert _vals(got) == ["a", "aa", "aaa"]

    def test_int_dict_no_nulls_dict_only(self, spark):
        df = spark.createDataFrame([(i % 7,) for i in range(400)], "k long")
        blocks = encode_table(df, codecs={"k": "dict"}, block_rows=128)
        got = distinct_pushdown(blocks, "k", dict_only=True)
        assert _vals(got) == list(range(7))

    def test_int_dict_with_nulls_falls_back_exactly(self, spark):
        # encoder null-fills with 0 before building the dictionary, so a
        # null-bearing block's dict may contain a spurious 0 — the fast
        # path must refuse it and the fallback must stay exact (no 0!)
        df = spark.createDataFrame(
            [(i % 5 + 1,) if i % 4 else (None,) for i in range(200)],
            "k long")
        blocks = encode_table(df, codecs={"k": "dict"}, block_rows=64)
        with pytest.raises(ValueError, match="dictionary sections"):
            distinct_pushdown(blocks, "k", dict_only=True)
        got = distinct_pushdown(blocks, "k")
        assert _vals(got) == _vals(df.select("k").distinct())
        assert 0 not in _vals(got)

    def test_plain_codec_falls_back(self, spark):
        df = spark.createDataFrame([(float(i % 9) / 4,) for i in range(150)],
                                   "x double")
        blocks = encode_table(df, codecs={"x": "plain"}, block_rows=64)
        with pytest.raises(ValueError, match="not servable"):
            distinct_pushdown(blocks, "x", dict_only=True)
        got = distinct_pushdown(blocks, "x")
        assert _vals(got) == _vals(df.select("x").distinct())

    def test_xref_column_routes_through_group_decode(self, spark):
        df = spark.createDataFrame(
            [(f"t{i % 4}", f"<html>t{i % 4}</html>") for i in range(200)],
            "text string, html string")
        blocks = encode_table(
            df, codecs={"text": "zstd", "html": "xref:text"}, block_rows=64)
        with pytest.raises(ValueError, match="xref"):
            distinct_pushdown(blocks, "html", dict_only=True)
        got = distinct_pushdown(blocks, "html")
        assert _vals(got) == _vals(df.select("html").distinct())

    def test_timestamp_dict_typed(self, spark):
        df = spark.sql(
            "SELECT timestamp'2024-01-01 00:00:00' + make_interval("
            "0,0,0,0,0,0, id % 3) AS ts FROM range(90)")
        blocks = encode_table(df, codecs={"ts": "dict"}, block_rows=32)
        got = distinct_pushdown(blocks, "ts", dict_only=True)
        assert got.schema["ts"].dataType.simpleString() == "timestamp"
        assert _vals(got) == _vals(df.select("ts").distinct())

    def test_auto_selected_codec_stays_exact(self, spark):
        # whatever the selector picks (zstd wins on this highly repetitive
        # column), the pushdown must stay exact via its per-block fallback
        df = spark.createDataFrame(
            [(["en", "fr", "de", "es", "zh"][i % 5],) for i in range(5000)],
            "lang string")
        blocks = encode_table(df, block_rows=1024)
        got = distinct_pushdown(blocks, "lang")
        assert _vals(got) == ["de", "en", "es", "fr", "zh"]

    def test_unknown_column_raises(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        blocks = encode_table(df, codecs={"a": "dict"}, block_rows=8)
        with pytest.raises(ValueError, match="not in the blocks table"):
            distinct_pushdown(blocks, "nope")


class TestFrequencyPushdown:
    def _want(self, df, col):
        rows = (df.groupBy(F.col(col).alias("value"))
                .agg(F.count(F.lit(1)).alias("n")).collect())
        return sorted(((r["value"], r["n"]) for r in rows),
                      key=lambda t: (t[0] is None, t[0]))

    def _got(self, fdf):
        return sorted(((r["value"], r["n"]) for r in fdf.collect()),
                      key=lambda t: (t[0] is None, t[0]))

    def test_str_dict_with_nulls_codes_only(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame(
            [("en",)] * 70 + [("fr",)] * 20 + [(None,)] * 10, "lang string")
        blocks = encode_table(df, codecs={"lang": "dict"}, block_rows=16)
        got = frequency_pushdown(blocks, "lang", dict_only=True)
        assert self._got(got) == self._want(df, "lang")
        assert (None, 10) in self._got(got)

    def test_str_rle_runs_only(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame(
            [("a" * (i // 40 % 3 + 1),) for i in range(240)]
            + [(None,)] * 7, "s string")
        blocks = encode_table(df, codecs={"s": "rle"}, block_rows=64)
        got = frequency_pushdown(blocks, "s", dict_only=True)
        assert self._got(got) == self._want(df, "s")

    def test_int_dict_and_rle_null_fill_correction(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        # nulls AND genuine zeros in the same column: the fill-0 correction
        # must subtract exactly null_count from the 0 bucket, nothing more
        rows = [(0,)] * 12 + [(5,)] * 30 + [(None,)] * 8 + [(7,)] * 13
        df = spark.createDataFrame(rows, "k long")
        for codec in ("dict", "rle"):
            blocks = encode_table(df, codecs={"k": codec}, block_rows=32)
            got = frequency_pushdown(blocks, "k", dict_only=True)
            assert self._got(got) == self._want(df, "k"), codec

    def test_int_all_null_block(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame([(None,)] * 40, "k long")
        blocks = encode_table(df, codecs={"k": "dict"}, block_rows=16)
        got = frequency_pushdown(blocks, "k")
        assert self._got(got) == [(None, 40)]

    def test_float_dict_bitdict(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        rows = [(0.0,)] * 5 + [(1.5,)] * 9 + [(None,)] * 4 + [(-2.25,)] * 2
        df = spark.createDataFrame(rows, "x double")
        blocks = encode_table(df, codecs={"x": "dict"}, block_rows=8)
        got = frequency_pushdown(blocks, "x", dict_only=True)
        assert self._got(got) == self._want(df, "x")

    def test_fallback_codec_exact_and_dict_only_raises(self, spark):
        import pytest as _pytest

        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame(
            [(i % 6,) for i in range(200)] + [(None,)] * 5, "k long")
        blocks = encode_table(df, codecs={"k": "for_bitpack"}, block_rows=64)
        with _pytest.raises(ValueError, match="not servable"):
            frequency_pushdown(blocks, "k", dict_only=True)
        got = frequency_pushdown(blocks, "k")
        assert self._got(got) == self._want(df, "k")

    def test_xref_falls_back_via_group_decode(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame(
            [(f"t{i % 3}", f"<p>t{i % 3}</p>") for i in range(90)],
            "text string, html string")
        blocks = encode_table(
            df, codecs={"text": "zstd", "html": "xref:text"}, block_rows=32)
        got = frequency_pushdown(blocks, "html")
        assert self._got(got) == self._want(df, "html")

    def test_binary_dict(self, spark):
        from nail_parquet_spark.codec.inspect import frequency_pushdown

        df = spark.createDataFrame(
            [(bytes([i % 4]) * 3,) for i in range(100)], "b binary")
        blocks = encode_table(df, codecs={"b": "dict"}, block_rows=32)
        got = frequency_pushdown(blocks, "b", dict_only=True)
        assert self._got(got) == self._want(df, "b")
