"""Z-order clustering (pipeline/zorder.py): multi-column zone-map pruning."""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.decode import decode_table_where, prune_blocks
from nail_parquet_spark.codec.encode import encode_table
from nail_parquet_spark.pipeline.zorder import zorder_sort, zorder_value


def n_groups(blocks):
    return blocks.select("part_id", "block_id").distinct().count()


@pytest.fixture(scope="module")
def grid(spark):
    """4096 rows over a 64x64 (x, y) grid in hash-shuffled order — no
    natural clustering in either column."""
    return (
        spark.range(4096)
        .select(
            (F.col("id") % 64).cast("long").alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.concat(F.lit("h"), (F.xxhash64("id") % 8).cast("string")).alias("s"),
        )
        .repartition(8)  # destroys incidental order
    )


class TestZorder:
    def test_both_dimensions_prune(self, spark, grid):
        # n_partitions=1 pins a deterministic layout: 16 blocks = aligned
        # 16x16 Morton tiles (repartitionByRange's sampled boundaries vary
        # with rdd.id across test order, which can misalign block/tile
        # edges and widen a block's zone ranges by one tile)
        zdf = zorder_sort(grid, ["x", "y"], bits=6, n_partitions=1)
        blocks = encode_table(zdf, columns=["x", "y"], block_rows=256).cache()
        total = n_groups(blocks)
        assert total == 16
        # an equality slice in either dimension touches exactly the 4
        # blocks whose 16x16 tile covers that coordinate
        px = n_groups(prune_blocks(blocks, "x", "=", 17))
        py = n_groups(prune_blocks(blocks, "y", "=", 42))
        assert px == 4
        assert py == 4

        # single-column sort clusters x but NOT y — the case z-order fixes
        sdf = grid.repartition(1).sortWithinPartitions("x", "y")
        sblocks = encode_table(sdf, columns=["x", "y"], block_rows=256).cache()
        sy = n_groups(prune_blocks(sblocks, "y", "=", 42))
        assert sy == n_groups(sblocks)  # every block spans all of y
        assert py < sy

    def test_pruned_decode_exact(self, spark, grid):
        zdf = zorder_sort(grid, ["x", "y"], bits=6, n_partitions=4)
        blocks = encode_table(zdf, columns=["x", "y"], block_rows=256)
        got = decode_table_where(blocks, "y", "=", 42).collect()
        assert sorted((r["x"], r["y"]) for r in got) == \
            sorted((i, 42) for i in range(64))

    def test_uncached_chain_is_deterministic(self, spark, grid):
        """Regression: decode_table_where runs several jobs over the
        blocks plan (header read, prune collect, payload decode). The old
        repartitionByRange layout re-sampled boundaries per job (seeded by
        the rdd id), so an UNCACHED encode chain could shift rows between
        groups mid-query and silently drop/duplicate rows — order-dependent
        across a test session. The z-slice partitioner is a pure per-row
        function, so the same uncached chain now decodes exactly, every
        evaluation."""
        zdf = zorder_sort(grid, ["x", "y"], bits=6, n_partitions=4)
        blocks = encode_table(zdf, columns=["x", "y"], block_rows=256)
        want = sorted((i, 17) for i in range(64))
        for _ in range(3):  # re-plans the whole chain each time
            got = decode_table_where(blocks, "y", "=", 17).collect()
            assert sorted((r["x"], r["y"]) for r in got) == want

    def test_string_dimension_decodes_exactly(self, spark, grid):
        # hashed string buckets keep equal values z-adjacent but Morton's
        # low-bit cycling still mixes buckets within a block — equality
        # pruning for string dims is the bloom index's job (codec/bloom.py,
        # documented in zorder.py); zone-map correctness must still hold
        zdf = zorder_sort(grid, ["s", "x"], bits=3, n_partitions=2)
        blocks = encode_table(zdf, columns=["s", "x"], block_rows=256)
        want = sorted((r["s"], r["x"]) for r in
                      grid.filter(F.col("s") == "h3").select("s", "x").collect())
        got = sorted((r["s"], r["x"]) for r in
                     decode_table_where(blocks, "s", "=", "h3").collect())
        assert got == want and len(want) > 0

    def test_constant_and_null_columns(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, None)], "a long, b double")
        z = df.withColumn("z", zorder_value(df, ["a", "b"], bits=4))
        assert z.count() == 3  # all-NULL / constant columns code to 0

    def test_overflow_guard(self, spark, grid):
        with pytest.raises(ValueError):
            zorder_value(grid, ["x"] * 9, bits=8)


def test_cli_optimize_zorder(spark, tmp_path):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "src.parquet")
    (spark.range(2048)
     .select((F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y"))
     .repartition(4).write.parquet(src))
    out = str(tmp_path / "blocks")
    assert main(["optimize", src, "--zorder-by", "x,y", "-o", out,
                 "--validate"]) == 0
    blocks = spark.read.parquet(out)
    total = n_groups(blocks)
    pruned = n_groups(prune_blocks(blocks, "y", "=", 5))
    assert pruned < total


class TestQuantileScheme:
    def test_quantile_buckets_balance_skew(self, spark):
        # lognormal-ish skew: 90% of mass below 10, a long tail to 10^6.
        # width buckets put ~everything in bucket 0; quantile buckets
        # spread rows across codes so Morton keeps the dimension.
        df = spark.range(4000).select(
            F.when(F.col("id") % 10 < 9, F.col("id") % 10)
             .otherwise((F.col("id") % 100) * 10000 + 1).cast("double").alias("v"))
        wcodes = df.select(zorder_value(df, ["v"], bits=4, scheme="width").alias("z"))
        qcodes = df.select(zorder_value(df, ["v"], bits=4, scheme="quantile").alias("z"))
        w_top = wcodes.groupBy("z").count().agg(F.max("count")).collect()[0][0]
        q_top = qcodes.groupBy("z").count().agg(F.max("count")).collect()[0][0]
        assert w_top >= 3500          # width collapses the skewed dim
        assert q_top <= 1500          # equi-depth spreads it
        assert qcodes.distinct().count() >= 8

    def test_quantile_sort_decodes_exactly(self, spark):
        df = spark.range(2000).select(
            (F.col("id") % 7).cast("double").alias("v"),
            F.col("id").alias("k"))
        zdf = zorder_sort(df, ["v"], bits=3, n_partitions=1, scheme="quantile")
        blocks = encode_table(zdf, block_rows=256)
        got = decode_table_where(blocks, "v", ">=", 5.0).agg(F.count("k")).collect()[0][0]
        assert got == df.filter("v >= 5").count()

    def test_quantile_null_and_bad_scheme(self, spark):
        df = spark.range(10).select(F.lit(None).cast("double").alias("v"))
        assert df.select(zorder_value(df, ["v"], bits=3, scheme="quantile")).distinct().count() == 1
        with pytest.raises(ValueError):
            zorder_value(df, ["v"], scheme="bogus")
