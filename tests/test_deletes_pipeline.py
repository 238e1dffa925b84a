"""Snapshot-committed deletes / upserts / purge (pipeline/deletes.py)."""

import os

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.codec.decode import decode_table
from nail_parquet_spark.pipeline.checkpoint import (
    encode_resumable,
    read_blocks_at,
    remove_orphan_files,
    snapshots,
)
from nail_parquet_spark.pipeline.deletes import (
    committed_deletes,
    delete_keys,
    delete_where,
    equality_delete_records,
    equality_positions,
    purge_deletes,
    read_deletes,
    read_table,
    upsert,
)


def _mk_table(spark, path, n=120):
    df = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 6).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("body-"), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 11 == 0, None)
         .otherwise((F.col("id") % 3).cast("string")).alias("lang"),
    )
    # range layout: low/mid/high k live in separate files, so a k-range
    # delete touches a minority of block groups (the purge test pins that)
    df.repartitionByRange(3, "k").sortWithinPartitions("k").write.parquet(path)
    return df


@pytest.fixture()
def table(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "enc")
    df = _mk_table(spark, src)
    rep = encode_resumable(spark, src, out, units_per_job=2)
    assert rep["completed"] > 0
    return df, out


def test_delete_where_merge_on_read(spark, table):
    df, out = table
    pre_snap = snapshots(out)[-1]["snapshot"]
    rep = delete_where(spark, out, [("k", "<", 30)], note="trim old crawl")
    assert rep["committed"] and rep["deleted"] == 30
    got = read_table(spark, out)
    assert got.count() == 90
    assert got.agg(F.min("k")).first()[0] == 30
    # audit view still has everything; so does time travel pre-delete
    assert read_table(spark, out, apply_deletes=False).count() == 120
    assert read_table(spark, out, snapshot_id=pre_snap).count() == 120
    # second delete accumulates; NULL-predicate rows survive (3VL)
    rep2 = delete_where(spark, out, [("lang", "=", "0")])
    want = df.filter(F.col("k") >= 30).filter(
        ~(F.col("lang") == "0") | F.col("lang").isNull()).count()
    assert read_table(spark, out).count() == want
    assert len(committed_deletes(out)) == 2
    assert rep2["snapshot"] > rep["snapshot"]


def test_delete_where_no_match_commits_nothing(spark, table):
    df, out = table
    n_snap = len(snapshots(out))
    rep = delete_where(spark, out, [("k", ">", 10_000)])
    assert rep == {"deleted": 0, "delete_id": None, "snapshot": None,
                   "committed": False}
    assert len(snapshots(out)) == n_snap
    assert read_deletes(spark, out) is None
    assert read_table(spark, out).count() == 120


def test_upsert_replaces_by_key_and_inserts(spark, table):
    df, out = table
    new = spark.createDataFrame(
        [("https://h0.test/p0", 0, "recrawled-0", "9"),
         ("https://brand.new/x", 999, "fresh", "9")],
        "url string, k long, text string, lang string")
    rep = upsert(spark, out, new, key="url", note="recrawl 2026-08")
    assert rep["inserted"] == 2 and rep["replaced"] == 1
    got = read_table(spark, out)
    assert got.count() == 121  # 120 - 1 replaced + 2 new
    rows = {r.url: r for r in got.collect()}
    assert rows["https://h0.test/p0"].text == "recrawled-0"
    assert rows["https://brand.new/x"].k == 999
    # one atomic snapshot carries both sides
    s = snapshots(out)[-1]
    assert s["kind"] == "upsert" and s["delete"] is not None
    # time travel to just before the upsert: old row back, new row gone
    old = read_table(spark, out, snapshot_id=s["snapshot"] - 1)
    orows = {r.url: r for r in old.collect()}
    assert orows["https://h0.test/p0"].text == "body-0"
    assert "https://brand.new/x" not in orows


def test_upsert_guards(spark, table):
    df, out = table
    dup = spark.createDataFrame(
        [("u", 1, "a", "x"), ("u", 2, "b", "x")],
        "url string, k long, text string, lang string")
    with pytest.raises(ValueError, match="not unique on the key"):
        upsert(spark, out, dup, key="url")
    bad_schema = spark.createDataFrame([("u", 1)], "url string, k long")
    with pytest.raises(ValueError, match="must equal the table's columns"):
        upsert(spark, out, bad_schema, key="url")
    with pytest.raises(ValueError, match="key columns not in rows"):
        upsert(spark, out, dup.limit(1), key="nope")


def test_upsert_batch_survives_orphan_gc(spark, table):
    df, out = table
    new = spark.createDataFrame(
        [("https://brand.new/y", 1000, "fresh", "9")],
        "url string, k long, text string, lang string")
    upsert(spark, out, new, key="url")
    rep = remove_orphan_files(out, dry_run=True)
    assert rep["orphans"] == []  # the snapshot-committed upsert batch is live
    assert read_table(spark, out).count() == 121


def test_purge_applies_and_preserves_untouched(spark, table, tmp_path):
    df, out = table
    delete_where(spark, out, [("k", ">=", 100)])
    upsert(spark, out, spark.createDataFrame(
        [("https://h1.test/p1", 1, "recrawled-1", "9")],
        "url string, k long, text string, lang string"), key="url")
    want = read_table(spark, out).collect()
    new_dir = str(tmp_path / "purged")
    rep = purge_deletes(spark, out, new_dir, num_files=4)
    assert rep["rows_deleted"] == len(
        read_table(spark, out, apply_deletes=False).collect()) - len(want)
    got = decode_table(spark.read.parquet(new_dir)).collect()

    def canon(rows):
        return sorted(tuple(sorted(r.asDict().items())) for r in rows)

    assert canon(got) == canon(want)
    # only the delete-touched groups were re-encoded
    n_groups = (spark.read.parquet(out).select("part_id", "block_id")
                .distinct().count())
    assert 0 < rep["groups_affected"] < n_groups
    # purge output has no snapshot/delete log: it's a plain blocks dir
    assert not os.path.exists(os.path.join(new_dir, "_snapshots"))


def test_purge_refuses_without_deletes_or_inside_table(spark, table, tmp_path):
    df, out = table
    with pytest.raises(ValueError, match="no committed deletes"):
        purge_deletes(spark, out, str(tmp_path / "x"))
    delete_where(spark, out, [("k", "=", 5)])
    with pytest.raises(ValueError, match="OUTSIDE"):
        purge_deletes(spark, out, os.path.join(out, "nested"))


def test_delete_keys_sequence_rule(spark, table):
    """Equality delete kills only rows committed strictly before it;
    a later re-insert of the same key survives (Iceberg v2 sequence rule)."""
    df, out = table
    keys = spark.createDataFrame(
        [("https://h0.test/p0",), ("https://h1.test/p7",)], "url string")
    rep = delete_keys(spark, out, keys, note="takedown")
    assert rep["committed"] and rep["deleted_keys"] == 2
    assert rep["eq_cols"] == ["url"]
    got = read_table(spark, out)
    assert got.count() == 118
    assert got.filter(F.col("url") == "https://h0.test/p0").count() == 0
    # time travel before the delete: rows back
    assert read_table(spark, out, snapshot_id=rep["snapshot"] - 1).count() == 120
    # re-insert one deleted key via upsert (later snapshot) -> it SURVIVES
    new = spark.createDataFrame(
        [("https://h0.test/p0", 0, "reinserted", "9")],
        "url string, k long, text string, lang string")
    upsert(spark, out, new, key="url")
    got2 = read_table(spark, out)
    assert got2.count() == 119
    assert got2.filter(F.col("url") == "https://h0.test/p0") \
               .first().text == "reinserted"
    # and the other deleted key stays dead
    assert got2.filter(F.col("url") == "https://h1.test/p7").count() == 0
    # a SECOND eq delete of the reinserted key kills it again
    delete_keys(spark, out, spark.createDataFrame(
        [("https://h0.test/p0",)], "url string"))
    assert read_table(spark, out).count() == 118


def test_delete_keys_null_safe_and_multi_column(spark, table):
    df, out = table
    # lang is NULL for k % 11 == 0; NULL = NULL matches (Iceberg semantics)
    keys = spark.createDataFrame([(None,)], "lang string")
    rep = delete_keys(spark, out, keys)
    n_null = df.filter(F.col("lang").isNull()).count()
    assert n_null > 0
    assert read_table(spark, out).count() == 120 - n_null
    # multi-column key: (url, lang) pair must match BOTH null-safely
    keys2 = spark.createDataFrame(
        [("https://h1.test/p1", "1"), ("https://h2.test/p2", "0")],
        "url string, lang string")
    delete_keys(spark, out, keys2)
    got = read_table(spark, out)
    # p1 has lang "1" -> killed; p2 has lang "2" != "0" -> kept
    assert got.filter(F.col("url") == "https://h1.test/p1").count() == 0
    assert got.filter(F.col("url") == "https://h2.test/p2").count() == 1


def test_delete_keys_guards(spark, table):
    df, out = table
    with pytest.raises(ValueError, match="not columns of the table"):
        delete_keys(spark, out, spark.createDataFrame([(1,)], "nope long"))
    n_snap = len(snapshots(out))
    rep = delete_keys(spark, out,
                      spark.createDataFrame([], "url string"))
    assert rep == {"deleted_keys": 0, "eq_cols": ["url"], "delete_id": None,
                   "snapshot": None, "committed": False}
    assert len(snapshots(out)) == n_snap
    # duplicate key rows collapse to distinct keys
    dup = spark.createDataFrame(
        [("https://h0.test/p0",), ("https://h0.test/p0",)], "url string")
    assert delete_keys(spark, out, dup)["deleted_keys"] == 1


def test_delete_keys_composes_with_positions_and_purge(spark, table, tmp_path):
    df, out = table
    delete_where(spark, out, [("k", ">=", 110)])          # position delete
    delete_keys(spark, out, spark.createDataFrame(
        [("https://h0.test/p0",), ("https://h0.test/p6",)], "url string"))
    want = df.filter(F.col("k") < 110).filter(
        ~F.col("url").isin("https://h0.test/p0", "https://h0.test/p6"))
    got = read_table(spark, out)
    assert got.count() == want.count() == 108
    # column-pruned read still applies the eq delete (keys not in output)
    assert read_table(spark, out, columns=["k"]).count() == 108
    # equality_positions resolves to coordinates, one per matched row
    eq = equality_positions(spark, out)
    assert eq.count() == 2 and set(eq.columns) == {"_src_file", "_part_id",
                                                   "_block_id", "_pos"}
    assert len(equality_delete_records(out)) == 1
    # position-delete reader never sees the eq file
    assert read_deletes(spark, out).count() == 10
    # purge folds BOTH flavors into the physical rewrite
    new_dir = str(tmp_path / "purged")
    rep = purge_deletes(spark, out, new_dir, num_files=4)
    assert rep["rows_deleted"] == 12
    got_p = decode_table(spark.read.parquet(new_dir))

    def canon(dfr):
        return sorted(tuple(sorted(r.asDict().items()))
                      for r in dfr.collect())

    assert canon(got_p) == canon(got)


def test_read_blocks_at_skips_delete_snapshots(spark, table):
    df, out = table
    delete_where(spark, out, [("k", "=", 1)])
    s = snapshots(out)[-1]
    assert s["kind"] == "delete"
    # raw block state at the delete snapshot equals the state just before it
    a = read_blocks_at(spark, out, s["snapshot"]).count()
    b = read_blocks_at(spark, out, s["snapshot"] - 1).count()
    assert a == b
