"""Snapshot rollback (Iceberg ``rollback_to_snapshot`` shape,
pipeline/checkpoint.py): metadata-only restore of an earlier state, shared
visibility rule across blocks / position deletes / equality deletes /
sequence numbers."""

import json
import os

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.pipeline.checkpoint import (
    encode_resumable,
    expire_snapshots,
    read_blocks_at,
    rollback_to,
    snapshots,
    visible_snapshots,
)
from nail_parquet_spark.pipeline.deletes import (
    delete_keys,
    delete_where,
    read_table,
    upsert,
)


def _mk_table(spark, path, n=120):
    df = spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 6).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("body-"), F.col("id").cast("string")).alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )
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


def test_rollback_undoes_delete(spark, table):
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    drep = delete_where(spark, out, [("k", "<", 30)])
    assert read_table(spark, out).count() == 90
    rep = rollback_to(out, pre, note="bad takedown")
    assert rep["committed"] and rep["target"] == pre
    assert rep["undone"] == [drep["snapshot"]] and rep["restored"] == []
    # current state is the pre-delete state again
    assert read_table(spark, out).count() == 120
    # time travel to the deleted state still works (the log keeps it)
    assert read_table(spark, out, snapshot_id=drep["snapshot"]).count() == 90
    # and travel to the rollback snapshot itself shows the restored state
    assert read_table(spark, out, snapshot_id=rep["snapshot"]).count() == 120


def test_rollback_undoes_append_then_rebuilds(spark, table):
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    new = spark.createDataFrame(
        [("https://new.test/x", 999, "late", "0")],
        "url string, k long, text string, lang string")
    upsert(spark, out, new, key="url")
    assert read_table(spark, out).count() == 121
    rollback_to(out, pre)
    assert read_table(spark, out).count() == 120
    assert read_table(spark, out).filter(F.col("k") == 999).count() == 0
    # appends AFTER the rollback build on the restored state
    new2 = spark.createDataFrame(
        [("https://new.test/y", 1000, "later", "0")],
        "url string, k long, text string, lang string")
    upsert(spark, out, new2, key="url")
    got = read_table(spark, out)
    assert got.count() == 121
    assert got.filter(F.col("k") == 1000).count() == 1
    assert got.filter(F.col("k") == 999).count() == 0


def test_rollback_equality_delete_and_sequence_rule(spark, table):
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    delete_keys(spark, out, spark.createDataFrame(
        [("https://h0.test/p0",)], "url string"))
    assert read_table(spark, out).count() == 119
    rollback_to(out, pre)
    # the equality delete is out of the effective state: the row is back
    got = read_table(spark, out)
    assert got.count() == 120
    assert got.filter(F.col("url") == "https://h0.test/p0").count() == 1
    # a NEW equality delete after the rollback still works (sequence rule
    # compares against the original commit ids, which rollback preserves)
    delete_keys(spark, out, spark.createDataFrame(
        [("https://h0.test/p6",)], "url string"))
    assert read_table(spark, out).count() == 119


def test_rollback_to_pre_rollback_state(spark, table):
    """Rolling back to a snapshot that was itself undone by an earlier
    rollback restores the state AS OF that snapshot (set_current shape)."""
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    d1 = delete_where(spark, out, [("k", "<", 10)])       # state: 110 rows
    rollback_to(out, pre)                                  # state: 120 rows
    rep = rollback_to(out, d1["snapshot"])                 # back to 110
    assert read_table(spark, out).count() == 110
    assert rep["restored"] == [d1["snapshot"]]


def test_rollback_guards(spark, table):
    df, out = table
    with pytest.raises(ValueError, match="not in the log"):
        rollback_to(out, 999)
    # target state must hold data commits (id 0 never exists)
    with pytest.raises(ValueError, match="not in the log"):
        rollback_to(out, 0)


def test_rollback_refuses_rewritten_batch(spark, table, tmp_path):
    """A batch wipe-and-rewritten by a retry after the target snapshot makes
    the target physically unreadable — rollback must refuse."""
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    # simulate a crash: drop one unit marker, re-run -> its batch re-encodes
    # WHOLE under the same key, committing a NEW snapshot over the same dir
    marker = sorted(
        os.path.join(out, "_manifests", f) for f in
        os.listdir(os.path.join(out, "_manifests")))[0]
    os.remove(marker)
    src = str(tmp_path / "src")
    encode_resumable(spark, src, out, units_per_job=2)
    assert snapshots(out)[-1]["snapshot"] > pre
    with pytest.raises(ValueError, match="re-committed after"):
        rollback_to(out, pre)
    # current state is still fine
    assert read_table(spark, out).count() == 120


def test_expire_protects_rollback_replay(spark, table):
    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    delete_where(spark, out, [("k", "<", 30)])
    rollback_to(out, pre)
    upsert(spark, out, spark.createDataFrame(
        [("https://new.test/x", 999, "late", "0")],
        "url string, k long, text string, lang string"), key="url")
    rep = expire_snapshots(out, keep_last=1)
    # everything the rollback replay needs survived: reads still work
    assert read_table(spark, out).count() == 121
    assert read_blocks_at(spark, out).count() > 0
    vis = visible_snapshots(out)
    assert all(s.get("kind") != "rollback" for s in vis)
    assert rep["kept"] >= len(vis)


def test_cli_maintain_rollback(spark, table, capsys):
    from nail_parquet_spark.cli import main

    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    delete_where(spark, out, [("k", "<", 30)])
    assert main(["maintain", out, "--rollback", str(pre),
                 "--note", "undo trim"]) == 0
    rep = json.loads(capsys.readouterr().out)["rollback"]
    assert rep["committed"] and rep["target"] == pre
    assert read_table(spark, out).count() == 120
    # --history lists the log with effective-state membership
    assert main(["maintain", out, "--history"]) == 0
    hist = json.loads(capsys.readouterr().out)["history"]
    kinds = [h["kind"] for h in hist]
    assert kinds[-1] == "rollback" and "delete" in kinds
    assert [h["in_current_state"] for h in hist if h["kind"] == "delete"] \
        == [False]
    assert all(h["in_current_state"] for h in hist if h["kind"] == "append")


def test_tags_retention_and_refs(spark, table, capsys):
    from nail_parquet_spark.cli import main
    from nail_parquet_spark.pipeline.checkpoint import (
        delete_tag, expire_snapshots, resolve_ref, tag_snapshot, tags)

    df, out = table
    pre = snapshots(out)[-1]["snapshot"]
    rep = tag_snapshot(out, "prod", note="release")
    assert rep == {"tag": "prod", "snapshot": pre}
    # churn the log: delete + rollback + upsert
    delete_where(spark, out, [("k", "<", 30)])
    tag_snapshot(out, "trimmed")          # points at the delete snapshot
    rollback_to(out, pre)
    upsert(spark, out, spark.createDataFrame(
        [("https://new.test/x", 999, "late", "0")],
        "url string, k long, text string, lang string"), key="url")
    # refs resolve: id-like strings and tag names
    assert resolve_ref(out, "prod") == pre
    assert resolve_ref(out, str(pre)) == pre and resolve_ref(out, None) is None
    # time travel by tag through the CLI (decode --snapshot <tag>)
    assert read_table(spark, out, snapshot_id=resolve_ref(out, "trimmed")) \
        .count() == 90
    # expire with keep_last=1: tagged snapshots and their state survive
    expire_snapshots(out, keep_last=1)
    assert read_table(spark, out, snapshot_id=resolve_ref(out, "prod")) \
        .count() == 120
    assert read_table(spark, out, snapshot_id=resolve_ref(out, "trimmed")) \
        .count() == 90
    # rollback by tag name via the CLI; history lists tags
    assert main(["maintain", out, "--rollback", "trimmed"]) == 0
    capsys.readouterr()
    assert read_table(spark, out).count() == 90
    assert main(["maintain", out, "--history"]) == 0
    import json as _json

    hist = _json.loads(capsys.readouterr().out)
    assert hist["tags"] == {"prod": pre, "trimmed": pre + 1}
    # delete-tag releases the root; guards
    assert delete_tag(out, "trimmed")["deleted"]
    assert "trimmed" not in tags(out)
    with pytest.raises(ValueError, match="no tag"):
        resolve_ref(out, "nope")
    with pytest.raises(ValueError, match="non-numeric"):
        tag_snapshot(out, "123")
    with pytest.raises(ValueError, match="not in the log"):
        tag_snapshot(out, "ghost", snapshot_id=999)
