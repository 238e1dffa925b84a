"""Snapshot changelog scan (pipeline/changelog.table_changes) vs the
model: diffing read_table() merge-on-read views of the two endpoints."""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.pipeline.changelog import table_changes
from nail_parquet_spark.pipeline.checkpoint import (
    encode_resumable,
    rollback_to,
    snapshots,
)
from nail_parquet_spark.pipeline.deletes import (
    delete_keys,
    delete_where,
    read_table,
    upsert,
)

COLS = ["k", "text"]


def _mk(spark, path, lo, hi):
    df = spark.range(lo, hi).select(
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"))
    df.repartition(1).sortWithinPartitions("k").write.parquet(path)


def _model(spark, out, frm, to):
    """insert = at(to) - at(frm); delete = at(frm) - at(to)."""
    at_to = read_table(spark, out, snapshot_id=to).select(*COLS)
    if frm > 0:
        at_from = read_table(spark, out, snapshot_id=frm).select(*COLS)
    else:
        at_from = at_to.limit(0)
    ins = [t + ("insert",) for t in
           sorted(tuple(r) for r in at_to.exceptAll(at_from).collect())]
    dels = [t + ("delete",) for t in
            sorted(tuple(r) for r in at_from.exceptAll(at_to).collect())]
    return sorted(ins + dels)


def got_changes(spark, out, frm, to=None, **kw):
    ch = table_changes(spark, out, frm, to, columns=COLS, **kw)
    return sorted(tuple(r) for r in
                  ch.select(*COLS, "_change_type").collect())


@pytest.fixture()
def table(spark, tmp_path):
    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 40)
    encode_resumable(spark, str(tmp_path / "s1"), out)
    return out, tmp_path


def snap(out):
    return snapshots(out)[-1]["snapshot"]


def test_initial_window_all_inserts(spark, table):
    out, _ = table
    s1 = snap(out)
    got = got_changes(spark, out, 0, s1)
    assert got == _model(spark, out, 0, s1)
    assert len(got) == 40 and all(t[-1] == "insert" for t in got)


def test_append_window(spark, table):
    out, tmp = table
    s1 = snap(out)
    _mk(spark, str(tmp / "s2"), 40, 55)
    encode_resumable(spark, str(tmp / "s2"), out)
    s2 = snap(out)
    got = got_changes(spark, out, s1, s2)
    assert got == _model(spark, out, s1, s2)
    assert len(got) == 15 and all(t[-1] == "insert" for t in got)
    # commit snapshot attribution: every insert carries the append's id
    ch = table_changes(spark, out, s1, s2, columns=COLS)
    assert ch.select("_commit_snapshot").distinct().collect()[0][0] == s2


def test_position_delete_window(spark, table):
    out, _ = table
    s1 = snap(out)
    delete_where(spark, out, [("k", "<", 7)])
    s2 = snap(out)
    got = got_changes(spark, out, s1, s2)
    assert got == _model(spark, out, s1, s2)
    assert len(got) == 7 and all(t[-1] == "delete" for t in got)
    ch = table_changes(spark, out, s1, s2, columns=COLS)
    assert ch.select("_commit_snapshot").distinct().collect()[0][0] == s2


def test_net_semantics_insert_then_delete(spark, table):
    out, tmp = table
    s1 = snap(out)
    _mk(spark, str(tmp / "s2"), 100, 110)
    encode_resumable(spark, str(tmp / "s2"), out)
    delete_where(spark, out, [("k", ">=", 105)])  # kills 5 of the new rows
    s3 = snap(out)
    got = got_changes(spark, out, s1, s3)
    assert got == _model(spark, out, s1, s3)
    # rows 105..109 inserted AND deleted inside the window: absent
    assert len(got) == 5
    ks = {t[0] for t in got}
    assert ks == set(range(100, 105))


def test_equality_delete_window(spark, table):
    out, _ = table
    s1 = snap(out)
    keys = spark.createDataFrame([(3,), (11,), (999,)], "k long")
    delete_keys(spark, out, keys)
    s2 = snap(out)
    got = got_changes(spark, out, s1, s2)
    assert got == _model(spark, out, s1, s2)
    assert {t[0] for t in got} == {3, 11}
    assert all(t[-1] == "delete" for t in got)
    ch = table_changes(spark, out, s1, s2, columns=COLS)
    assert ch.select("_commit_snapshot").distinct().collect()[0][0] == s2


def test_equality_delete_sequence_rule(spark, table):
    # key deleted, then re-inserted: the later row survives; the window
    # spanning both shows net delete of the OLD row and insert of the NEW
    out, tmp = table
    s1 = snap(out)
    keys = spark.createDataFrame([(5,)], "k long")
    delete_keys(spark, out, keys)
    new = spark.createDataFrame([(5, "t5-v2")], "k long, text string")
    upsert(spark, out, new, key=["k"])
    s3 = snap(out)
    got = got_changes(spark, out, s1, s3)
    assert got == _model(spark, out, s1, s3)
    assert (5, "t5", "delete") in got and (5, "t5-v2", "insert") in got


def test_upsert_window(spark, table):
    out, _ = table
    s1 = snap(out)
    new = spark.createDataFrame(
        [(2, "t2-v2"), (60, "t60")], "k long, text string")
    upsert(spark, out, new, key=["k"])
    s2 = snap(out)
    got = got_changes(spark, out, s1, s2)
    assert got == _model(spark, out, s1, s2)
    assert (2, "t2", "delete") in got
    assert (2, "t2-v2", "insert") in got and (60, "t60", "insert") in got


def test_empty_window(spark, table):
    out, _ = table
    s1 = snap(out)
    got = got_changes(spark, out, s1, s1)
    assert got == []


def test_multi_commit_window_and_subwindows(spark, table):
    out, tmp = table
    s1 = snap(out)
    _mk(spark, str(tmp / "s2"), 40, 50)
    encode_resumable(spark, str(tmp / "s2"), out)
    s2 = snap(out)
    delete_where(spark, out, [("k", "=", 45)])
    s3 = snap(out)
    for frm, to in [(s1, s2), (s2, s3), (s1, s3), (0, s3)]:
        assert got_changes(spark, out, frm, to) == \
            _model(spark, out, frm, to), (frm, to)


def test_rollback_crossing_window_raises(spark, table):
    out, tmp = table
    s1 = snap(out)
    _mk(spark, str(tmp / "s2"), 40, 45)
    encode_resumable(spark, str(tmp / "s2"), out)
    s2 = snap(out)
    rollback_to(out, s1)
    s3 = snap(out)
    with pytest.raises(ValueError, match="rollback crossed"):
        table_changes(spark, out, s2, s3)
    # but a window whose baseline is BEFORE the rolled-back commit is fine
    got = got_changes(spark, out, s1, s3)
    assert got == _model(spark, out, s1, s3) == []


def test_backward_window_raises(spark, table):
    out, _ = table
    with pytest.raises(ValueError, match="forward"):
        table_changes(spark, out, snap(out), 0)


def test_cli_decode_changes(spark, table, tmp_path):
    from nail_parquet_spark.cli import main

    out, tmp = table
    s1 = snap(out)
    delete_where(spark, out, [("k", ">=", 35)])
    s2 = snap(out)
    dst = str(tmp_path / "changes.parquet")
    assert main(["decode", out, "--changes", f"{s1}..{s2}", "-o", dst]) == 0
    got = sorted(tuple(r) for r in spark.read.parquet(dst)
                 .select("k", "text", "_change_type").collect())
    assert got == _model(spark, out, s1, s2)
    assert len(got) == 5 and all(t[-1] == "delete" for t in got)


def test_cli_changes_rejects_row_shaping_flags(spark, table, tmp_path):
    """--changes/--changes-cursor emit changelog rows whole; any
    row-shaping flag used to be silently ignored — now it must refuse
    (ADVICE r5 #1)."""
    import pytest as _pytest

    from nail_parquet_spark.cli import main

    out, tmp = table
    s1 = snap(out)
    dst = str(tmp_path / "x.parquet")
    cur = str(tmp_path / "cur.json")
    for extra in (["--where", "k>=0"], ["--top", "k:3"],
                  ["--sample-keys", "k:0.5:7"],
                  ["--semi-join", f"k@{out}"]):
        with _pytest.raises(SystemExit):
            main(["decode", out, "--changes", f"0..{s1}", "-o", dst] + extra)
        with _pytest.raises(SystemExit):
            main(["decode", out, "--changes-cursor", cur, "-o", dst] + extra)


def test_poll_ack_cursor(spark, table, tmp_path):
    from nail_parquet_spark.pipeline.changelog import ack_changes, poll_changes

    out, tmp = table
    cur = str(tmp_path / "cursor.json")
    # first poll: everything since genesis
    ch, tok = poll_changes(spark, out, cur, columns=COLS)
    assert tok["from"] == 0 and ch.count() == 40
    # unacked: the same window re-delivers
    ch2, tok2 = poll_changes(spark, out, cur, columns=COLS)
    assert tok2 == tok and ch2.count() == 40
    ack_changes(cur, tok)
    # acked + no new commits: nothing
    ch3, tok3 = poll_changes(spark, out, cur, columns=COLS)
    assert ch3 is None and tok3["from"] == tok["to"]
    # new commit: only the delta
    delete_where(spark, out, [("k", "<", 3)])
    ch4, tok4 = poll_changes(spark, out, cur, columns=COLS)
    got = sorted(tuple(r) for r in
                 ch4.select(*COLS, "_change_type").collect())
    assert got == _model(spark, out, tok4["from"], tok4["to"])
    assert len(got) == 3 and all(t[-1] == "delete" for t in got)
    ack_changes(cur, tok4)
    assert poll_changes(spark, out, cur, columns=COLS)[0] is None


def test_cli_changes_cursor(spark, table, tmp_path):
    from nail_parquet_spark.cli import main

    out, tmp = table
    cur = str(tmp_path / "cursor.json")
    dst = str(tmp_path / "delta.parquet")
    # first consume: everything since genesis, cursor advances
    assert main(["decode", out, "--changes-cursor", cur, "-o", dst]) == 0
    assert spark.read.parquet(dst).count() == 40
    # nothing new: no write, exit 0
    assert main(["decode", out, "--changes-cursor", cur, "-o",
                 str(tmp_path / "d2.parquet")]) == 0
    # a new delete: only the delta consumed
    delete_where(spark, out, [("k", "=", 1)])
    dst3 = str(tmp_path / "d3.parquet")
    assert main(["decode", out, "--changes-cursor", cur, "-o", dst3]) == 0
    got = [tuple(r) for r in spark.read.parquet(dst3)
           .select("k", "_change_type").collect()]
    assert got == [(1, "delete")]
