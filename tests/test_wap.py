"""Write-audit-publish staging (pipeline/checkpoint: stage=True,
read_staged / publish_staged / discard_staged)."""

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.pipeline.checkpoint import (
    discard_staged,
    encode_resumable,
    publish_staged,
    read_blocks_at,
    read_staged,
    remove_orphan_files,
    snapshots,
    staged_batches,
)
from nail_parquet_spark.pipeline.deletes import read_table


def _mk(spark, path, lo, hi):
    (spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"))
     .repartition(1).write.parquet(path))


def test_stage_publish_lifecycle(spark, tmp_path):
    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 30)
    rep = encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    assert rep["completed"] > 0
    # staged: durable + auditable, but invisible to readers
    assert len(staged_batches(out)) >= 1
    assert snapshots(out) == []
    with pytest.raises(ValueError, match="no snapshots"):
        read_blocks_at(spark, out)
    audit = read_staged(spark, out)
    assert audit.agg(F.sum("n_rows")).first()[0] >= 30  # blocks table shape
    # resume while staged: nothing re-encodes
    rep2 = encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    assert rep2["completed"] == 0 and rep2["skipped"] == rep["completed"]
    # orphan GC must not reap a staged batch
    assert remove_orphan_files(out, dry_run=True)["orphans"] == []
    # publish: metadata-only commit, data becomes visible
    pub = publish_staged(out)
    assert len(pub["published"]) >= 1 and pub["remaining"] == 0
    assert read_table(spark, out).count() == 30
    assert len(snapshots(out)) == len(pub["published"])


def test_discard_staged_reencodes(spark, tmp_path):
    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 20)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    recs = staged_batches(out)
    assert len(recs) == 1
    rep = discard_staged(out)
    assert rep["discarded"] == [recs[0]["batch"]] and rep["remaining"] == 0
    import glob
    import os

    assert glob.glob(os.path.join(out, "batch=*")) == []
    # the units are unmarked again: a later run re-encodes them
    rep2 = encode_resumable(spark, str(tmp_path / "s1"), out)
    assert rep2["completed"] > 0
    assert read_table(spark, out).count() == 20


def test_publish_subset_and_order(spark, tmp_path):
    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 10)
    _mk(spark, str(tmp_path / "s2"), 10, 25)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    encode_resumable(spark, str(tmp_path / "s2"), out, stage=True)
    recs = staged_batches(out)
    assert len(recs) == 2
    second = recs[1]["batch"]
    pub = publish_staged(out, batches=[second])
    assert pub["remaining"] == 1
    assert read_table(spark, out).count() == 15
    pub2 = publish_staged(out)
    assert pub2["remaining"] == 0
    assert read_table(spark, out).count() == 25
    with pytest.raises(ValueError, match="not staged"):
        publish_staged(out, batches=["nope"])


def test_mixed_staged_and_committed(spark, tmp_path):
    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 10)
    _mk(spark, str(tmp_path / "s2"), 10, 30)
    encode_resumable(spark, str(tmp_path / "s1"), out)          # committed
    encode_resumable(spark, str(tmp_path / "s2"), out, stage=True)
    assert read_table(spark, out).count() == 10   # staged part invisible
    publish_staged(out)
    assert read_table(spark, out).count() == 30


def test_cli_maintain_publish(spark, tmp_path, capsys):
    import json

    from nail_parquet_spark.cli import main

    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 12)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    assert main(["maintain", out, "--history"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert len(rep["staged"]) == 1 and rep["history"] == []
    assert main(["maintain", out, "--publish", "all",
                 "--note", "audit passed"]) == 0
    rep2 = json.loads(capsys.readouterr().out)
    assert rep2["publish"]["remaining"] == 0
    assert read_table(spark, out).count() == 12
    assert snapshots(out)[-1]["note"] == "audit passed"


def test_curate_stage_flow(spark, tmp_path):
    """curate --stage: the curated corpus encodes staged; publish commits."""
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    src = str(tmp_path / "docs")
    import random

    rng = random.Random(5)
    # stopword-bearing varied prose: passes the Gopher rule book while
    # staying distinct per doc (the staging gate is not under test here)
    words = ("the and of to in that with for was on alpha bravo charlie "
             "delta echo foxtrot golf hotel india juliet kilo lima").split()
    rows = [(f"https://h{i % 3}.test/p{i}",
             " ".join(rng.choice(words) for _ in range(120)) + ".")
            for i in range(12)]
    (spark.createDataFrame(rows, "url string, text string")
     .withColumn("warc_ts", F.current_timestamp())
     .repartition(1).write.parquet(src))
    out = str(tmp_path / "enc")
    state = curate_and_encode_corpus(
        spark, src, out, do_near_dedup=False, do_semdedup=False,
        stage=True)
    assert state["encode"]["completed"] > 0
    assert snapshots(out) == [] and len(staged_batches(out)) >= 1
    publish_staged(out, note="curate audit ok")
    assert read_table(spark, out).count() == state["counts"]["kept"]


def test_staged_crash_window_gc_and_publish_guard(spark, tmp_path):
    """Crash between the staged record and the unit markers: the staged
    dir must survive --gc-orphans (the record keeps it live), and publish
    must refuse a staged batch whose directory is gone."""
    import glob
    import os
    import shutil

    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 15)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    rec = staged_batches(out)[0]
    # simulate the crash window: markers never landed
    for m in glob.glob(os.path.join(out, "_manifests", "*.json")):
        os.remove(m)
    rep = remove_orphan_files(out, dry_run=False)
    assert rep["orphans"] == []  # staged record keeps the dir live
    assert os.path.isdir(os.path.join(out, f"batch={rec['batch']}"))
    # now the dir really disappears: publish must refuse, not commit a
    # dangling snapshot
    shutil.rmtree(os.path.join(out, f"batch={rec['batch']}"))
    with pytest.raises(ValueError, match="no data directory"):
        publish_staged(out)
    assert snapshots(out) == []


def test_stale_staged_record_never_double_commits(spark, tmp_path):
    """A stage=True run that crashes between the staged record and the
    unit markers leaves _staged/{bkey}.json behind; a stage=False rerun
    re-encodes and commits the batch for real. The stale record must not
    linger as a phantom staged batch, and publish_staged must never
    commit a duplicate snapshot for the already-visible batch."""
    import glob
    import json as _json
    import os

    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 15)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    rec = staged_batches(out)[0]
    # simulate the crash window: markers never landed, record did
    for m in glob.glob(os.path.join(out, "_manifests", "*.json")):
        os.remove(m)
    # non-staged rerun: re-encodes the batch whole and commits a snapshot
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=False)
    snaps = snapshots(out)
    assert [s["batch"] for s in snaps] == [rec["batch"]]
    # the stale staged record is gone; publish has nothing to do
    assert staged_batches(out) == []
    assert publish_staged(out)["published"] == []
    assert len(snapshots(out)) == 1  # no duplicate commit
    # belt-and-braces: even a hand-resurrected stale record for a visible
    # batch is skipped and cleaned, never committed again
    sd = os.path.join(out, "_snapshots", "_staged")
    os.makedirs(sd, exist_ok=True)
    with open(os.path.join(sd, f"{rec['batch']}.json"), "w") as f:
        _json.dump(rec, f)
    rep = publish_staged(out)
    assert rep["published"] == [] and rep["remaining"] == 0
    assert len(snapshots(out)) == 1
    # the table still reads exactly once-committed data
    assert read_table(spark, out).count() == 15


def test_publish_is_atomic_on_missing_dirs(spark, tmp_path):
    """One of two staged dirs is gone: publish must commit NOTHING, so a
    retry after repair sees the exact state it expects."""
    import os
    import shutil

    out = str(tmp_path / "enc")
    _mk(spark, str(tmp_path / "s1"), 0, 10)
    _mk(spark, str(tmp_path / "s2"), 10, 20)
    encode_resumable(spark, str(tmp_path / "s1"), out, stage=True)
    encode_resumable(spark, str(tmp_path / "s2"), out, stage=True)
    recs = staged_batches(out)
    shutil.rmtree(os.path.join(out, f"batch={recs[0]['batch']}"))
    with pytest.raises(ValueError, match="no data directory"):
        publish_staged(out)
    assert snapshots(out) == []               # nothing half-applied
    assert len(staged_batches(out)) == 2      # both records intact
