"""Incremental (cross-snapshot) dedup: new batch vs prior corpus."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.incremental import (
    dedup_against,
    near_dedup_against,
    near_dup_against_pairs,
    prior_texts,
)

PRIOR_ROWS = [
    (101, "the cat sat on the mat and the dog barked at the cat loudly"),
    (102, "der hund und die katze sind freunde und das ist gut so"),
    (103, "an entirely unrelated prior document about parquet footers"),
    (104, None),
]
NEW_ROWS = [
    (1, "the cat sat on the mat and the dog barked at the cat loudly"),  # exact dup of 101
    (2, "the cat sat on the mat and the dog barked at the cat quietly"),  # near dup of 101
    (3, "fresh content about distributed query engines and codecs"),
    (4, None),  # NULL text: always kept
    (5, "fresh content about distributed query engines and codecs"),  # new-vs-new dup: kept (not this operator's job)
]


@pytest.fixture(scope="module")
def prior(spark):
    return spark.createDataFrame(PRIOR_ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def new(spark):
    return spark.createDataFrame(NEW_ROWS, "doc_id long, text string")


def test_dedup_against_exact(new, prior):
    kept = sorted(r["doc_id"] for r in dedup_against(new, prior, "text").collect())
    # 1 is byte-identical to prior 101 -> dropped; NULLs kept; new-vs-new dups kept
    assert kept == [2, 3, 4, 5]


def test_dedup_against_null_prior_matches_nothing(spark, new):
    prior = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert dedup_against(new, prior, "text").count() == len(NEW_ROWS)


def test_near_pairs_cross_only(new, prior):
    pairs = near_dup_against_pairs(
        new, prior, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4
    ).collect()
    got = {(r["id_new"], r["id_prior"]) for r in pairs}
    # both the exact dup (1) and the near dup (2) pair with prior 101,
    # and NO pair has two new ids or two prior ids
    assert (1, 101) in got and (2, 101) in got
    for a, b in got:
        assert a in {1, 2, 3, 4, 5} and b in {101, 102, 103, 104}
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_near_dedup_against_drops_only_matched(new, prior):
    kept = sorted(r["doc_id"] for r in near_dedup_against(
        new, prior, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4
    ).collect())
    assert kept == [3, 4, 5]


def test_prior_texts_plain_and_encoded(spark, tmp_path, prior):
    # plain parquet path
    p = str(tmp_path / "prior_plain")
    prior.write.parquet(p)
    got = {r["text"] for r in prior_texts(spark, p, "text").collect()}
    assert got == {t for _, t in PRIOR_ROWS}

    # encoded out_dir with a snapshot log: only the text column is decoded
    from nail_parquet_spark.pipeline.checkpoint import encode_resumable

    enc = str(tmp_path / "prior_encoded")
    encode_resumable(spark, p, enc, units_per_job=8)
    dec = prior_texts(spark, enc, "text")
    assert dec.columns == ["text"]
    assert {r["text"] for r in dec.collect()} == {t for _, t in PRIOR_ROWS}


def test_saved_signatures_match_recompute(spark, tmp_path, new, prior):
    """The stored-signature banding path finds the same verified pairs as
    recomputing the prior side's MinHash from text."""
    import hashlib

    from nail_parquet_spark.functions.incremental import (
        load_signatures, save_signatures)

    out = str(tmp_path / "sigcorpus")
    save_signatures(prior, out, text_col="text", num_hashes=8, shingle_k=3)
    sigs, meta = load_signatures(spark, out)
    assert meta["num_hashes"] == 8 and meta["shingle_k"] == 3
    assert sigs.count() == 3  # distinct non-NULL prior texts

    base = near_dup_against_pairs(
        new, prior, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4
    ).collect()
    via_sigs = near_dup_against_pairs(
        new, prior, "doc_id", "text", threshold=0.5, num_hashes=8, bands=4,
        prior_sigs=sigs,
    ).collect()
    fp = {pid: hashlib.md5(t.encode()).hexdigest()
          for pid, t in PRIOR_ROWS if t is not None}
    want = {(r["id_new"], fp[r["id_prior"]], r["jaccard"]) for r in base}
    got = {(r["id_new"], r["id_prior"], r["jaccard"]) for r in via_sigs}
    assert got == want and len(got) >= 2


def test_curate_prior_stage(spark, tmp_path):
    """End-to-end: curate batch 1, then batch 2 against batch 1's corpus —
    overlapping docs land in the prior_dedup reject audit, counts conserve."""
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    base = "word " * 60
    rows1 = [("https://a.example/1", "2024-01-01 00:00:00", base + "alpha one"),
             ("https://b.example/2", "2024-01-01 00:00:00", base + "beta two")]
    rows2 = [("https://c.example/3", "2024-01-02 00:00:00", base + "alpha one"),  # dup of batch1
             ("https://d.example/4", "2024-01-02 00:00:00", base + "gamma three")]
    sch = "url string, warc_ts string, text string"
    src1, src2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    spark.createDataFrame(rows1, sch).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")).write.parquet(src1)
    spark.createDataFrame(rows2, sch).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")).write.parquet(src2)

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    # quality/c4 off: this test isolates the prior_dedup stage
    s1 = curate_and_encode_corpus(spark, src1, out1, do_near_dedup=False,
                                  do_quality=False, do_c4_clean=False)
    assert s1["counts"]["kept"] == 2

    s2 = curate_and_encode_corpus(spark, src2, out2, do_near_dedup=False,
                                  do_quality=False, do_c4_clean=False,
                                  prior_src=out1)
    assert s2["counts"]["kept"] == 1
    assert s2["counts"]["rejected"]["prior_dedup"] == 1
    assert s2["counts"]["input"] == s2["counts"]["kept"] + sum(
        s2["counts"]["rejected"].values())
    rej = spark.read.parquet(str(tmp_path / "o2" / "_rejects" / "stage=prior_dedup"))
    assert [r["url"] for r in rej.collect()] == ["https://c.example/3"]

    # CLI flag wiring: --prior / --prior-near reach the pipeline params
    import json as _json

    from nail_parquet_spark.cli import main

    out3 = str(tmp_path / "o3")
    rc = main(["curate", src2, "-o", out3, "--prior", out1, "--prior-near",
               "--skip", "quality,c4_clean,near_dedup"])
    assert rc == 0
    with open(str(tmp_path / "o3" / "_curation.json")) as f:
        state = _json.load(f)
    names = [s["stage"] for s in state["stages"]]
    assert "prior_dedup" in names and "prior_near_dedup" in names
    assert state["counts"]["rejected"]["prior_dedup"] == 1


def test_curate_signature_save_and_reuse(spark, tmp_path):
    """save_sigs persists the kept corpus's MinHash table; a later
    incremental run's prior_near_dedup stage reuses it (stage record says
    so) and still rejects the near-dup doc."""
    from nail_parquet_spark.functions.incremental import load_signatures
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    base = "alpha bravo charlie delta echo foxtrot golf hotel india " * 8
    rows1 = [("https://a.example/1", "2024-01-01 00:00:00", base + "one"),
             ("https://b.example/2", "2024-01-01 00:00:00",
              "totally different words " * 18 + "two")]
    rows2 = [("https://c.example/3", "2024-01-02 00:00:00",
              base + "one extra tail"),  # near dup of batch1 doc 1
             ("https://d.example/4", "2024-01-02 00:00:00",
              "fresh unseen content " * 20 + "three")]
    sch = "url string, warc_ts string, text string"
    src1, src2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    spark.createDataFrame(rows1, sch).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")).write.parquet(src1)
    spark.createDataFrame(rows2, sch).withColumn(
        "warc_ts", F.to_timestamp("warc_ts")).write.parquet(src2)

    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    s1 = curate_and_encode_corpus(spark, src1, out1, do_quality=False,
                                  do_c4_clean=False, do_near_dedup=False,
                                  save_sigs=True)
    assert s1["counts"]["kept"] == 2 and "signatures" in s1
    assert load_signatures(spark, out1) is not None

    s2 = curate_and_encode_corpus(spark, src2, out2, do_quality=False,
                                  do_c4_clean=False, do_near_dedup=False,
                                  prior_src=out1, prior_near_dedup=True)
    near_stage = [s for s in s2["stages"] if s["stage"] == "prior_near_dedup"][0]
    assert near_stage["signatures"] == "reused"
    assert s2["counts"]["rejected"]["prior_near_dedup"] == 1
    assert s2["counts"]["kept"] == 1
    assert s2["counts"]["input"] == s2["counts"]["kept"] + sum(
        s2["counts"]["rejected"].values())

    # CLI backfill: write signatures for the batch-2 corpus after the fact
    from nail_parquet_spark.cli import main

    assert main(["signatures", out2, "--num-hashes", "8"]) == 0
    sigs2, meta2 = load_signatures(spark, out2)
    assert meta2["num_hashes"] == 8 and sigs2.count() == 1


def test_dedup_against_property_model(spark):
    """Property check vs a pure-Python model: for random new/prior corpora
    (dups, NULLs, empty strings, unicode), dedup_against keeps exactly the
    new rows whose text is not byte-identical to any non-NULL prior text."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    texts = st.one_of(st.none(), st.sampled_from(
        ["", "a", "doc body", "doc body", "käse δ", "x " * 30]))
    rows = st.lists(texts, min_size=0, max_size=12)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(new=rows, prior=rows)
    def run(new, prior):
        ndf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(new)] or [(0, None)][:0],
            "doc_id long, text string") if new else \
            spark.createDataFrame([], "doc_id long, text string")
        pdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(prior)],
            "doc_id long, text string") if prior else \
            spark.createDataFrame([], "doc_id long, text string")
        got = sorted(r["doc_id"] for r in
                     dedup_against(ndf, pdf, "text").collect())
        seen = {t for t in prior if t is not None}
        want = sorted(i for i, t in enumerate(new)
                      if t is None or t not in seen)
        assert got == want

    run()


def test_incremental_plans_are_scale_safe(spark, new, prior):
    """Plan gates: no cartesian products, no global windows, and the exact
    path's anti-join carries fingerprints (md5), not documents."""
    from nail_parquet_spark.plans.explain import global_windows, plan_text

    exact = dedup_against(new, prior, "text")
    pairs = near_dup_against_pairs(new, prior, "doc_id", "text",
                                   threshold=0.5, num_hashes=8, bands=4)
    for df in (exact, pairs):
        txt = plan_text(df)
        assert "CartesianProduct" not in txt
        assert "BroadcastNestedLoopJoin" not in txt
        assert global_windows(df) == []
    assert "LeftAnti" in plan_text(exact)
