"""End-to-end tests for the one-call corpus-curation pipeline
(pipeline/curate.py, VERDICT r4 #4): counts conservation across every
stage, stage-level + unit-level resumability, and the CLI verb."""

import json
import os

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.synth import webpages_spark


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Synthetic web corpus engineered so EVERY stage rejects something:
    - 150 truncated docs (fail min_words at the quality gate)
    - C4-cleanable text (sentence lines ending in '.'; some lines die)
    - 200 exact duplicates (same text, different url/ts)
    - 200 near duplicates (same text + a small tail, different url)
    """
    base = webpages_spark(spark, 3000, seed=7, n_parts=4).withColumn(
        "text",
        F.concat(F.regexp_replace(F.col("text"), r" (and|of) ", ".\n"),
                 F.lit(".")))
    bucket = F.pmod(F.xxhash64("url"), F.lit(12))  # deterministic slices
    short = (base.filter(bucket == 0)
             .withColumn("text", F.substring(F.col("text"), 1, 30))
             .withColumn("url", F.concat(F.lit("https://short.example/"), F.col("url"))))
    exact = (base.filter(bucket == 1)
             .withColumn("url", F.concat(F.lit("https://dup.example/"), F.col("url")))
             .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")))
    near = (base.filter(bucket == 2)
            .withColumn("text", F.concat(F.col("text"), F.lit("\nAlmost the same document text.")))
            .withColumn("url", F.concat(F.lit("https://near.example/"), F.col("url"))))
    full = base.unionAll(short).unionAll(exact).unionAll(near)
    p = str(tmp_path_factory.mktemp("curate") / "corpus")
    full.write.parquet(p)
    return p


RULES = {"min_words": 25, "min_mean_word_len": 0, "min_stop_hits": 0,
         "max_dup_line_frac": 1.0}


def test_curate_counts_conserve_and_roundtrip(spark, corpus, tmp_path):
    from nail_parquet_spark.codec.decode import decode_table
    from nail_parquet_spark.pipeline.checkpoint import read_blocks_at
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    out = str(tmp_path / "curated")
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, near_threshold=0.6,
        units_per_job=4)
    n_input = spark.read.parquet(corpus).count()
    c = state["counts"]
    assert c["input"] == n_input > 3000
    # conservation: every input row is kept or attributed to EXACTLY one stage
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    assert state["conserved"] is True
    # the engineered corpus exercises every stage (each slice is ~250 docs)
    assert c["rejected"]["quality"] >= 100
    assert c["rejected"]["exact_dedup"] >= 100
    assert c["rejected"]["near_dedup"] >= 50
    # per-stage audit tables exist and match the recorded counts
    for stage, n in c["rejected"].items():
        audit = spark.read.parquet(os.path.join(out, "_rejects", f"stage={stage}"))
        assert audit.count() == n and {"__doc_id", "url"} <= set(audit.columns)
    # lineage: effective quality thresholds are stamped
    q = [s for s in state["stages"] if s["stage"] == "quality"][0]
    assert q["rules"]["min_words"] == 25
    # encode ran to completion and the blocks decode back to the kept rows
    assert state["encode"]["completed"] == state["encode"]["total"]
    blocks = read_blocks_at(spark, out)
    dec = decode_table(blocks, columns=["url", "text"])
    assert dec.count() == c["kept"]
    staging = spark.read.parquet(os.path.join(out, "_staging"))
    assert dec.select("url").subtract(staging.select("url")).count() == 0


def test_curate_resumes_without_recompute(spark, corpus, tmp_path):
    from nail_parquet_spark.codec.decode import decode_table
    from nail_parquet_spark.pipeline.checkpoint import read_blocks_at
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    out = str(tmp_path / "resume")
    part = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, near_threshold=0.6,
        units_per_job=1, max_units=1)
    assert part["encode"]["completed"] >= 1
    assert part["encode"]["completed"] < part["encode"]["total"]
    staging = os.path.join(out, "_staging")
    mtimes = {f: os.path.getmtime(os.path.join(staging, f))
              for f in os.listdir(staging)}

    done = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, near_threshold=0.6,
        units_per_job=1)
    # stage 1-4 results were NOT recomputed: staging files untouched
    assert {f: os.path.getmtime(os.path.join(staging, f))
            for f in os.listdir(staging)} == mtimes
    # unit-level resume: previously committed units were skipped, the rest
    # completed, and nothing was double-encoded
    assert done["encode"]["skipped"] >= part["encode"]["completed"]
    assert (done["encode"]["skipped"] + done["encode"]["completed"]
            == done["encode"]["total"])
    dec = decode_table(read_blocks_at(spark, out), columns=["url"])
    assert dec.count() == done["counts"]["kept"]
    assert dec.select("url").distinct().count() == done["counts"]["kept"]


def test_curate_cli_smoke(spark, corpus, tmp_path, capsys):
    from nail_parquet_spark.cli import main

    out = str(tmp_path / "cli_out")
    rc = main(["curate", corpus, "-o", out,
               "--rules", json.dumps(RULES), "--skip", "near_dedup",
               "--threshold", "0.6"])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out)
    assert printed["conserved"] is True
    assert "near_dedup" not in printed["counts"]["rejected"]
    assert set(printed["counts"]["rejected"]) == {"quality", "c4_clean", "exact_dedup"}
    assert os.path.exists(os.path.join(out, "_curation.json"))


def test_curate_decontam_stage(spark, corpus, tmp_path):
    """With an eval table drawn from the corpus itself, the decontam stage
    rejects the overlapping docs and counts still conserve."""
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    ev = str(tmp_path / "eval")
    (spark.read.parquet(corpus)
     .filter(F.pmod(F.xxhash64("url"), F.lit(12)) == 3)
     .select("text").limit(40).write.parquet(ev))

    out = str(tmp_path / "curated_dc")
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, near_threshold=0.6,
        units_per_job=4, eval_src=ev, decontam_ngram=5)
    counts = state["counts"]
    assert counts["rejected"]["decontam"] > 0
    assert state["conserved"]
    assert {s["stage"] for s in state["stages"]} == {
        "quality", "c4_clean", "exact_dedup", "near_dedup", "decontam"}
    # audit table exists and matches the count
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=decontam"))
    assert rej.count() == counts["rejected"]["decontam"]


def test_curate_boilerplate_stage(spark, corpus, tmp_path):
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    # append a universal footer to every doc: the corpus hosts all share
    # a registered domain, so the footer is within-site boilerplate and
    # must not survive into staging; counts still conserve
    src = str(tmp_path / "bp_src")
    (spark.read.parquet(corpus)
     .withColumn("text", F.concat(F.col("text"),
                                  F.lit("\nCopyright example footer")))
     .write.parquet(src))
    out = str(tmp_path / "curated_bp")
    state = curate_and_encode_corpus(
        spark, src, out, quality_rules=RULES, do_boilerplate=True,
        do_near_dedup=False, units_per_job=4)
    assert [s["stage"] for s in state["stages"]][0] == "boilerplate"
    c = state["counts"]
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    staged = spark.read.parquet(os.path.join(out, "_staging"))
    assert staged.filter(
        F.col("text").contains("Copyright example footer")).count() == 0
    assert staged.count() == c["kept"] > 0


def test_curate_from_warc_directory(spark, tmp_path):
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus
    from nail_parquet_spark.sources.warc import write_warc
    from nail_parquet_spark.synth import webpages_spark

    # raw crawl: WARC archive, html only — curate must extract text first
    arc = str(tmp_path / "crawl")
    write_warc(webpages_spark(spark, 1_500, seed=9, n_parts=3), arc)
    out = str(tmp_path / "curated_warc")
    # c4_clean off: synthetic prose has no terminal punctuation, the C4
    # line rule would legitimately empty every doc
    state = curate_and_encode_corpus(
        spark, arc, out, quality_rules=RULES, do_near_dedup=False,
        do_c4_clean=False, units_per_job=4)
    assert [s["stage"] for s in state["stages"]][0] == "extract"
    c = state["counts"]
    assert c["input"] == 1_500
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    staged = spark.read.parquet(os.path.join(out, "_staging"))
    assert "text" in staged.columns and staged.count() == c["kept"] > 0


def test_curate_classifier_stage(spark, corpus, tmp_path):
    import hashlib

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    DIM = 1 << 16
    # "the" appears in essentially every synthetic doc; weight it negative
    # enough that docs containing it score < 0.5 while the rest pass
    fid = int(hashlib.md5(b"the").hexdigest()[:7], 16) % DIM
    wp = str(tmp_path / "w.parquet")
    spark.createDataFrame([(fid, -1000.0)],
                          "feature_id long, weight double").write.parquet(wp)
    out = str(tmp_path / "curated_clf")
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, do_near_dedup=False,
        do_c4_clean=False, classifier_src=wp, classifier_dim=DIM,
        units_per_job=4)
    c = state["counts"]
    assert c["rejected"]["classify"] > 0
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    # the audit table carries the score for offline threshold replay
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=classify"))
    assert "score" in rej.columns and rej.count() == c["rejected"]["classify"]


def test_curate_entropy_stage(spark, corpus, tmp_path):
    import pytest as _pytest

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    out = str(tmp_path / "curated_ent")
    # the synthetic corpus's word entropy spans ~[4.2, 5.5] bits after the
    # quality gate; capping at 4.5 rejects the richer docs deterministically
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, do_near_dedup=False,
        do_c4_clean=False, entropy_rules={"max_word_entropy": 4.5},
        units_per_job=4)
    c = state["counts"]
    assert c["rejected"]["entropy"] > 0
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    # the audit table carries both entropies for offline threshold replay
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=entropy"))
    assert {"char_entropy", "word_entropy"} <= set(rej.columns)
    assert rej.count() == c["rejected"]["entropy"]
    assert rej.filter(F.col("word_entropy") <= 4.5).count() == 0
    # lineage records the effective rules
    ent = [s for s in state["stages"] if s["stage"] == "entropy"][0]
    assert ent["rules"] == {"max_word_entropy": 4.5}
    with _pytest.raises(ValueError, match="unknown entropy rules"):
        curate_and_encode_corpus(
            spark, corpus, str(tmp_path / "bad"), quality_rules=RULES,
            entropy_rules={"min_entropy": 1.0})


def test_curate_normalize_stage(spark, tmp_path):
    """--normalize runs before every text-keyed stage: typography variants
    collapse to one exact-dedup fingerprint, invisible-only pages are
    rejected at the normalize stage, and counts still conserve."""
    import datetime

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://a.example/1", ts, 'He said "hello" - fine words here.'),
        # identical after normalization (curly quotes, en dash, NBSP run)
        ("https://b.example/2", ts,
         "He said “hello” – fine  words here."),
        # invisible/whitespace-only page -> '' after normalize -> rejected
        ("https://c.example/3", ts, "​  ­ "),
        ("https://d.example/4", ts, "another document entirely, unrelated."),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string") \
        .write.parquet(src)

    out = str(tmp_path / "norm")
    state = curate_and_encode_corpus(
        spark, src, out, do_normalize=True, do_quality=False,
        do_c4_clean=False, do_near_dedup=False, units_per_job=4)
    c = state["counts"]
    assert c["rejected"]["normalize"] == 1          # the invisible-only page
    assert c["rejected"]["exact_dedup"] == 1        # curly variant collapsed
    assert c["kept"] == 2
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    assert any(s["stage"] == "normalize" for s in state["stages"])

    # control: without normalize the typography variant is NOT a duplicate
    out2 = str(tmp_path / "raw")
    raw = curate_and_encode_corpus(
        spark, src, out2, do_quality=False, do_c4_clean=False,
        do_near_dedup=False, units_per_job=4)
    assert raw["counts"]["kept"] == 4
    assert "normalize" not in raw["counts"]["rejected"]


def test_curate_lang_and_badwords_stages(spark, tmp_path):
    """--lang routes by the stopword-marker language ID (rejects carry the
    predicted label); --badwords drops blocklisted docs after C4 cleaning;
    counts conserve across the extended stage set."""
    import datetime

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    ts = datetime.datetime(2024, 1, 1)
    en = "the cat and the dog is in the house of the man"
    de = "der hund und die katze ist in das haus und der mann"
    rows = [
        ("https://en.example/1", ts, en),
        ("https://en.example/2", ts, en + " again the end"),
        ("https://de.example/3", ts, de),
        ("https://bad.example/4", ts, en + " with spamword inside"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string") \
        .write.parquet(src)

    out = str(tmp_path / "routed")
    state = curate_and_encode_corpus(
        spark, src, out, lang_keep=["en"], badwords=["spamword"],
        do_quality=False, do_c4_clean=False, do_near_dedup=False,
        units_per_job=4)
    c = state["counts"]
    assert c["rejected"]["lang_filter"] == 1      # the German page
    assert c["rejected"]["badwords"] == 1         # the spamword page
    assert c["kept"] == 2
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    # the lang audit table records the routed-away label
    audit = spark.read.parquet(os.path.join(out, "_rejects", "stage=lang_filter"))
    assert audit.collect()[0]["lang_pred"] == "de"
    names = [s["stage"] for s in state["stages"]]
    assert names.index("lang_filter") < names.index("badwords")


def test_curate_drop_noindex_stage(spark, tmp_path):
    """drop_noindex honors the robots meta on raw-crawl input: noindex/none
    pages are rejected with an audit table before any text-keyed stage."""
    import datetime

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    ts = datetime.datetime(2024, 1, 1)

    def page(body, robots=None):
        meta = (f'<meta name="robots" content="{robots}">' if robots else "")
        return (f"<html><head>{meta}</head><body><p>{body}</p>"
                "</body></html>").encode()

    rows = [
        ("https://a.example/1", ts, page("keep this page text")),
        ("https://b.example/2", ts, page("secret page", "noindex, follow")),
        ("https://c.example/3", ts, page("also hidden", "NONE")),
        ("https://d.example/4", ts, page("indexable page", "index, follow")),
    ]
    src = str(tmp_path / "raw")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary") \
        .write.parquet(src)
    out = str(tmp_path / "curated_ni")
    state = curate_and_encode_corpus(
        spark, src, out, drop_noindex=True, do_quality=False,
        do_c4_clean=False, do_near_dedup=False, units_per_job=4)
    c = state["counts"]
    assert c["rejected"]["noindex"] == 2
    assert c["kept"] == 2
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    names = [s["stage"] for s in state["stages"]]
    assert names[:2] == ["extract", "noindex"]

    # guard: tabular input without markup cannot honor robots
    with pytest.raises(ValueError):
        flat = str(tmp_path / "flat")
        spark.createDataFrame([("u", ts, "t")],
                              "url string, warc_ts timestamp, text string") \
            .write.parquet(flat)
        curate_and_encode_corpus(spark, flat, str(tmp_path / "x"),
                                 drop_noindex=True, do_quality=False,
                                 do_c4_clean=False, do_near_dedup=False)


def test_curate_dsir_stage(spark, corpus, tmp_path):
    """With a target table, the DSIR stage keeps roughly keep_frac of the
    post-dedup survivors (deterministic weighted sample), counts conserve,
    and the reject audit carries the importance score."""
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    tgt = str(tmp_path / "dsir_tgt")
    (spark.read.parquet(corpus)
     .filter(F.pmod(F.xxhash64("url"), F.lit(12)) == 4)
     .select("text").limit(60).write.parquet(tgt))

    out = str(tmp_path / "curated_dsir")
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, near_threshold=0.6,
        units_per_job=4, dsir_target_src=tgt, dsir_keep_frac=0.5)
    counts = state["counts"]
    assert state["conserved"]
    assert counts["rejected"]["dsir"] > 0
    survivors_before = counts["kept"] + counts["rejected"]["dsir"]
    frac = counts["kept"] / survivors_before
    assert 0.2 < frac < 0.8  # expected 0.5, loose band for weight skew
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=dsir"))
    assert rej.count() == counts["rejected"]["dsir"]
    assert "__dsir_score" in rej.columns
    # determinism: rerunning into a fresh dir keeps the identical set
    out2 = str(tmp_path / "curated_dsir2")
    state2 = curate_and_encode_corpus(
        spark, corpus, out2, quality_rules=RULES, near_threshold=0.6,
        units_per_job=4, dsir_target_src=tgt, dsir_keep_frac=0.5)
    assert state2["counts"] == counts


def test_curate_semdedup_stage(spark, tmp_path):
    """--semdedup appends a SemDeDup pass after MinHash near-dedup: two
    docs sharing a bag of words (paraphrase-grade duplication that 3-token
    shingles miss) collapse to one; counts conserve; the stage records its
    params in the lineage."""
    import datetime

    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    ts = datetime.datetime(2024, 1, 1)
    a = "alpha beta gamma delta epsilon zeta"
    # same multiset of words, different order: identical hashed embedding
    # (cosine 1.0) but no shared 3-shingle run beyond chance
    b = "zeta epsilon delta gamma beta alpha"
    other = "totally unrelated subject matter entirely different words"
    rows = [
        ("https://h1.example/a", ts, a),
        ("https://h2.example/b", ts, b),
        ("https://h3.example/c", ts, other),
    ]
    src = str(tmp_path / "src_sem")
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string") \
        .write.parquet(src)

    out = str(tmp_path / "sem_out")
    state = curate_and_encode_corpus(
        spark, src, out, do_quality=False, do_c4_clean=False,
        do_near_dedup=True, near_threshold=0.9,
        do_semdedup=True, semdedup_tau=0.99, semdedup_k=2,
        units_per_job=4)
    c = state["counts"]
    assert c["rejected"].get("near_dedup", 0) == 0  # shingles differ
    assert c["rejected"]["semantic_dedup"] == 1     # bag-of-words dup
    assert c["kept"] == 2
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    sem = [s for s in state["stages"] if s["stage"] == "semantic_dedup"][0]
    assert sem["tau"] == 0.99 and sem["k"] == 2
    names = [s["stage"] for s in state["stages"]]
    assert names.index("near_dedup") < names.index("semantic_dedup")


def test_curate_robots_stage(spark, corpus, tmp_path):
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    # robots corpus: hosts www.host0/1/2.example.com disallow /page/ for
    # everyone — every base doc on those hosts must be rejected at the
    # robots stage; unknown hosts (the rest of the corpus) pass
    robots = str(tmp_path / "robots")
    spark.createDataFrame(
        [(f"www.host{i}.example.com",
          "User-agent: *\nDisallow: /page/\n") for i in range(3)],
        "host string, robots_txt string").write.parquet(robots)
    out = str(tmp_path / "curated_robots")
    state = curate_and_encode_corpus(
        spark, corpus, out, quality_rules=RULES, robots_src=robots,
        do_near_dedup=False, units_per_job=4)
    assert [s["stage"] for s in state["stages"]][0] == "robots"
    c = state["counts"]
    assert c["rejected"]["robots"] > 0
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    staged = spark.read.parquet(os.path.join(out, "_staging"))
    # the blocked hosts are gone; prefixed variants (dup./near./short.
    # example hosts that merely EMBED the blocked host in their path)
    # correctly pass — the verdict keys on the URL's host, not substrings
    for i in range(3):
        assert staged.filter(F.col("url").startswith(
            f"https://www.host{i}.example.com")).count() == 0
    # reject audit table exists with the doc lineage key
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=robots"))
    assert rej.count() == c["rejected"]["robots"]
    assert "__doc_id" in rej.columns


def test_curate_charset_aware_extract(spark, tmp_path):
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    # cp1252-declared pages: with charset_aware the extracted text keeps
    # the real characters; the lossy default would U+FFFD them
    body = ("the quick brown fox jumps over the lazy dog and the caf\xe9 "
            "serves coffee for €5 every morning with cream and sugar "
            "while people read papers and talk about the weather today")
    page = f'<meta charset="windows-1252"><body><p>{body}</p></body>'
    rows = [(f"https://cs.example/p{i}", page.encode("cp1252"))
            for i in range(12)]
    src = str(tmp_path / "cs_src")
    df = spark.createDataFrame(rows, "url string, html binary")
    df = df.withColumn("warc_ts", F.current_timestamp())
    df.write.parquet(src)
    out = str(tmp_path / "curated_cs")
    state = curate_and_encode_corpus(
        spark, src, out, charset_aware=True, do_quality=False,
        do_c4_clean=False, do_near_dedup=False, units_per_job=4)
    staged = spark.read.parquet(os.path.join(out, "_staging"))
    texts = [r["text"] for r in staged.collect()]
    assert texts and all("café" in t and "€5" in t for t in texts)


def test_curate_url_quality_stage(spark, corpus, tmp_path):
    from nail_parquet_spark.pipeline.curate import curate_and_encode_corpus

    # poison a deterministic slice of URLs with a banned asset extension:
    # the URL gate must reject exactly those BEFORE any text stage runs
    src = str(tmp_path / "src_urlq")
    base = spark.read.parquet(corpus)
    bucket = F.pmod(F.xxhash64("url"), F.lit(10))
    poisoned = base.withColumn(
        "url",
        F.when(bucket == 0, F.concat(F.col("url"), F.lit("/logo.png")))
        .otherwise(F.col("url")))
    poisoned.write.parquet(src)
    n_bad = poisoned.filter(F.col("url").endswith(".png")).count()
    assert n_bad > 0
    out = str(tmp_path / "curated_urlq")
    state = curate_and_encode_corpus(
        spark, src, out, quality_rules=RULES, do_url_quality=True,
        do_near_dedup=False, units_per_job=4)
    assert [s["stage"] for s in state["stages"]][0] == "url_quality"
    c = state["counts"]
    assert c["rejected"]["url_quality"] == n_bad
    assert c["input"] == c["kept"] + sum(c["rejected"].values())
    staged = spark.read.parquet(os.path.join(out, "_staging"))
    assert staged.filter(F.col("url").endswith(".png")).count() == 0
    rej = spark.read.parquet(os.path.join(out, "_rejects", "stage=url_quality"))
    assert rej.count() == n_bad and "__doc_id" in rej.columns
