"""BPE tokenizer: merges vs an independent Sennrich-style reference
implementation, encode vs sequential merge application, scale-shape
pins (distinct-word dictionary, broadcast join)."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.bpe import EOW, bpe_encode, bpe_train


def ref_train(word_freqs, num_merges, min_pair_freq=2):
    """Independent reference: Sennrich et al. 2016 pseudo-code, dict-based."""
    words = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        new = {}
        for syms, f in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def ref_encode(word, merges):
    """Apply merges sequentially in creation order (training semantics)."""
    syms = list(word) + [EOW]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest widest"),
    (6, ""),
    (7, None),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bpe_train_matches_reference(corpus):
    got = [(r["left"], r["right"]) for r in
           bpe_train(corpus, "doc_id", "text", num_merges=12)
           .orderBy("rank").collect()]
    from collections import Counter
    wf = Counter(w for _, t in CORPUS if t for w in t.split())
    assert got == ref_train(wf, 12)
    assert len(got) > 3  # the classic corpus yields est/lo/w merges


def test_bpe_encode_matches_sequential_application(corpus):
    merges_df = bpe_train(corpus, "doc_id", "text", num_merges=12)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    got = {r["doc_id"]: (r["tokens"], r["n_tokens"]) for r in
           bpe_encode(corpus, merges_df, "doc_id", "text").collect()}
    for i, t in CORPUS:
        if not t:
            assert got[i] == ([], 0)
            continue
        exp = [tok for w in t.split() for tok in ref_encode(w, merges)]
        assert got[i] == (exp, len(exp)), f"doc {i}"


def test_bpe_encode_plan_is_dictionary_join(corpus):
    merges_df = bpe_train(corpus, "doc_id", "text", num_merges=5)
    plan = bpe_encode(corpus, merges_df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # word dictionary broadcasts
    assert "PythonMapInArrow" in plan or "MapInArrow" in plan


def test_bpe_unseen_word_falls_back_to_chars(spark, corpus):
    merges_df = bpe_train(corpus, "doc_id", "text", num_merges=12)
    other = spark.createDataFrame([(1, "zq")], "doc_id long, text string")
    row = bpe_encode(other, merges_df, "doc_id", "text").collect()[0]
    assert row["tokens"] == ["z", "q", EOW]


def test_cli_tokenize_roundtrip(spark, tmp_path):
    from nail_parquet_spark.cli import main

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(CORPUS, "doc_id long, text string").write.parquet(src)
    merges = str(tmp_path / "merges.parquet")
    assert main(["tokenize", src, "--mode", "train", "--id-column", "doc_id",
                 "--num-merges", "8", "-o", merges]) == 0
    assert spark.read.parquet(merges).count() > 0
    out = str(tmp_path / "toks.parquet")
    assert main(["tokenize", src, "--mode", "encode", "--merges", merges,
                 "--id-column", "doc_id", "-o", out]) == 0
    got = spark.read.parquet(out)
    assert got.filter("doc_id = 1").collect()[0]["n_tokens"] > 0
    assert got.filter("doc_id = 6").collect()[0]["n_tokens"] == 0
