"""Text analysis, dedup, and similarity tests."""
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.functions.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from nail_parquet_spark.functions.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from nail_parquet_spark.functions.text import lang_id, quality_metrics, token_count


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and the dog barked at the cat loudly"),
        (2, "the cat sat on the mat and the dog barked at the cat loudly"),  # exact dup of 1
        (3, "the cat sat on the mat and the dog barked at the cat quietly"),  # near dup
        (4, "der hund und die katze sind freunde und das ist gut so"),
        (5, "completely different content about distributed query engines"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  ",), ("one",)], "t string")
    got = [r[0] for r in df.select(token_count(F.col("t"))).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en" and got[4] == "de" and got[6] == "und"


def test_quality_metrics(spark):
    df = spark.createDataFrame([("ab 12!",)], "t string")
    r = df.select(*quality_metrics(F.col("t"))).collect()[0]
    assert r["n_chars"] == 6 and r["n_tokens"] == 2
    assert r["digit_ratio"] == pytest.approx(2 / 6, abs=1e-6)
    assert r["punct_ratio"] == pytest.approx(1 / 6, abs=1e-6)


def test_exact_dedup(docs):
    dups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(dups) == 1 and dups[0]["keep_id"] == 1 and dups[0]["n_docs"] == 2
    kept = dedup_exact(docs, "doc_id", "text")
    assert kept.count() == 5
    assert 2 not in {r["doc_id"] for r in kept.collect()}


def test_exact_dedup_null_texts_pass_through(spark):
    """NULL texts must survive dedup untouched and never form a dup cluster
    (regression: inner join on fingerprint equality dropped them)."""
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in dedup_exact(df, "doc_id", "text").collect()}
    assert kept == {1, 3, 4, 5}
    dups = exact_duplicates(df, "doc_id", "text").collect()
    assert len(dups) == 1 and dups[0]["keep_id"] == 1  # no NULL cluster


def test_simhash_banding_guards(docs):
    sig = simhash(docs, "doc_id", "text", bits=32)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(sig, "doc_id", bits=32, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="divisible"):
        simhash_near_pairs(sig, "doc_id", bits=32, max_hamming=2, bands=5)


def test_ngram_doc_freq_cap_parameterized(docs):
    # cap of 0 removes every shingle from candidate generation -> no pairs
    assert ngram_jaccard_pairs(docs, "doc_id", "text", max_doc_freq=0).count() == 0
    assert ngram_jaccard_pairs(docs, "doc_id", "text", max_doc_freq=1000).count() > 0


def test_minhash_lsh_finds_near_dups(docs):
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    cand = minhash_lsh_candidates(sigs, "doc_id", num_hashes=8, bands=4)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 2) in pairs  # exact dup must collide in every band
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup collides in some band


def test_ngram_jaccard(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0
    assert any(k in pairs for k in [(1, 3), (2, 3)])
    assert all(k[0] < 4 and k[1] < 4 for k in pairs)  # 4,5 unrelated


def test_simhash_hamming(docs):
    sig = simhash(docs, "doc_id", "text", bits=32)
    # max_hamming=6 needs >6 bands for pigeonhole completeness
    near = simhash_near_pairs(sig, "doc_id", bits=32, max_hamming=6, bands=8)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in near.collect()}
    assert got.get((1, 2)) == 0  # identical text -> identical simhash


def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter(F.col("vec_id") == 0)
    top = cosine_topk_bruteforce(df, q, "vec_id", "v", k=2).collect()
    assert [r["neighbor_id"] for r in top] == [1, 2]
    lsh = cosine_topk_lsh(df, q, "vec_id", "v", k=1, n_planes=8, seed=1).collect()
    assert lsh[0]["neighbor_id"] == 1  # nearest survives LSH pruning


def test_multimodal_plumbing(spark):
    from nail_parquet_spark.functions.multimodal import extract_media_features

    df = spark.createDataFrame([(1, b"abc"), (2, None)], "doc_id long, blob binary")
    out = extract_media_features(df, "doc_id", "blob", dim=4, fake=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 3 and len(rows[1]["features"]) == 4
    assert rows[2]["n_bytes"] == 0 and rows[2]["content_hash"] is None


def test_cosine_topk_ivf(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((3, 16))
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (base[c] + 0.05 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    from nail_parquet_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    q = df.filter(F.col("vec_id") < 3)
    exact = cosine_topk_bruteforce(df, q, "vec_id", "v", k=3).collect()
    approx = cosine_topk_ivf(df, q, "vec_id", "v", k=3, n_clusters=4, nprobe=2).collect()
    exact_top = {(r["query_id"], r["neighbor_id"]) for r in exact if r["rank"] == 1}
    approx_top = {(r["query_id"], r["neighbor_id"]) for r in approx if r["rank"] == 1}
    # tight clusters: IVF with 2 probes must recover every rank-1 neighbor
    assert exact_top == approx_top


def test_dedup_near_duplicates_onecall(docs):
    from nail_parquet_spark.functions.dedup import dedup_near_duplicates

    out = dedup_near_duplicates(docs, "doc_id", "text", threshold=0.6)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids and 2 not in ids  # exact dup dropped
    assert 3 not in ids  # near dup dropped
    assert {4, 5, 6} <= ids  # distinct docs and the empty doc survive


def test_cosine_topk_pq(spark):
    """PQ with exact rerank must recover every rank-1 neighbor on tight
    clusters (candidate list >> k), and its reported cosines are EXACT
    (rerank recomputes them from the real vectors)."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal((4, 16))
    rows = []
    for i in range(120):
        c = i % 4
        rows.append((i, (base[c] + 0.05 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>").repartition(3)
    from nail_parquet_spark.functions.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
        pq_encode,
        pq_train,
    )

    q = df.filter(F.col("vec_id") < 4)
    exact = cosine_topk_bruteforce(df, q, "vec_id", "v", k=3).collect()
    approx = cosine_topk_pq(df, q, "vec_id", "v", k=3, m=4, n_centroids=16,
                            candidates_per_query=30).collect()
    exact_top = {(r["query_id"], r["neighbor_id"]) for r in exact if r["rank"] == 1}
    approx_top = {(r["query_id"], r["neighbor_id"]) for r in approx if r["rank"] == 1}
    assert exact_top == approx_top
    ecos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in ecos:
            assert abs(r["cosine"] - ecos[key]) < 1e-9  # exact rerank

    # the encoded representation is m small ints per vector
    books = pq_train(df, "v", m=4, k=16)
    codes = pq_encode(df, "vec_id", "v", books)
    row = codes.first()
    assert len(row["pq_code"]) == 4
    assert codes.count() == 120


def test_cosine_topk_pq_robustness(spark):
    """PQ must skip NULL/ragged vectors (excluded from the index, like a
    filter) and preserve non-long id types end to end."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = [(f"doc{i:03d}", rng.standard_normal(8).tolist()) for i in range(40)]
    rows.append(("docNULL", None))
    rows.append(("docRAGGED", [1.0, 2.0]))
    df = spark.createDataFrame(rows, "vec_id string, v array<double>").repartition(2)
    from nail_parquet_spark.functions.similarity import cosine_topk_pq, pq_encode, pq_train

    books = pq_train(df, "v", m=2, k=8)
    codes = pq_encode(df, "vec_id", "v", books)
    got = {r["vec_id"] for r in codes.collect()}
    assert "docNULL" not in got and "docRAGGED" not in got
    assert len(got) == 40
    q = df.filter(F.col("vec_id") < "doc003")
    out = cosine_topk_pq(df, q, "vec_id", "v", k=2, m=2, n_centroids=8,
                         candidates_per_query=20)
    rows_ = out.collect()
    assert {type(r["query_id"]) for r in rows_} == {str}
    assert all(r["neighbor_id"] not in ("docNULL", "docRAGGED") for r in rows_)
    assert out.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 2


def test_cosine_topk_pq_int_ids_and_empty_queries(spark):
    """Confirmed repro from review: int (32-bit) id columns must flow
    through the arrow schemas; all-invalid queries return an empty frame."""
    import numpy as np

    rng = np.random.default_rng(13)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    from nail_parquet_spark.functions.similarity import cosine_topk_pq

    out = cosine_topk_pq(df, df.filter(F.col("vec_id") < 2), "vec_id", "v",
                         k=2, m=2, n_centroids=8, candidates_per_query=10)
    got = out.collect()
    assert len(got) == 4 and all(isinstance(r["neighbor_id"], int) for r in got)

    empty_q = spark.createDataFrame([(99, None)], "vec_id int, v array<double>")
    out2 = cosine_topk_pq(df, empty_q, "vec_id", "v", k=2, m=2, n_centroids=8)
    assert out2.count() == 0
    assert out2.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_embedding_near_dup_banded_recall(spark):
    """Banded OR-construction must recover >=90% of true cosine>=0.95 pairs
    (VERDICT r3: the old single 12-plane signature lost ~28% at theta=0.95).
    Ground truth is exact numpy all-pairs on the same fixture."""
    import numpy as np

    from nail_parquet_spark.functions.similarity import embedding_near_duplicates

    rng = np.random.default_rng(11)
    vecs = []
    for i in range(60):  # 60 near-dup pairs: base + tiny-noise copy
        b = rng.standard_normal(16)
        b /= np.linalg.norm(b)
        vecs.append(b)
        noisy = b + 0.03 * rng.standard_normal(16)
        vecs.append(noisy / np.linalg.norm(noisy))
    for _ in range(120):  # unrelated fillers
        v = rng.standard_normal(16)
        vecs.append(v / np.linalg.norm(v))
    X = np.array(vecs)
    S = X @ X.T
    truth = {(i, j) for i in range(len(X)) for j in range(i + 1, len(X))
             if S[i, j] >= 0.95}
    assert len(truth) >= 50  # fixture sanity: enough true pairs to measure
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))], "vec_id long, v array<double>"
    )
    got = {(r["id_a"], r["id_b"])
           for r in embedding_near_duplicates(df, "vec_id", "v", threshold=0.95).collect()}
    assert not got - truth  # exact verify: zero false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(truth)} true pairs"


def test_embedding_near_dup_hot_bucket_chain(spark):
    """A cluster of near-identical vectors (the hottest possible bucket) must
    not go quadratic: above max_bucket the bucket switches to chain linking,
    so pair count stays linear while the cluster remains connected through
    consecutive-id pairs."""
    import numpy as np

    from nail_parquet_spark.functions.similarity import (
        embedding_lsh_candidates,
        embedding_near_duplicates,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = [(i, base.tolist()) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cand = embedding_lsh_candidates(df, "vec_id", "v", max_bucket=10, chain_width=3)
    n_cand = cand.count()
    assert n_cand <= 3 * 99  # linear (clique would be 4950)
    pairs = {(r["id_a"], r["id_b"])
             for r in embedding_near_duplicates(
                 df, "vec_id", "v", threshold=0.95, max_bucket=10, chain_width=3
             ).collect()}
    # chain linking keeps the cluster connected: every consecutive-id pair
    for i in range(99):
        assert (i, i + 1) in pairs


def test_multimodal_hash_identity(spark):
    """The vectorized (mapInArrow) path must produce md5 hashes and fake
    features byte-identical to the per-row definition."""
    import hashlib

    from nail_parquet_spark.functions.multimodal import (
        _fake_features,
        extract_media_features,
    )

    blobs = [b"", b"abc", b"x" * 10_000, bytes(range(256)), None]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id long, blob binary"
    )
    out = {r["doc_id"]: r for r in
           extract_media_features(df, "doc_id", "blob", dim=8).collect()}
    for i, b in enumerate(blobs):
        if b is None:
            assert out[i]["content_hash"] is None
            assert out[i]["n_bytes"] == 0
            assert out[i]["features"] == [0.0] * 8
        else:
            assert out[i]["content_hash"] == hashlib.md5(b).hexdigest()
            assert out[i]["n_bytes"] == len(b)
            assert out[i]["features"] == pytest.approx(_fake_features(b, 8), abs=0)


def test_connected_components_chain_and_cliques(spark):
    from nail_parquet_spark.functions.graph import connected_components

    # chain 1-..-6 (diameter 5) + clique {10,11,12} + isolated pair (20,21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (21, 20)],
        "id_a long, id_b long",
    )
    got = {r.id: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_max_iter_raises(spark):
    from nail_parquet_spark.functions.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="converge"):
        connected_components(chain, max_iter=2)


def test_dedup_by_components_keeps_canonical_and_singletons(spark):
    from nail_parquet_spark.functions.graph import dedup_by_components

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 10, 11, 40)], "doc_id long, t string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = sorted(r.doc_id for r in dedup_by_components(df, "doc_id", pairs).collect())
    assert kept == [1, 10, 40]  # cluster minima + untouched singleton


def test_vocabulary_counts(spark):
    from nail_parquet_spark.functions.text import vocabulary

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, ""), (4, "  ")],
        "doc_id long, text string",
    )
    got = {r.token: (r.tf, r.n_docs) for r in vocabulary(docs, "doc_id", "text").collect()}
    assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}
    got2 = {r.token for r in vocabulary(docs, "doc_id", "text", min_df=2).collect()}
    assert got2 == {"a"}


def test_keywords_tfidf_ranks_distinctive_tokens(spark):
    from nail_parquet_spark.functions.text import keywords_tfidf

    docs = spark.createDataFrame(
        [(1, "common zebra zebra"), (2, "common yak"), (3, "common common")],
        "doc_id long, text string",
    )
    out = keywords_tfidf(docs, "doc_id", "text", k=2).collect()
    top = {r.doc_id: r.token for r in out if r.rank == 1}
    # the doc-specific rare token outranks the ubiquitous one
    assert top[1] == "zebra" and top[2] == "yak" and top[3] == "common"


def test_dedup_near_duplicates_transitive_collapses_chains(spark):
    from nail_parquet_spark.functions.dedup import dedup_near_duplicates

    # b and c both near-dup a's text; all three form one cluster
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, base + " bonus"),
            (9, "completely different content about spark engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    kept_t = sorted(
        r.doc_id
        for r in dedup_near_duplicates(
            docs, "doc_id", "text", threshold=0.6, num_hashes=16, bands=8,
            transitive=True,
        ).collect()
    )
    assert kept_t == [1, 9]


def test_lang_id_table_matches_column(spark):
    from nail_parquet_spark.functions.text import lang_id, lang_id_table

    rows = [(1, "the cat and the dog"), (2, "der hund und die katze ist"),
            (3, "le chat et la maison est"), (4, ""), (5, "xyzzy plugh"),
            (6, "el que los es"), (7, "il che di la è")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    a = sorted(df.select("doc_id", lang_id(F.col("text")).alias("lang_pred")).collect())
    b = sorted(lang_id_table(df, "doc_id", "text").collect())
    assert a == b
    plan = lang_id_table(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_metrics_table_matches_columns(spark):
    from pyspark.sql import functions as F

    from nail_parquet_spark.functions.text import (
        quality_metrics, quality_metrics_table,
    )

    rows = [(1, "Hello, world! 123"), (2, ""), (3, "  a  b  "),
            (4, "no punct here"), (5, "123 456")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(df.select("doc_id", *quality_metrics(F.col("text"))).collect())
    b = sorted(quality_metrics_table(df, "doc_id", "text").collect())
    assert a == b


def test_corpus_stats_global_and_grouped(spark):
    from nail_parquet_spark.functions.text import corpus_stats

    rows = [(1, "a b c", "en"), (2, "", "en"), (3, "x y", "de"), (4, "z", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    g = corpus_stats(df, "text").collect()[0]
    assert (g["n_docs"], g["n_tokens"], g["n_chars"]) == (4, 6, 9)
    assert g["avg_tokens_per_doc"] == 1.5
    per = {r["lang"]: r for r in corpus_stats(df, "text", group_by="lang").collect()}
    assert per["en"]["n_docs"] == 2 and per["en"]["n_tokens"] == 3
    assert per["de"]["n_tokens"] == 2
    assert per[None]["n_docs"] == 1  # NULL group preserved


def test_dedup_near_duplicates_score_policy(spark):
    from nail_parquet_spark.functions.dedup import dedup_near_duplicates

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the quiet hills before sunset tonight")
    rows = [
        (1, base + " v1", 0.2),
        (2, base + " v2", 0.9),   # near-dup cluster {1,2,3}; 2 scores best
        (3, base + " v3", 0.5),
        (4, "completely different content about distributed query engines", 0.1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    kept = dedup_near_duplicates(df, "doc_id", "text", threshold=0.5,
                                 score_col="q")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [2, 4]
    # min-id policy keeps 1 instead
    kept2 = dedup_near_duplicates(df, "doc_id", "text", threshold=0.5,
                                  transitive=True)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 4]


def test_chunk_documents_hand_computed(spark):
    from nail_parquet_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "  a   b  "), (3, "   "),
         (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = sorted(
        (r.doc_id, r.chunk_id, r.token_start, r.n_tokens, r.chunk_text)
        for r in out.collect()
    )
    # doc 1: stride 3 -> starts 0,3,6,9; doc 2: whitespace-normalized single
    # chunk; docs 3/4 (blank / NULL text) yield nothing
    assert rows == [
        (1, 0, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 3, 4, "t4 t5 t6 t7"),
        (1, 2, 6, 4, "t7 t8 t9 t10"),
        (1, 3, 9, 1, "t10"),
        (2, 0, 0, 2, "a b"),
    ]


def test_chunk_documents_no_overlap_and_validation(spark):
    import pytest as _pytest

    from nail_parquet_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=2).collect()
    assert [(r.chunk_id, r.chunk_text) for r in sorted(out, key=lambda r: r.chunk_id)] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


class TestPagerank:
    def _ranks(self, spark, rows, **kw):
        from nail_parquet_spark.functions.graph import pagerank

        e = spark.createDataFrame(rows, "src string, dst string")
        return {r["node"]: r["rank"]
                for r in pagerank(e, "src", "dst", **kw).collect()}

    def test_one_iteration_hand_computed(self, spark):
        # A->B, A->C, B->A; C dangling. n=3, d=0.85, uniform start 1/3.
        got = self._ranks(spark, [("A", "B"), ("A", "C"), ("B", "A")],
                          iterations=1)
        base = 0.15 / 3
        assert got["A"] == pytest.approx(base + 0.85 * (1 / 3))
        assert got["B"] == pytest.approx(base + 0.85 * (1 / 6))
        assert got["C"] == pytest.approx(base + 0.85 * (1 / 6))

    def test_zero_iterations_uniform(self, spark):
        got = self._ranks(spark, [("A", "B"), ("B", "C")], iterations=0)
        assert sorted(got.values()) == pytest.approx([1 / 3] * 3)

    def test_hub_ranks_highest_and_mass_bounded(self, spark):
        # every node links to HUB; ranks stay a probability-ish vector
        rows = [(f"n{i}", "HUB") for i in range(6)] + [("HUB", "n0")]
        got = self._ranks(spark, rows, iterations=10)
        # HUB outranks every pure leaf (n0 gets ALL of HUB's mass, so it
        # may legitimately exceed HUB — it is not a pure leaf)
        for i in range(1, 6):
            assert got["HUB"] > got[f"n{i}"]
        assert 0 < sum(got.values()) <= 1.0 + 1e-9

    def test_weighted_edges(self, spark):
        from nail_parquet_spark.functions.graph import pagerank

        e = spark.createDataFrame(
            [("A", "B", 3.0), ("A", "C", 1.0)], "src string, dst string, w double")
        got = {r["node"]: r["rank"]
               for r in pagerank(e, "src", "dst", weight_col="w",
                                 iterations=1).collect()}
        base = 0.15 / 3
        assert got["B"] == pytest.approx(base + 0.85 * (1 / 3) * 0.75)
        assert got["C"] == pytest.approx(base + 0.85 * (1 / 3) * 0.25)

    def test_parallel_edges_collapse(self, spark):
        # A->B twice + A->C once == weights 2 and 1
        got = self._ranks(spark, [("A", "B"), ("A", "B"), ("A", "C")],
                          iterations=1)
        base = 0.15 / 3
        assert got["B"] == pytest.approx(base + 0.85 * (1 / 3) * (2 / 3))
        assert got["C"] == pytest.approx(base + 0.85 * (1 / 3) * (1 / 3))


def test_soft_dedup_weights_exact(spark):
    from nail_parquet_spark.functions.dedup import soft_dedup_weights

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["dup_count"], r["weight"])
           for r in soft_dedup_weights(df, "doc_id", "text").collect()}
    assert len(out) == 5  # nothing dropped
    assert out[1] == (3, pytest.approx(1 / 3)) == out[2] == out[3]
    assert out[4] == (1, 1.0)  # NULL text: weight 1.0, no cluster
    assert out[5] == (1, 1.0)
    # corpus mass per distinct text is 1.0
    assert sum(w for _, w in out.values()) == pytest.approx(3.0)


def test_soft_dedup_weights_near_transitive(docs):
    from nail_parquet_spark.functions.dedup import soft_dedup_weights

    out = {r["doc_id"]: (r["dup_count"], r["weight"])
           for r in soft_dedup_weights(
               docs, "doc_id", "text", near=True, threshold=0.6).collect()}
    assert len(out) == 6
    # 1-2 exact dup + 2-3 near dup chain -> one connected cluster of 3
    assert out[1] == (3, pytest.approx(1 / 3)) == out[2] == out[3]
    assert out[4] == (1, 1.0) and out[5] == (1, 1.0) and out[6] == (1, 1.0)


def test_bm25_search_matches_reference_model(spark):
    import math

    from nail_parquet_spark.functions.text import bm25_search

    rows = [
        (1, "spark query engine fast query"),
        (2, "slow table scan"),
        (3, "query"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_search(df, "doc_id", "text", "query engine", k=10).collect()

    # independent python model of the pinned formula
    k1, b = 1.2, 0.75
    docs = {i: (t or "").strip().lower().split() for i, t in rows}
    N = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / N
    def idf(term):
        nt = sum(1 for w in docs.values() if term in w)
        return math.log(1 + (N - nt + 0.5) / (nt + 0.5))
    exp = {}
    for i, w in docs.items():
        s = 0.0
        m = 0
        for term in ("engine", "query"):
            tf = w.count(term)
            if tf:
                m += 1
                s += idf(term) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if m:
            exp[i] = (round(s, 6), m)
    assert {r["doc_id"]: (r["score"], r["matched_terms"]) for r in got} == exp
    # doc 1 (2 query hits + engine) outranks doc 3 (short but single hit)
    assert got[0]["doc_id"] in (1, 3) and len(got) == 2
    assert got[0]["score"] == max(v[0] for v in exp.values())


def test_bm25_topk_ties_and_plan(spark):
    from nail_parquet_spark.functions.text import bm25_search

    df = spark.createDataFrame(
        [(i, "common token") for i in range(20)], "doc_id long, text string")
    got = bm25_search(df, "doc_id", "text", "token", k=5).collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]  # tie -> id asc
    plan = bm25_search(df, "doc_id", "text", "token", k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_logprob_matches_python_model(spark):
    import math

    from nail_parquet_spark.functions.text import bigram_logprob

    rows = [
        (1, "a b a b c"),
        (2, "a b"),
        (3, "c c c"),
        (4, "x"),       # single token: 0 transitions
        (5, ""),        # empty
        (6, None),      # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_transitions"], r["mean_logprob"], r["perplexity"])
           for r in bigram_logprob(df, "doc_id", "text", lam=0.7).collect()}

    # independent model
    docs = {i: (t or "").strip().lower().split() for i, t in rows}
    T = sum(len(w) for w in docs.values())
    from collections import Counter
    uni = Counter(tok for w in docs.values() for tok in w)
    pairs = Counter((w[i - 1], w[i]) for w in docs.values()
                    for i in range(1, len(w)))
    cpred = Counter()
    for (v, _), c in pairs.items():
        cpred[v] += c
    for i, w in docs.items():
        trans = [(w[j - 1], w[j]) for j in range(1, len(w))]
        if not trans:
            assert got[i] == (0, None, None)
            continue
        lps = [math.log(0.7 * (pairs[p] / cpred[p[0]]) + 0.3 * (uni[p[1]] / T))
               for p in trans]
        m = sum(lps) / len(lps)
        assert got[i] == (len(trans), round(m, 6), round(math.exp(-m), 6))


def test_dsir_weights_matches_python_model(spark):
    import math

    from nail_parquet_spark.functions.text import dsir_weights, word_hash

    raw_rows = [(1, "good clean prose here"), (2, "spam spam spam buy"),
                (3, ""), (4, None)]
    tgt_rows = [(10, "good clean prose"), (11, "clean prose here")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    B, a = 64, 1.0
    got = {r["doc_id"]: (r["n_tokens"], r["log_weight"])
           for r in dsir_weights(raw, tgt, "doc_id", "text", buckets=B).collect()}

    # python model using the SAME portable hash (computed via Spark once)
    toks = sorted({t for _, x in raw_rows + tgt_rows if x for t in x.split()})
    hdf = spark.createDataFrame([(t,) for t in toks], "token string")
    from pyspark.sql import functions as F
    hmap = {r["token"]: r["b"] for r in
            hdf.select("token", (word_hash(F.col("token")) % B).alias("b")).collect()}
    from collections import Counter
    raw_c = Counter(hmap[t] for _, x in raw_rows if x for t in x.split())
    tgt_c = Counter(hmap[t] for _, x in tgt_rows if x for t in x.split())
    rT, tT = sum(raw_c.values()), sum(tgt_c.values())
    def lr(b):
        return (math.log((tgt_c.get(b, 0) + a) / (tT + a * B))
                - math.log((raw_c.get(b, 0) + a) / (rT + a * B)))
    for i, x in raw_rows:
        ws = (x or "").split()
        exp = round(sum(lr(hmap[t]) for t in ws), 6) if ws else 0.0
        assert got[i] == (len(ws), exp), f"doc {i}"
    # the clean doc must outrank the spam doc toward the clean target
    assert got[1][1] > got[2][1]
