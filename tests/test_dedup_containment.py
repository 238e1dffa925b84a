"""Asymmetric n-gram containment pairs (functions/dedup.ngram_containment_pairs):
the subset-duplication case Jaccard misses, plus parity of the shared
candidate machinery."""
import pytest

from nail_parquet_spark.functions.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

SHORT = "alpha beta gamma delta epsilon zeta"
LONG = SHORT + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, SHORT),              # embedded verbatim in 2
            (2, LONG),               # superset of 1
            (3, "unrelated words entirely different content here now"),
            (4, SHORT),              # exact dup of 1
            (5, ""),                 # no shingles
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_containment_catches_subset_dup(docs):
    pairs = {(r.id_a, r.id_b): r
             for r in ngram_containment_pairs(docs, "doc_id", "text",
                                              threshold=0.9).collect()}
    # doc 1 fully contained in doc 2: containment_a = 1.0, but Jaccard is
    # tiny (4 shared shingles / ~94 union) -> invisible to jaccard at any
    # useful threshold
    assert (1, 2) in pairs
    assert pairs[(1, 2)].containment_a == 1.0
    assert pairs[(1, 2)].containment_b < 0.1
    assert (1, 4) in pairs and pairs[(1, 4)].containment_a == 1.0
    jac = {(r.id_a, r.id_b)
           for r in ngram_jaccard_pairs(docs, "doc_id", "text",
                                        threshold=0.5).collect()}
    assert (1, 2) not in jac          # the case this operator exists for
    assert (1, 4) in jac              # exact dups still caught by both


def test_containment_threshold_and_empties(docs):
    got = ngram_containment_pairs(docs, "doc_id", "text", threshold=1.01)
    assert got.count() == 0           # nothing exceeds 1.0
    ids = {r.id_a for r in ngram_containment_pairs(
        docs, "doc_id", "text", threshold=0.9).collect()}
    assert 5 not in ids and 6 not in ids   # empty/null docs emit no pairs


def test_containment_symmetric_columns(docs):
    rows = ngram_containment_pairs(docs, "doc_id", "text",
                                   threshold=0.9).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 <= r.containment_b <= 1.0 and 0.0 <= r.containment_a <= 1.0
