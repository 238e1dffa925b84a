"""Entropy-signal kernel (functions/entropy.py): pure-python-model parity
at the arrow-kernel level (including a Hypothesis sweep over adversarial
unicode/whitespace strings), plus the Spark-facing wrapper's schema, NULL
semantics, and plan shape."""
import math
import re
from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from nail_parquet_spark.functions.entropy import _entropy_of_batch, entropy_stats

# The pinned RE2/DuckDB token separator — NOT Java \s (no VT); trim strips
# U+0020 only. Mirrors the module-docstring contract.
_SPLIT = re.compile(r"[\t\n\f\r ]+")


def _model(t):
    if t is None:
        return None

    def ent(items):
        if not items:
            return 0.0
        c = Counter(items)
        n = len(items)
        return -sum(v / n * math.log2(v / n) for v in c.values())

    chars = list(t)
    toks = _SPLIT.split(t.strip(" "))
    return len(chars), ent(chars), len(toks), ent(toks)


def _check(cases):
    out = _entropy_of_batch(pa.array(cases, pa.string()))
    for i, t in enumerate(cases):
        if t is None:
            continue
        nc, ce, nw, we = _model(t)
        assert out["n_chars"][i] == nc, (repr(t), out["n_chars"][i], nc)
        assert abs(out["char_entropy"][i] - ce) < 1e-9, (repr(t), "char")
        assert out["n_words"][i] == nw, (repr(t), out["n_words"][i], nw)
        assert abs(out["word_entropy"][i] - we) < 1e-9, (repr(t), "word")


def test_kernel_edges():
    _check([
        "", " ", "  ", "\t", "\t \t", "a", "aab", " a b  ", "\ta b\r",
        "héllo wörld", "éx", "éx",       # combining accent = 2 cps
        "a\x0bb",                                # VT is NOT a separator
        "a b",                              # NBSP is NOT a separator
        "aa aa bb", "\U0001d11e music \U0001d11e",
        "x" * 40, ("ab " * 30).strip(), None, "tail space ", " lead",
        "\n", "a\n\nb", "mixed  \t spaces\nand lines\n",
    ])


def test_kernel_all_null_and_empty_batch():
    out = _entropy_of_batch(pa.array([None, None], pa.string()))
    assert len(out["n_chars"]) == 2
    out = _entropy_of_batch(pa.array([], pa.string()))
    assert len(out["n_chars"]) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet=st.sampled_from(list("ab é\t\n\x0b\f\r 𝄞 ")), max_size=40),
    max_size=8))
def test_kernel_property(cases):
    _check(cases)


def test_spark_wrapper(spark):
    df = spark.createDataFrame(
        [(1, "aa bb aa"), (2, ""), (3, None), (4, " x ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in entropy_stats(df, "doc_id", "text").collect()}
    assert rows[1].n_chars == 8 and rows[1].n_words == 3
    assert rows[1].word_entropy == round(-(2 / 3) * math.log2(2 / 3)
                                         - (1 / 3) * math.log2(1 / 3), 6)
    assert rows[2].n_chars == 0 and rows[2].n_words == 1
    assert rows[2].char_entropy == 0.0 and rows[2].word_entropy == 0.0
    assert rows[3].n_chars is None and rows[3].word_entropy is None
    assert rows[4].n_chars == 3 and rows[4].n_words == 1


def test_plan_exchange_free(spark):
    from nail_parquet_spark.plans.explain import plan_text

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = plan_text(entropy_stats(df, "doc_id", "text"))
    assert "Exchange" not in plan
