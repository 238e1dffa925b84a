"""Property tests: asof_join / range_join vs a pure-Python reference model
over Hypothesis-generated fixtures (ties, NULL keys/ts, duplicate keys).
Example counts are small — each example runs Spark jobs."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from nail_parquet_spark.operators import asof_join, asof_join_broadcast, range_join

KEYS = ["a", "b", None]

# tag = row index (unique) so result comparison has a total order
left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS),
              st.one_of(st.none(), st.integers(0, 8))),
    min_size=0, max_size=8,
).map(lambda rows: [(k, t, i) for i, (k, t) in enumerate(rows)])
# right side: unique per (key, ts) by construction (dict collapse)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS),
              st.one_of(st.none(), st.integers(0, 8)),
              st.floats(0, 100, allow_nan=False)),
    min_size=0, max_size=8,
).map(lambda rows: [(k, t, v) for (k, t), v in {(k, t): v for k, t, v in rows}.items()])


def model_asof(left, right, direction, strict):
    out = []
    for lk, lt, tag in left:
        best = None
        if lk is not None and lt is not None:
            for rk, rt, rv in right:
                if rk != lk or rt is None:
                    continue
                if direction == "backward":
                    ok = rt < lt if strict else rt <= lt
                    better = best is None or rt > best[0]
                else:
                    ok = rt > lt if strict else rt >= lt
                    better = best is None or rt < best[0]
                if ok and better:
                    best = (rt, rv)
        out.append((lk, lt, tag, best[1] if best else None))
    return sorted(out, key=lambda t: (t[2],))


@pytest.mark.parametrize("impl", [asof_join, asof_join_broadcast])
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(left=left_rows, right=right_rows,
       direction=st.sampled_from(["backward", "forward"]),
       strict=st.booleans())
def test_asof_join_matches_model(spark, impl, left, right, direction, strict):
    ldf = spark.createDataFrame(left, "k string, ts long, tag long") if left else \
        spark.createDataFrame([], "k string, ts long, tag long")
    rdf = spark.createDataFrame(right, "k string, ts long, v double") if right else \
        spark.createDataFrame([], "k string, ts long, v double")
    got = sorted(
        ((r.k, r.ts, r.tag, r.v) for r in
         impl(ldf, rdf, on="k", left_ts="ts", right_ts="ts",
              value_cols=["v"], direction=direction, strict=strict).collect()),
        key=lambda t: (t[2],),
    )
    assert got == model_asof(left, right, direction, strict)


def model_range(left, right):
    out = []
    for lk, lp, tag in left:
        if lk is None or lp is None:
            continue
        for rk, rs, re_, name in right:
            if rk == lk and rs is not None and re_ is not None and rs <= lp < re_:
                out.append((tag, name))
    return sorted(out)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(st.sampled_from(KEYS),
                            st.one_of(st.none(), st.integers(0, 20))),
                  min_size=0, max_size=8)
    .map(lambda rows: [(k, pnt, i) for i, (k, pnt) in enumerate(rows)]),
    right=st.lists(st.tuples(st.sampled_from(KEYS),
                             st.one_of(st.none(), st.integers(0, 20)),
                             st.one_of(st.none(), st.integers(0, 20))),
                   min_size=0, max_size=6)
    .map(lambda rows: [(k, s, e, 1000 + i) for i, (k, s, e) in enumerate(rows)]),
    bucket=st.sampled_from([1, 3, 50]),
)
def test_range_join_matches_model(spark, left, right, bucket):
    ldf = spark.createDataFrame(left, "k string, p long, tag long") if left else \
        spark.createDataFrame([], "k string, p long, tag long")
    rdf = spark.createDataFrame(right, "k string, s long, e long, iname long") if right else \
        spark.createDataFrame([], "k string, s long, e long, iname long")
    got = sorted(
        (r.tag, r.iname) for r in
        range_join(ldf, rdf, on="k", left_point="p", right_start="s",
                   right_end="e", bucket_seconds=bucket).collect()
    )
    assert got == model_range(left, right)
