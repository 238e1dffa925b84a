"""split_by_group: leakage-safe grouped train/test split."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.operators import split_by_group


def _u(group: str, seed: int) -> float:
    h = hashlib.md5(f"{group}:{seed}".encode()).hexdigest()[:15]
    return int(h, 16) / float(1 << 60)


def test_groups_never_straddle(spark):
    df = spark.createDataFrame(
        [(i, f"host{i % 23}") for i in range(1000)], "id long, host string")
    a, b = split_by_group(df, "host", [0.8, 0.2], seed=3)
    ha = {r.host for r in a.select("host").distinct().collect()}
    hb = {r.host for r in b.select("host").distinct().collect()}
    assert not (ha & hb)
    assert a.count() + b.count() == 1000
    assert ha | hb == {f"host{i}" for i in range(23)}


def test_matches_python_model(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 11}") for i in range(200)], "id long, g string")
    parts = split_by_group(df, "g", [0.5, 0.3, 0.2], seed=7)
    cum = [0.5, 0.8, 1.0]
    for i, part in enumerate(parts):
        got = {r.g for r in part.select("g").distinct().collect()}
        lo = cum[i - 1] if i else 0.0
        want = {f"g{j}" for j in range(11)
                if lo <= _u(f"g{j}", 7) < cum[i]}
        assert got == want, f"slice {i}"


def test_null_groups_form_one_group(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id long, g string")
    parts = split_by_group(df, "g", [0.5, 0.5], seed=0)
    null_rows = [sum(1 for r in p.collect() if r.g is None) for p in parts]
    assert sorted(null_rows) in ([0, 2],)  # both NULL rows in ONE slice


def test_deterministic_and_seed_sensitive(spark):
    df = spark.createDataFrame(
        [(i, f"h{i % 50}") for i in range(500)], "id long, h string")
    a1, _ = split_by_group(df, "h", [0.8, 0.2], seed=1)
    a2, _ = split_by_group(df.repartition(13), "h", [0.8, 0.2], seed=1)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    sizes = {s: split_by_group(df, "h", [0.8, 0.2], seed=s)[0].count()
             for s in (1, 2, 3)}
    assert len(set(sizes.values())) > 1  # a different seed re-deals groups


def test_full_coverage_no_row_lost_or_duplicated(spark):
    # ratios that do not sum to 1 are normalized; the final boundary is
    # closed so u ~ 1.0 edge values cannot fall out
    df = spark.createDataFrame(
        [(i, i % 97) for i in range(970)], "id long, g int")
    parts = split_by_group(df, "g", [3, 1], seed=5)
    ids = sorted(r.id for p in parts for r in p.select("id").collect())
    assert ids == list(range(970))


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError, match="positive"):
        split_by_group(df, "g", [0.5, -0.1])
    with pytest.raises(ValueError, match="positive"):
        split_by_group(df, "g", [])


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, g string")
    a, _ = split_by_group(df, "g", [0.8, 0.2])
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
