"""Event analytics: funnel, retention, rollup/cube, resample, per-group
top-k and sampling (operators/analytics.py)."""

import datetime as dt

import pytest

from nail_parquet_spark.operators.analytics import (
    funnel,
    grouping_sets,
    resample,
    retention,
    sample_per_group,
    topk_per_group,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: full funnel in order; user 2: click before view (click must
    # not count until re-clicked — it never is); user 3: view only;
    # user 4: view+click same ts (ties match).
    rows = [
        (1, _ts(1, 9), 1, "view", 1.0),
        (2, _ts(1, 10), 1, "click", 2.0),
        (3, _ts(2, 11), 1, "purchase", 30.0),
        (4, _ts(1, 8), 2, "click", 4.0),
        (5, _ts(1, 9), 2, "view", 5.0),
        (6, _ts(3, 9), 3, "view", 6.0),
        (7, _ts(1, 7), 4, "view", 7.0),
        (8, _ts(1, 7), 4, "click", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_order_and_ties(events):
    out = funnel(events, ["view", "click", "purchase"]).orderBy("step").collect()
    assert [(r.step, r.event_type, r.users) for r in out] == [
        (1, "view", 4),   # users 1-4 all viewed
        (2, "click", 2),  # user 1 (after view), user 4 (same-ts tie); user 2's click precedes their view
        (3, "purchase", 1),
    ]


def test_funnel_within_window(events):
    # purchase is ~25h after click; a 1-hour window drops it
    out = funnel(events, ["view", "click", "purchase"], within_seconds=3600).orderBy("step").collect()
    assert [r.users for r in out] == [4, 2, 0]


def test_funnel_monotone_on_real_table(spark, events):
    out = funnel(events, ["view", "click"]).orderBy("step").collect()
    assert out[0].users >= out[1].users


def test_retention_offsets(spark):
    rows = [
        (1, _ts(1), "a"), (2, _ts(2), "a"), (3, _ts(4), "a"),
        (4, _ts(2), "b"), (5, _ts(2, 23), "b"),  # same day twice -> distinct once
        (6, _ts(3), "c"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    out = {(str(r.cohort_date), r.offset_days): r.users
           for r in retention(df, user_col="user_id").collect()}
    assert out == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-03", 0): 1,
    }
    capped = retention(df, user_col="user_id", max_offset_days=1).collect()
    assert max(r.offset_days for r in capped) == 1


def test_grouping_sets_rollup_and_cube(sample):
    out = grouping_sets(sample, ["category"], {"n": ("count", "id"), "s": ("sum", "value")})
    rows = {(r.category, r.grouping_id): (r.n, r.s) for r in out.collect()}
    assert rows[("A", 0)] == (2, 400.0)
    assert rows[(None, 1)] == (5, 1601.0)  # grand total row has gid bit set
    cube = grouping_sets(sample, ["category", "name"], {"n": ("count", "id")}, mode="cube")
    # cube over 2 keys = 4 grouping sets; gid 3 = grand total
    gids = {r.grouping_id for r in cube.collect()}
    assert gids == {0, 1, 2, 3}
    with pytest.raises(ValueError):
        grouping_sets(sample, ["category"], {"n": ("count", "id")}, mode="bogus")
    with pytest.raises(ValueError):
        grouping_sets(sample, ["category"], {"n": ("median", "id")})


def test_resample_gap_fill(spark):
    rows = [(1, _ts(1, 0), "k", 1.0), (2, _ts(1, 0, 30), "k", 2.0), (3, _ts(1, 3), "k", 4.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {r.bucket: (r.n_events, r.sum_value)
           for r in resample(df, "ts", 3600, ["event_type"], "value").collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # dense hourly range with the 2 middle hours zero-filled
    assert out == {
        base: (2, 3.0),
        base + 3600: (0, None),
        base + 7200: (0, None),
        base + 10800: (1, 4.0),
    }
    sparse = resample(df, "ts", 3600, ["event_type"], "value", fill_gaps=False)
    assert sparse.count() == 2


def test_topk_per_group_deterministic(sample):
    out = topk_per_group(sample, ["category"], "value", 1, tiebreak_col="id").collect()
    got = {(r.category, r.id) for r in out}
    assert got == {("A", 3), ("B", 4), ("C", 5)}
    with pytest.raises(ValueError):
        topk_per_group(sample, ["category"], "value", 1)


def test_sample_per_group_exact_and_layout_independent(sample):
    a = sample_per_group(sample, ["category"], 1, "id")
    b = sample_per_group(sample.repartition(7), ["category"], 1, "id")
    ra = sorted((r.category, r.id) for r in a.collect())
    rb = sorted((r.category, r.id) for r in b.collect())
    assert ra == rb
    assert len(ra) == 3  # one per category
    # k larger than group size keeps everything
    assert sample_per_group(sample, ["category"], 10, "id").count() == 5


def test_funnel_durations_hand_computed(events):
    from nail_parquet_spark.operators.analytics import funnel_durations

    out = funnel_durations(events, ["view", "click", "purchase"]).orderBy("step").collect()
    # converters: step2 = users 1 (3600 s) and 4 (0 s); step3 = user 1
    # (click 01-01 10:00 -> purchase 01-02 11:00 = 25 h = 90000 s)
    assert [(r.step, r.event_type, r.converted) for r in out] == [
        (2, "click", 2), (3, "purchase", 1),
    ]
    s2, s3 = out
    assert s2.avg_seconds == 1800.0 and s2.max_seconds == 3600.0
    assert s2.p50_seconds == 1800.0  # interpolated between 0 and 3600
    assert s3.avg_seconds == s3.p50_seconds == s3.max_seconds == 90000.0


def test_funnel_durations_needs_two_steps(events):
    from nail_parquet_spark.operators.analytics import funnel_durations

    with pytest.raises(ValueError):
        funnel_durations(events, ["view"])
