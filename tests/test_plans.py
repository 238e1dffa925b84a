"""Plan-quality gates: pushdown, pruning, broadcast — the 100-TB checklist.

A scan that reads all 11 lineitem columns for a 2-column projection is a
bug at scale even when results are correct; these tests pin the plans.
"""
import pytest

import __spark_entry__ as entry
from nail_parquet_spark.plans.explain import assert_pushdown, global_windows, plan_text

SF = "/root/testdata/sf0.001"


def test_no_single_partition_window_in_any_registered_query(spark):
    """The 100-TB straggler gate: NO registered query's plan may contain a
    Window with an empty partition spec. Row numbering goes through the
    partition-offset prefix-sum (rowid.py); top/bottom-n through
    orderBy+limit (TakeOrderedAndProject); ranks through groupBy+prefix-sum
    (spearman_scalable)."""
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF)
        gw = global_windows(df)
        if gw:
            offenders[name] = gw[0][:120]
    assert not offenders, f"single-partition windows in: {offenders}"


def test_sample_and_tail_compile_to_take_ordered(spark):
    """sample_random / tail use per-partition top-n + driver merge, not a
    global sort or window."""
    from nail_parquet_spark.operators.rows import sample_random, tail

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for df in (sample_random(li, 10, seed=1), tail(li, 10, order_col="l_orderkey")):
        txt = plan_text(df, mode="simple")
        assert "TakeOrderedAndProject" in txt, txt


def test_filter_pushdown_reaches_scan(spark):
    df = entry.q_filter_conditions(spark, SF)
    txt = assert_pushdown(df, pushed_filter_frag="PushedFilters: [")
    assert "GreaterThan(l_quantity,45" in txt


def test_projection_prunes_scan(spark):
    df = entry.q_select_columns(spark, SF)
    assert_pushdown(df, read_schema_cols=["c_custkey", "c_name", "c_acctbal"])


def test_q1_scan_prunes_unused_columns(spark):
    df = entry.q1_pricing_summary(spark, SF)
    txt = plan_text(df)
    assert "l_comment" not in txt  # never existed, but guard the idea:
    # Q1 touches 7 of 11 columns; the scan schema must not include the rest
    assert_pushdown(df, read_schema_cols=[
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate",
    ])


def test_merge_broadcasts_small_side(spark):
    df = entry.q_merge_inner(spark, SF)
    assert_pushdown(df, broadcast=True)


def test_q1_whole_stage_codegen(spark):
    # AQE finalizes the plan only on execution; codegen stages then show
    # as "*(n)" prefixes in simple mode
    df = entry.q1_pricing_summary(spark, SF)
    df.collect()
    txt = plan_text(df, mode="simple")
    assert "isFinalPlan=true" in txt and "*(" in txt


def test_q1_partial_aggregation(spark):
    txt = plan_text(entry.q1_pricing_summary(spark, SF))
    assert "partial_sum" in txt  # map-side combine before the shuffle


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tables join with ZERO shuffle — the repeated-join answer
    at 100 TB (bucket once, join forever)."""
    from nail_parquet_spark.operators import merge_bucketed, write_bucketed

    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(o, "t_orders_bkt", "o_orderkey", n_buckets=8)
    write_bucketed(li, "t_lineitem_bkt", "l_orderkey", n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = merge_bucketed(spark, "t_lineitem_bkt", "t_orders_bkt",
                           "l_orderkey=o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == li.count()  # every lineitem has its order
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_frequency_single_scan(spark):
    """frequency's percentage denominator reuses the groupBy shuffle (AQE
    ReusedExchange) instead of a second table scan — one FileScan total."""
    from nail_parquet_spark.operators.agg import frequency

    df = spark.read.parquet(f"{SF}/orders.parquet")
    out = frequency(df, ["o_orderpriority"])
    out.collect()  # AQE finalizes the plan on execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # ignore AQE's pre-plan echo
    assert final.count("FileScan parquet") == 1, final
    assert "ReusedExchange" in final, final
