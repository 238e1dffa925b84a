"""asof_join / range_join semantics vs DuckDB ground truth."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nail_parquet_spark.operators import asof_join, range_join


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px) — unique per (key, ts) as the contract requires
    return spark.createDataFrame(
        [
            ("a", 1, 10.0), ("a", 5, 11.0), ("a", 9, 12.0),
            ("b", 3, 20.0), ("b", 7, 21.0),
        ],
        "sym string, qts long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", 0, 100), ("a", 5, 101), ("a", 6, 102), ("a", 99, 103),
            ("b", 3, 200), ("b", 4, 201),
            ("c", 1, 300),  # key with no quotes at all
        ],
        "sym string, tts long, qty int",
    )


def _duck_asof(direction, strict):
    con = duckdb.connect()
    con.execute("CREATE TABLE q(sym text, qts bigint, px double)")
    con.execute("CREATE TABLE t(sym text, tts bigint, qty int)")
    con.execute(
        "INSERT INTO q VALUES ('a',1,10.0),('a',5,11.0),('a',9,12.0),"
        "('b',3,20.0),('b',7,21.0)"
    )
    con.execute(
        "INSERT INTO t VALUES ('a',0,100),('a',5,101),('a',6,102),('a',99,103),"
        "('b',3,200),('b',4,201),('c',1,300)"
    )
    op = {
        ("backward", False): ">=", ("backward", True): ">",
        ("forward", False): "<=", ("forward", True): "<",
    }[(direction, strict)]
    rows = con.execute(
        f"SELECT t.sym, t.tts, t.qty, q.px FROM t ASOF LEFT JOIN q "
        f"ON t.sym = q.sym AND t.tts {op} q.qts ORDER BY t.sym, t.tts"
    ).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True),
    ("forward", False), ("forward", True),
])
def test_asof_join_matches_duckdb(spark, quotes, trades, direction, strict):
    got = (
        asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                  value_cols=["px"], direction=direction, strict=strict)
        .orderBy("sym", "tts")
        .collect()
    )
    got = [(r.sym, r.tts, r.qty, r.px) for r in got]
    assert got == _duck_asof(direction, strict)


def test_asof_join_multi_value_cols(spark, quotes, trades):
    q2 = quotes.withColumn("src", F.concat(F.lit("s"), F.col("qts")))
    out = asof_join(trades, q2, on="sym", left_ts="tts", right_ts="qts").orderBy(
        "sym", "tts"
    )
    rows = out.collect()
    # backward non-strict: trade (a,5) matches quote (a,5)
    r = [x for x in rows if x.sym == "a" and x.tts == 5][0]
    assert r.px == 11.0 and r.src == "s5"
    # unmatched key keeps NULLs
    r = [x for x in rows if x.sym == "c"][0]
    assert r.px is None and r.src is None


def test_asof_join_no_cross_join_in_plan(spark, quotes, trades):
    plan = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            ("a", 0, 10, "i1"), ("a", 10, 20, "i2"), ("a", 5, 200, "i3"),
            ("b", 50, 60, "i4"),
        ],
        "k string, s long, e long, iname string",
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [("a", 0), ("a", 9), ("a", 10), ("a", 150), ("b", 55), ("b", 61), ("c", 5)],
        "k string, p long",
    )


def _duck_range(how):
    con = duckdb.connect()
    con.execute("CREATE TABLE iv(k text, s bigint, e bigint, iname text)")
    con.execute("CREATE TABLE pt(k text, p bigint)")
    con.execute(
        "INSERT INTO iv VALUES ('a',0,10,'i1'),('a',10,20,'i2'),('a',5,200,'i3'),"
        "('b',50,60,'i4')"
    )
    con.execute(
        "INSERT INTO pt VALUES ('a',0),('a',9),('a',10),('a',150),('b',55),('b',61),('c',5)"
    )
    j = "JOIN" if how == "inner" else "LEFT JOIN"
    rows = con.execute(
        f"SELECT pt.k, pt.p, iv.iname FROM pt {j} iv "
        f"ON pt.k = iv.k AND pt.p >= iv.s AND pt.p < iv.e "
        f"ORDER BY pt.k, pt.p, iv.iname NULLS FIRST"
    ).fetchall()
    con.close()
    return rows


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("bucket", [1, 7, 1000])
def test_range_join_matches_duckdb(spark, intervals, points, how, bucket):
    out = range_join(
        points, intervals, on="k", left_point="p", right_start="s",
        right_end="e", bucket_seconds=bucket, how=how,
    ).select("k", "p", "iname")
    got = sorted(
        [(r.k, r.p, r.iname) for r in out.collect()],
        key=lambda t: (t[0], t[1], t[2] is not None, t[2] or ""),
    )
    assert got == _duck_range(how)


def test_range_join_timestamps(spark):
    iv = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-08 00:00:00")],
        "k long, s string, e string",
    ).select("k", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    pts = spark.createDataFrame(
        [(1, "2024-01-03 12:00:00"), (1, "2024-01-08 00:00:00")],
        "k long, p string",
    ).select("k", F.col("p").cast("timestamp").alias("p"))
    out = range_join(pts, iv, on="k", left_point="p", right_start="s",
                     right_end="e", bucket_seconds=86400)
    # end-exclusive: only the mid-interval point matches
    assert out.count() == 1


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True),
    ("forward", False), ("forward", True),
])
def test_asof_join_broadcast_matches_shuffle_variant(spark, quotes, trades,
                                                     direction, strict):
    from nail_parquet_spark.operators import asof_join_broadcast

    got = (
        asof_join_broadcast(trades, quotes, on="sym", left_ts="tts",
                            right_ts="qts", value_cols=["px"],
                            direction=direction, strict=strict)
        .orderBy("sym", "tts").collect()
    )
    got = [(r.sym, r.tts, r.qty, r.px) for r in got]
    assert got == _duck_asof(direction, strict)


def test_asof_join_broadcast_plan_has_broadcast_join(spark, quotes, trades):
    from nail_parquet_spark.operators import asof_join_broadcast

    plan = asof_join_broadcast(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the fact side must not be exchanged: only the packed dim side shuffles
    assert plan.count("Exchange hashpartitioning") <= 1


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_null_semantics_match_sql_comparison(spark, direction):
    """NULL keys / NULL timestamps never match — the SQL comparison
    semantics, pinned against a DuckDB LATERAL ground truth. (DuckDB's ASOF
    JOIN operator itself has a sort-artifact where a NULL-ts probe matches a
    NULL-ts build row; the lateral form is the principled spec.)"""
    from nail_parquet_spark.operators import asof_join_broadcast

    quotes = spark.createDataFrame(
        [("a", 1, 10.0), ("a", None, 66.0), (None, 2, 77.0), ("a", 9, 12.0)],
        "sym string, qts long, px double",
    )
    trades = spark.createDataFrame(
        [("a", 0, 100), ("a", 5, 101), ("a", None, 102), (None, 3, 103)],
        "sym string, tts long, qty int",
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE q(sym text, qts bigint, px double)")
    con.execute("CREATE TABLE t(sym text, tts bigint, qty int)")
    con.execute("INSERT INTO q VALUES ('a',1,10.0),('a',NULL,66.0),"
                "(NULL,2,77.0),('a',9,12.0)")
    con.execute("INSERT INTO t VALUES ('a',0,100),('a',5,101),"
                "('a',NULL,102),(NULL,3,103)")
    op, order = (">=", "DESC") if direction == "backward" else ("<=", "ASC")
    want = con.execute(
        f"SELECT t.qty, (SELECT px FROM q WHERE q.sym = t.sym "
        f"AND t.tts {op} q.qts ORDER BY q.qts {order} LIMIT 1) "
        f"FROM t ORDER BY t.qty"
    ).fetchall()
    con.close()
    for fn in (asof_join, asof_join_broadcast):
        got = sorted(
            (r.qty, r.px)
            for r in fn(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                        value_cols=["px"], direction=direction).collect()
        )
        assert got == want, fn.__name__


def test_range_join_inverted_interval_never_matches(spark):
    iv = spark.createDataFrame(
        [("a", 10, 5, "bad"), ("a", 0, 100, "good")],
        "k string, s long, e long, iname string",
    )
    pts = spark.createDataFrame([("a", 7)], "k string, p long")
    out = range_join(pts, iv, on="k", left_point="p", right_start="s",
                     right_end="e", bucket_seconds=3).collect()
    assert [r.iname for r in out] == ["good"]
