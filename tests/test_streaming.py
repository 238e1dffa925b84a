"""Structured Streaming smoke: file-source stream -> watermarked hourly
rollup via availableNow, checked against the batch equivalent."""
import os

from pyspark.sql import functions as F

from nail_parquet_spark.streaming.events import (
    run_available_now,
    stream_events_hourly,
    stream_from_directory,
)

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
                 "value double, props string")


def test_stream_hourly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.write.parquet(src)

    stream = stream_from_directory(spark, src, EVENTS_SCHEMA)
    rolled = stream_events_hourly(stream)
    run_available_now(rolled, out, ck)

    got = spark.read.parquet(out)
    want = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # every emitted window must match the batch result exactly...
    wrong = got.select("hour", "event_type", "n").exceptAll(
        want.select("hour", "event_type", "n")
    )
    assert wrong.count() == 0
    # ...and append mode correctly HOLDS BACK only windows still inside the
    # watermark horizon (max_ts - 2h) at stream end
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    missing = want.select("hour", "event_type", "n").exceptAll(
        got.select("hour", "event_type", "n")
    )
    late = missing.filter(
        F.col("hour") < F.lit(max_ts) - F.expr("INTERVAL 3 HOURS")
    )
    assert late.count() == 0, "windows outside the watermark horizon were dropped"
    n_emitted = got.count()
    assert n_emitted > 0

    # resume idempotence: re-running with the same checkpoint adds nothing
    run_available_now(stream_events_hourly(stream_from_directory(spark, src, EVENTS_SCHEMA)), out, ck)
    assert spark.read.parquet(out).count() == n_emitted
