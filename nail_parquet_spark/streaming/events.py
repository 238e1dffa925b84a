"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.14) — this module is
the beyond-parity piece a training-data pipeline needs: incremental ingest
of event/page batches with watermarked windowed aggregation, runnable with
``availableNow`` for batch-incremental (Iceberg-style snapshot catch-up) or
continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_from_directory(spark: SparkSession, path: str, schema: str,
                          fmt: str = "parquet") -> DataFrame:
    """File-source stream: new files under ``path`` become micro-batches."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def stream_events_hourly(events: DataFrame, ts_col: str = "ts",
                         watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup per event_type; late rows beyond
    the watermark are dropped deterministically."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


def run_available_now(stream_df: DataFrame, out_path: str, checkpoint: str) -> None:
    """Process everything currently available, then stop — the idempotent
    catch-up mode (resume = same checkpoint dir)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch): session breaks when the user is
    idle longer than the gap. Pure window algebra — lag + cumulative sum —
    one shuffle on the user key."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # NTZ timestamps don't cast to long directly; go via ltz — only gap
    # DIFFERENCES matter, so the session-tz offset cancels
    secs = F.col(ts_col).cast("timestamp_ltz").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def sessionize_stateful(stream: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", gap_minutes: int = 30,
                        watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization with explicit state: per-user session
    windows maintained in applyInPandasWithState, emitted when the gap
    timeout expires. The reference has no streaming at all (SURVEY §2.14) —
    this is the task's 'custom stateful operator' capability."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(pdf[ts_col].astype("int64").floordiv(1_000_000_000).tolist())
        if not ts:
            return
        ts.sort()
        # seed with the open session carried in state
        if state.exists:
            start, end, cnt = state.get
        else:
            start, end, cnt = ts[0], ts[0], 0
            cnt = 1
            ts = ts[1:]
            if not ts:
                state.update((start, end, cnt))
                return
        closed = []
        for t in ts:
            if t - end > gap_s:
                closed.append((start, end, cnt))
                start, end, cnt = t, t, 1
            else:
                end, cnt = max(end, t), cnt + 1
        state.update((start, end, cnt))  # tail session stays open in state
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    out_schema = ("user_id bigint, session_start timestamp, session_end timestamp, "
                  "n_events bigint")
    state_schema = "start bigint, end bigint, n bigint"
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_dedup_exact(docs: DataFrame, key_cols: list[str] | None = None,
                       text_col: str = "text", ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content
    fingerprint, with bounded state via ``dropDuplicatesWithinWatermark`` —
    fingerprints older than the watermark age out of the state store, so a
    continuous crawl ingest never accumulates unbounded dedup state (the
    batch analogue is functions/dedup.exact_text_dedup's md5 groupBy)."""
    # NULL text rows pass through UNTOUCHED (matching the batch dedup_exact
    # semantics) by routing them AROUND the dedup: dropDuplicates treats
    # NULL keys as equal, and even unique sentinel fingerprints would bloat
    # the state store with keys that can never match anything
    nulls = docs.filter(F.col(text_col).isNull())
    keyed = docs.filter(F.col(text_col).isNotNull()).withColumn(
        "__fp", F.md5(F.encode(F.col(text_col), "UTF-8"))
    )
    keys = (key_cols or []) + ["__fp"]
    deduped = (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .drop("__fp")
    )
    return deduped.unionByName(nulls)
