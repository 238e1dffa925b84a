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
