"""Streaming encode: continuously (or availableNow-incrementally) encode
newly-arriving web-page parquet files into the blocks format.

The reference has no streaming surface at all; this is the incremental
twin of the batch pipeline: each micro-batch runs the same mapInArrow
encode, appends blocks partitioned by batch, and the streaming checkpoint
gives exactly-once file-level resume — the Structured-Streaming analogue of
``pipeline.checkpoint.encode_resumable`` (there the commit gate is a marker
file; here it's the stream's write-ahead log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def encode_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    schema: str,
    codecs: dict[str, str] | None = None,
    policy: str = "balanced",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and for availableNow, run to completion) a streaming encode.

    codecs are selected ONCE from the data already present (job planning,
    like the batch path) so every micro-batch encodes consistently —
    per-batch reselection would make the blocks table heterogeneous and the
    selection cost per-trigger instead of per-job.
    """
    from nail_parquet_spark.codec.encode import choose_codecs_for_df, encode_table

    if codecs is None:
        seed = spark.read.schema(schema).parquet(src_dir)
        codecs = choose_codecs_for_df(seed, seed.columns, policy=policy)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)

    def encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        blocks = encode_table(batch_df, codecs=codecs)
        # overwrite the batch-id directory: foreachBatch is at-least-once,
        # so a micro-batch replayed after a crash must replace its own
        # output, not append a second copy (this is what makes the pipeline
        # effectively exactly-once)
        (
            blocks.write.mode("overwrite")
            .parquet(f"{out_dir}/ingest_batch={batch_id}")
        )

    writer = (
        stream.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
