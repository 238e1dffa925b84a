"""Quality-pass throughput + 1-vs-4 scaling on the bench web table.

Same measurement discipline as scripts/bench_encode.py: ONE JVM at
local[4]; job parallelism pinned by coalescing the parquet scan to 1 or 4
partitions (map-only job — input partitioning IS the parallelism);
interleaved reps so both levels sample the same noise window; headline =
min-wall per level, efficiency = min(lo)/min(hi)/4.

The measured job is `gopher_filter` over the synthetic web table's text
column (functions/quality.py — one shuffle-free projection) with a noop
sink. GB/s is raw text bytes / wall.

Usage: python scripts/bench_quality.py [rows] [reps]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from nail_parquet_spark.functions.quality import gopher_filter
    from nail_parquet_spark.session import get_spark
    from nail_parquet_spark.synth import webpages_spark

    spark = get_spark("bench-quality", master="local[4]", shuffle_partitions=4)
    src = f"/tmp/bench_quality_{rows}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        webpages_spark(spark, rows, seed=42, n_parts=16).select(
            "url", "text").write.mode("overwrite").parquet(src)
    base = spark.read.parquet(src)
    raw_bytes = base.agg(
        F.sum(F.length(F.encode(F.col("text"), "UTF-8")))).collect()[0][0]

    def run(n_parts: int, engine: str) -> float:
        df = spark.read.parquet(src).coalesce(n_parts)
        t0 = time.time()
        gopher_filter(df, "url", "text", engine=engine).write.format(
            "noop").mode("overwrite").save()
        return time.time() - t0

    run(4, "sql")  # warmups (JVM codegen + python workers)
    run(4, "arrow")
    gb = raw_bytes / 1e9
    out = {
        "metric": "gopher_filter throughput (GB text/s)",
        "rows": rows,
        "raw_text_bytes": raw_bytes,
    }
    # interleaved across engines AND levels so all four series share the
    # same host-noise window
    walls = {("sql", 1): [], ("sql", 4): [], ("arrow", 1): [], ("arrow", 4): []}
    for _ in range(reps):
        for eng in ("sql", "arrow"):
            for n in (1, 4):
                walls[(eng, n)].append(run(n, eng))
    for eng in ("sql", "arrow"):
        lo, hi = walls[(eng, 1)], walls[(eng, 4)]
        out[f"walls_1_{eng}"] = [round(w, 3) for w in lo]
        out[f"walls_4_{eng}"] = [round(w, 3) for w in hi]
        out[f"gbps_1_{eng}"] = round(gb / min(lo), 4)
        out[f"gbps_4_{eng}"] = round(gb / min(hi), 4)
        out[f"scaling_efficiency_1_to_4_{eng}"] = round(min(lo) / min(hi) / 4, 4)
    out["arrow_speedup_4"] = round(
        min(walls[("sql", 4)]) / min(walls[("arrow", 4)]), 3)

    # normalize_text chain (functions/normalize.py): one translate +
    # literal replace + two regexes + trim, all codegen — measured with
    # the same discipline so BENCH/BASELINE can quote a GB/s figure.
    from nail_parquet_spark.functions.normalize import normalize_text

    def run_norm(n_parts: int) -> float:
        df = spark.read.parquet(src).coalesce(n_parts)
        t0 = time.time()
        df.select("url", normalize_text(F.col("text")).alias("t")).write \
          .format("noop").mode("overwrite").save()
        return time.time() - t0

    run_norm(4)  # warmup
    nw = {1: [], 4: []}
    for _ in range(reps):
        for n in (1, 4):
            nw[n].append(run_norm(n))
    out["normalize_gbps_1"] = round(gb / min(nw[1]), 4)
    out["normalize_gbps_4"] = round(gb / min(nw[4]), 4)
    out["normalize_scaling_1_to_4"] = round(min(nw[1]) / min(nw[4]) / 4, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
