"""Idempotent resume for the encode pipeline.

No Iceberg catalog ships in this sandbox, so snapshot checkpointing is
emulated with the same shape a catalog would give us (SURVEY.md §7.3):
work is chunked by input unit (parquet file = Iceberg data file), each
completed unit commits atomically (write to temp dir -> fsync -> marker
rename), and a re-run skips committed units. Swap `_list_units` for an
Iceberg snapshot's file manifest and this is the real thing.
"""

from __future__ import annotations

import glob
import json
import os
import time

from pyspark.sql import SparkSession


def _list_units(src: str) -> list[str]:
    if os.path.isdir(src):
        return sorted(glob.glob(os.path.join(src, "*.parquet")))
    return [src]


def _unit_key(path: str) -> str:
    return os.path.basename(path).replace(".parquet", "")


def encode_resumable(
    spark: SparkSession,
    src: str,
    out_dir: str,
    codecs: dict[str, str] | None = None,
    policy: str = "balanced",
    max_units: int | None = None,
) -> dict:
    """Encode src parquet into out_dir, unit-at-a-time, resumably.

    Returns {completed, skipped, total} counts. Killing the job mid-way and
    re-invoking continues where it left off; finished units are never
    re-encoded (idempotence gate = the committed marker file).
    """
    from nail_parquet_spark.codec.encode import choose_codecs_for_df, encode_parquet_files

    os.makedirs(out_dir, exist_ok=True)
    units = _list_units(src)
    done_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(done_dir, exist_ok=True)

    if codecs is None:
        df = spark.read.parquet(src)
        codecs = choose_codecs_for_df(df, df.columns, policy=policy)

    completed = skipped = 0
    for i, unit in enumerate(units):
        key = _unit_key(unit)
        marker = os.path.join(done_dir, f"{key}.json")
        if os.path.exists(marker):
            skipped += 1
            continue
        if max_units is not None and completed >= max_units:
            break
        t0 = time.time()
        blocks = encode_parquet_files(spark, unit, codecs=codecs)
        dest = os.path.join(out_dir, f"unit={key}")
        blocks.write.mode("overwrite").parquet(dest)
        # gather the manifest AFTER the write committed (Spark's commit
        # protocol makes the parquet dir atomic; the marker commits the unit)
        from pyspark.sql import functions as F

        m = (
            spark.read.parquet(dest)
            .agg(F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"),
                 F.max("n_rows").alias("rows"), F.count(F.lit(1)).alias("blocks"))
            .collect()[0]
        )
        manifest = {
            "unit": key,
            "src": unit,
            "raw_bytes": int(m["raw"] or 0),
            "enc_bytes": int(m["enc"] or 0),
            "n_blocks": int(m["blocks"]),
            "wall_s": round(time.time() - t0, 3),
            "codecs": codecs,
        }
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, marker)  # atomic commit
        completed += 1
    return {"completed": completed, "skipped": skipped, "total": len(units)}


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(out_dir, "_manifests", "*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out
