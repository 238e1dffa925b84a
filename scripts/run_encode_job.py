"""spark-submit entry point: resumable encode of a parquet/Iceberg-file
table into an encoded-blocks table with lineage manifests.

Submitted via scripts/submit_encode.sh (--py-files ships the package); on a
cluster the SparkSession comes from spark-submit's conf, not local[N].
"""
import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    src, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("nail-spark-encode").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from nail_parquet_spark.pipeline.checkpoint import encode_resumable, read_manifests

    res = encode_resumable(spark, src, out)
    manifests = read_manifests(out)
    raw = sum(m["raw_bytes"] for m in manifests)
    enc = sum(m["enc_bytes"] for m in manifests)
    wall = sum(m["wall_s"] for m in manifests)
    print(json.dumps({
        **res,
        "raw_bytes": raw,
        "enc_bytes": enc,
        "ratio": round(raw / enc, 4) if enc else None,
        "sum_unit_wall_s": round(wall, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
