"""nail_parquet_spark — a PySpark-native analytics + per-column
lightweight-compression engine with the query/data-processing surface of
Vitruves/nail-parquet (reference at /root/reference, studied for WHAT to
compute; architecture here is Spark-first, not a port).

Layout (see SURVEY.md §7.0):
  session   — SparkSession factory (AQE on, Arrow on, UTC)
  synth     — deterministic Common-Crawl-style web-table generator
  codec/    — numpy/pyarrow codec kernels (dict, rle, fsst, for/delta
              bit-pack, zstd, plain) + block format + auto-selector +
              mapInArrow encode/decode Spark stages
  operators/— the nail-parquet command surface re-expressed as DataFrame ops
  functions/— text analysis / dedup / similarity column helpers
  pipeline/ — salted repartition, lineage manifests, checkpoint resume
  sources/  — read/write parquet|csv|json|xlsx
"""

__version__ = "0.1.0"
