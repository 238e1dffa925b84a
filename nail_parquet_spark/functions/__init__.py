from nail_parquet_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_scores,
    quality_metrics,
    token_count,
)
