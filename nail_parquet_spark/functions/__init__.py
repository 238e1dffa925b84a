from nail_parquet_spark.functions.text import (  # noqa: F401
    chunk_documents,
    doc_fingerprint,
    lang_scores,
    quality_metrics,
    token_count,
)
