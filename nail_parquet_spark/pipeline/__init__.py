from nail_parquet_spark.pipeline.partition import salted_repartition_by_host  # noqa: F401
from nail_parquet_spark.pipeline.manifest import partition_manifest  # noqa: F401
from nail_parquet_spark.pipeline.checkpoint import encode_resumable  # noqa: F401
from nail_parquet_spark.pipeline.web import (  # noqa: F401
    encode_web_pipeline,
    filter_and_encode_web_pipeline,
)
