from nail_parquet_spark.streaming.events import (  # noqa: F401
    stream_events_hourly,
    stream_from_directory,
)
