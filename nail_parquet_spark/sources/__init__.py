from nail_parquet_spark.sources.io import read_data, write_data  # noqa: F401
