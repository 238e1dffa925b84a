from nail_parquet_spark.plans.explain import assert_pushdown, plan_text  # noqa: F401
