from nail_parquet_spark.operators.columns import (  # noqa: F401
    add_id_column,
    create_columns,
    drop_columns,
    drop_rows,
    headers,
    rename_columns,
    resolve_column_patterns,
    schema_rows,
    select_columns,
    select_rows,
)
from nail_parquet_spark.operators.rows import (  # noqa: F401
    drop_rows_where,
    filter_conditions,
    filter_rows_mode,
    head,
    preview,
    sample_fraction,
    sample_random,
    sample_stratified,
    search_rows,
    search_value,
    shuffle_rows,
    split_by_group,
    split_by_ratio,
    tail,
)
from nail_parquet_spark.operators.agg import (  # noqa: F401
    binning,
    binning_multi,
    correlation_matrix,
    correlations,
    correlations_with_pvalues,
    count_rows,
    distinct_values,
    frequency,
    numeric_cols,
    outliers,
    pivot_table,
    stats,
)
from nail_parquet_spark.operators.join import (  # noqa: F401
    merge_bucketed,
    merge_salted,
    write_bucketed,
    append,
    dedup_columns,
    dedup_rows,
    except_rows,
    intersect_rows,
    merge,
)
from nail_parquet_spark.operators.fill import (  # noqa: F401
    fill_directional,
    fill_stat,
    fill_stat_grouped,
    fill_value,
)
from nail_parquet_spark.operators.sort import sort_by  # noqa: F401
from nail_parquet_spark.operators.asof import (  # noqa: F401
    asof_join,
    asof_join_broadcast,
    range_join,
)
from nail_parquet_spark.operators.analytics import (  # noqa: F401
    funnel,
    funnel_durations,
    grouping_sets,
    resample,
    retention,
    sample_per_group,
    topk_per_group,
)
