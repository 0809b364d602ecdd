from sayn_spark.plans.materialise import (  # noqa: F401
    incremental_filter,
    merge_dataframes,
)
