from candia_spark.operators.relational import (  # noqa: F401
    interval_join,
    interval_anti_join,
    band_join,
    adjust_overlapping_windows,
    bucketize,
    groupwise_argmax,
    two_level_count_filter,
    cross_index,
    explode_index,
    histogram_cutoff_filter,
    deterministic_id,
)
