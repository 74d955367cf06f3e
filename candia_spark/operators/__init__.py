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
from candia_spark.operators.asof import asof_join  # noqa: F401
from candia_spark.operators.sequential import (  # noqa: F401
    assign_scan_cycles,
    greedy_partition_starts,
    greedy_ppm_partition,
)
