"""Physical-plan toolkit: explicit skew mitigation, bucketed
co-location, and Z-order storage layout (SCALE.md)."""

from pd_utils_spark.plans.layout import write_partitioned, zorder_by, zorder_key, zorder_write
from pd_utils_spark.plans.prune import bloom_prune_join, semi_prune_join
from pd_utils_spark.plans.skew import (
    hot_key_join,
    key_skew_report,
    salted_groupby_agg,
    salted_join,
    write_bucketed,
)
