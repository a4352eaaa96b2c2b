"""Physical-plan toolkit: explicit skew mitigation and bucketed
co-location (SCALE.md)."""

from pd_utils_spark.plans.skew import salted_groupby_agg, salted_join, write_bucketed
