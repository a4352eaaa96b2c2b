"""Structured-Streaming-compatible event-time operators (engine
extension; the reference is batch-only)."""

from pd_utils_spark.streaming.stateful import (
    read_latest_state,
    stateful_running_agg,
    streaming_band_dedup,
    streaming_exact_dedup,
    streaming_bloom_dedup,
    streaming_containment_dedup,
    streaming_distinct_hll,
    streaming_greedy_band_dedup,
    streaming_minhash_dedup,
    streaming_sample_quantiles,
    streaming_sessionize,
    streaming_topk,
    streaming_weighted_sample,
)
from pd_utils_spark.streaming.windows import (
    extract_json_props,
    time_rollup,
    read_event_stream,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    with_watermark,
)
