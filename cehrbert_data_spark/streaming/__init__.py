"""Structured Streaming surface (beyond-reference; SURVEY.md §2.9).

The reference is batch-only, but three of its operators are naturally
streaming: sessionization by time gap (W7), hourly rollup (A2), and
event-stream dedup (U5). This package exposes them over ``readStream``
sources with watermarks, sharing semantics with the batch operators.
"""

from cehrbert_data_spark.streaming.operators import (
    hist_bin_stream,
    hll_register_stream,
    asof_join_stream,
    hourly_rollup_stream,
    minhash_dedup_stream,
    running_key_stats_stream,
    session_window_stream,
    sliding_rollup_stream,
    stream_static_enrich,
    streaming_dedup,
)

__all__ = [
    "asof_join_stream",
    "sliding_rollup_stream",
    "hist_bin_stream",
    "hll_register_stream",
    "minhash_dedup_stream",
    "stream_static_enrich",
    "hourly_rollup_stream",
    "running_key_stats_stream",
    "session_window_stream",
    "streaming_dedup",
]
