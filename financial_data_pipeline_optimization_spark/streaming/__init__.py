"""Structured Streaming surface (SURVEY.md §2.10, §7.5).

The reference simulates incrementality with batch re-runs, flag files
and a staging-table merge (``extraction.py:11,40-49``;
``loading.py:127-169``). This package is the streaming-native
re-expression: watermarked windows, streaming dedup by key, and an
idempotent ``foreachBatch`` merge sink. Every aggregation op has a
batch twin in ``queries.py`` so the DuckDB oracle can validate the
semantics (SURVEY.md §7.4).
"""

from financial_data_pipeline_optimization_spark.streaming.ops import (
    foreach_batch_near_dup_filter,
    foreach_batch_upsert,
    read_stream_parquet,
    running_counts_agg,
    running_counts_stateful,
    sessionized_counts,
    sliding_counts,
    stream_dedup_by_key,
    stream_dedup_within_watermark,
    stream_static_enrich,
    stream_stream_join,
    tumbling_counts,
)

__all__ = [
    "foreach_batch_near_dup_filter",
    "foreach_batch_upsert",
    "read_stream_parquet",
    "running_counts_agg",
    "running_counts_stateful",
    "sessionized_counts",
    "sliding_counts",
    "stream_dedup_by_key",
    "stream_dedup_within_watermark",
    "stream_static_enrich",
    "stream_stream_join",
    "tumbling_counts",
]
