"""Structured Streaming surface (beyond the batch-only reference)."""

from credit_abs_oltp_to_mart_spark.streaming.ops import (  # noqa: F401
    events_stream,
    run_to_memory,
    stream_ann_ingest,
    stream_corpus_ingest,
    stream_dedup_ingest,
    stream_dedup_within_watermark,
    stream_distinct_keys,
    stream_enriched_agg,
    stream_postings_ingest,
    stream_pq_ingest,
    stream_running_totals,
    stream_session_window_agg,
    stream_sessionize,
    stream_stream_join,
    stream_upsert_snapshot,
    stream_vocab_refresh,
    stream_windowed_agg,
)
