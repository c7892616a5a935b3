"""Event-time windowed aggregation with a watermark — the late-data path.

The clips pipeline itself is per-row (no event time), but a production
ingest emits *events* (arrivals, drops, scrub hits) whose dashboards need
event-time windows with bounded state: a watermark lets Spark finalize a
window once event time passes window_end + delay, evicting its state —
without one, windowed state grows forever at 10^12-event scale.

Semantics (what Spark guarantees vs best-effort): the watermark guarantees
a window is never finalized before the watermark passes window_end (no
early emission in append mode) and that finalized state is evicted —
bounded state.  Dropping events that arrive later than the watermark is
best-effort: they MAY still be merged if the window's state has not been
evicted yet.  Both behaviors are pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(events: DataFrame, window: str = "1 hour",
                         watermark: str = "10 minutes") -> DataFrame:
    """events(ts, event_type, value, ...) -> per (window, event_type)
    count + value sum.  Works on both batch and streaming frames; the
    watermark only applies (and only bounds state) on streams."""
    # watermarks require TIMESTAMP (tz-aware); parquet written with NTZ
    # timestamps (e.g. pandas/duckdb writers) needs the cast first
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "value_sum"))
