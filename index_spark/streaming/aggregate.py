"""Streaming windowed aggregation with watermarking (late-data bound).

The reference has no streaming surface (its crawler pushes documents into
the batch indexer); this is the engine's Structured-Streaming analytics
layer over the same event-log shape the batch side queries
(events_hourly / events_user_sessions): ``readStream`` -> watermark ->
tumbling-window aggregate -> sink. State is bounded by the watermark —
windows older than (max event time - delay) are finalized and dropped,
so executor state does not grow with stream length; that is the
streaming analog of the batch build's bounded-shard memory.

In append output mode the sink receives each window exactly once, after
its watermark passes — identical rows to the batch groupBy over the same
closed data (test-pinned with an availableNow run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "30 minutes",
                          ts_col: str = "ts") -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value) per
    tumbling window; works on a streaming OR batch DataFrame (the same
    plan serves both — Kappa-style parity, like the ingest path)."""
    # watermarking requires TIMESTAMP (not NTZ); cast on both paths so
    # streaming and batch window boundaries stay identical
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming \
        else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def run_stream_to_memory(spark, source_dir: str, schema, name: str,
                         window: str = "1 hour",
                         watermark: str = "30 minutes"):
    """Drive the windowed aggregate over a file-source stream with
    availableNow (process-everything-then-stop) into a memory sink;
    returns the finished query. Complete output mode emits every window
    (availableNow runs exhaust the source, so results equal the batch
    aggregate — the parity the tests pin)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q
