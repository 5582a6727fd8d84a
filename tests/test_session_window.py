"""Native Spark session_window sessionization — batch + watermarked
streaming (the JVM-side complement to the custom stateful sessionizer
in streaming/aggregate.py)."""

import time as _time

import pytest
from pyspark.sql import functions as F


def test_session_window_batch_islands(spark):
    from index_spark.operators.temporal import session_window_agg

    rows = [(1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 2.0),   # same session (gap 600s)
            (1, "2024-01-01 11:00:00", 3.0),   # > 30 min later: new one
            (2, "2024-01-01 10:00:00", 4.0)]
    ev = spark.createDataFrame(rows, "user_id int, ts string, "
                                     "value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = session_window_agg(ev, gap_s=1800, by=["user_id"]).collect()
    assert [(r.user_id, r.n_events, r.sum_value) for r in out] == \
        [(1, 2, 3.0), (1, 1, 3.0), (2, 1, 4.0)]
    # Spark convention: session_end = last event + gap
    assert str(out[0].session_end) == "2024-01-01 10:40:00"
    with pytest.raises(ValueError, match="gap_s"):
        session_window_agg(ev, gap_s=0)


def test_session_window_matches_islands_oracle(spark):
    import duckdb

    from index_spark.operators.temporal import session_window_agg

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = session_window_agg(ev, gap_s=1800,
                             by=["user_id"]).toPandas()
    con = duckdb.connect()
    con.execute("create view events as select * from "
                "'/root/testdata/sf0.001/events.parquet'")
    want = con.sql("""
        WITH o AS (SELECT user_id, ts, value,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events),
        m AS (SELECT *, CASE WHEN prev IS NULL
                              OR epoch(ts) - epoch(prev) > 1800
                             THEN 1 ELSE 0 END AS brk FROM o),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM m)
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 1800 SECOND AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start""").df()
    assert len(got) == len(want)
    assert got.astype(str).reset_index(drop=True).equals(
        want.astype(str).reset_index(drop=True))


def test_sessionize_window_stream_final_rows(spark, tmp_path):
    from index_spark.streaming.aggregate import sessionize_window_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mid = ev.agg(F.expr(
        "percentile(cast(cast(ts as timestamp) as double), 0.5)")) \
        .collect()[0][0]
    src = str(tmp_path / "swin_stream")
    ev.where(F.col("ts").cast("timestamp").cast("double") <= mid) \
        .coalesce(1).write.parquet(src)
    _time.sleep(1.2)
    ev.where(F.col("ts").cast("timestamp").cast("double") > mid) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sessionize_window_stream(stream, gap_s=1800)
         .writeStream.format("memory").queryName("swin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        got = spark.sql("SELECT user_id, session_start, n_events "
                        "FROM swin").collect()
        # append mode emits only watermark-closed sessions: every row
        # must be FINAL — identical to the batch result for that key
        from index_spark.operators.temporal import session_window_agg

        batch = {(r.user_id, r.session_start): r.n_events
                 for r in session_window_agg(
                     ev, gap_s=1800, by=["user_id"],
                     value_col=None).collect()}
        assert len(got) > 0
        for r in got:
            assert batch[(r.user_id, r.session_start)] == r.n_events
    finally:
        spark.sql("DROP VIEW IF EXISTS swin")
