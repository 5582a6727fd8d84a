"""Streaming incremental ingest: chunks identical in layout to batch
builds; streamed + batch chunks queryable together."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.operators.query import search
from index_spark.plans import checkpoint as cp
from index_spark.streaming.ingest import ingest_batch, start_file_stream

SHARD = 32

CORPUS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("content", T.StringType()),
])


def test_ingest_batches_then_query(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "sidx")
    full = spark.createDataFrame(tiny_corpus)
    b1 = full.where(F.col("repo") < "org1")
    b2 = full.where(F.col("repo") >= "org1")
    m1 = ingest_batch(spark, b1, out, shard_size=SHARD)
    m2 = ingest_batch(spark, b2, out, shard_size=SHARD)
    assert m1["chunk_id"] == 0 and m2["chunk_id"] == 1
    assert m2["doc_lo"] % SHARD == 0 and m2["doc_lo"] >= m1["doc_hi"]

    stats = cp.load_stats(out)
    assert stats["n_docs"] == 150
    index = cp.load_index(spark, out)
    got = search(index, None, stats, "import", k=10).collect()
    assert len(got) == 10 and got[0]["score"] >= got[-1]["score"]


def test_empty_batch_noop(spark, tmp_path):
    out = str(tmp_path / "eidx")
    empty = spark.createDataFrame([], CORPUS_SCHEMA)
    m = ingest_batch(spark, empty, out, shard_size=SHARD)
    assert m["n_docs"] == 0 and m["chunk_id"] is None


def test_file_stream_available_now(spark, tiny_corpus, tmp_path):
    src = str(tmp_path / "drop")
    out = str(tmp_path / "stridx")
    spark.createDataFrame(tiny_corpus[:80])[["repo", "path", "content"]] \
        .write.mode("overwrite").parquet(src)
    q = start_file_stream(spark, src, out, CORPUS_SCHEMA, shard_size=SHARD)
    q.awaitTermination(120)
    lin = cp.lineage(out)
    assert len(lin) >= 1
    assert sum(m["n_docs"] for m in lin) == 80


def test_windowed_stream_agg_matches_batch(spark, tmp_path):
    """Streaming windowed counts (watermark + tumbling window,
    availableNow) == the batch groupBy over the same closed input."""
    import shutil

    from index_spark.streaming.aggregate import (
        run_stream_to_memory, windowed_event_counts)

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    src = str(tmp_path / "events_stream")
    # two "micro-batch" files so the stream sees multiple splits
    events.where("event_id % 2 = 0").write.parquet(src)
    events.where("event_id % 2 = 1").write.mode("append").parquet(src)

    q = run_stream_to_memory(spark, src, events.schema, "winagg")
    try:
        got = {tuple(map(str, r)) for r in
               spark.sql("SELECT * FROM winagg").collect()}
        exp = {tuple(map(str, r)) for r in
               windowed_event_counts(events).collect()}
        assert got == exp and len(exp) > 0
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: per-user state carried across
    micro-batches; final running totals == the batch window-function
    sessionization over the same closed input."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from index_spark.streaming.aggregate import sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    mid = events.agg(F.expr("percentile(cast(cast(ts as timestamp) as double), 0.5)")) \
                .collect()[0][0]
    src = str(tmp_path / "sess_stream")
    # two time-split files, written with distinct mod times so the file
    # source processes them in event-time order across micro-batches
    events.where(F.col("ts").cast("timestamp").cast("double") <= mid) \
          .coalesce(1).write.parquet(src)
    _time.sleep(1.2)
    events.where(F.col("ts").cast("timestamp").cast("double") > mid) \
          .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sessionize_stream(stream).writeStream.format("memory")
         .queryName("sess").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        # update mode appends one running row per (user, batch); the
        # final state is the row with the highest n_events per user
        got = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in
               spark.sql("""SELECT user_id, max(n_events) AS n_events,
                                   max(n_sessions) AS n_sessions
                            FROM sess GROUP BY user_id""").collect()}
        exp_rows = spark.sql("""
            WITH seq AS (
              SELECT user_id, cast(cast(ts AS timestamp) AS double) AS tse,
                     lag(cast(cast(ts AS timestamp) AS double))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM {ev}
            )
            SELECT user_id, count(*) AS n_events,
                   sum(CASE WHEN prev IS NULL OR tse - prev > 1800
                            THEN 1 ELSE 0 END) AS n_sessions
            FROM seq GROUP BY user_id""", ev=events).collect()
        exp = {r["user_id"]: (r["n_events"], r["n_sessions"])
               for r in exp_rows}
        assert got == exp and len(exp) > 0
        assert q.lastProgress is not None
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def test_ingest_positions_single_exchange_and_phrase(spark, tiny_corpus,
                                                     tmp_path):
    """The streamed chunk build (positions on) must show exactly ONE wide
    exchange — the doc-id bucket repartition — and the chunk must serve
    phrase queries identically to a batch positions build."""
    import re

    from index_spark.operators.build import (_bucket_partition,
                                             _build_bucketed, build_index)
    from index_spark.operators.phrase import phrase_search

    full = spark.createDataFrame(tiny_corpus)
    parted, offsets, counts = _bucket_partition(
        full.select("repo", "path", "content"))
    index = _build_bucketed(parted, offsets, counts, True, SHARD,
                            positions=True)
    plan = index._sc._jvm.PythonSQLUtils.explainString(
        index._jdf.queryExecution(), "formatted")
    assert len(set(re.findall(r"\bExchange \((\d+)\)", plan))) == 1, plan

    out = str(tmp_path / "pidx")
    m = ingest_batch(spark, full, out, shard_size=SHARD, stem=False,
                     positions=True)
    assert m["n_docs"] == 150
    sidx = cp.load_index(spark, out)
    _, bidx, _ = build_index(full, stem=False, positions=True,
                             shard_size=SHARD)
    # phrase = the first two tokens of some document (data-derived so the
    # synthetic corpus is guaranteed to contain it)
    from index_spark.functions.text import tokenize
    toks = tokenize(tiny_corpus["content"].iloc[0], stem=False)
    phrase = " ".join(toks[:2])
    a = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(sidx, None, phrase, stem=False).collect()]
    b = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(bidx, None, phrase, stem=False).collect()]
    assert a == b and len(a) > 0


def test_dedup_stream_keep_first_across_batches(spark, tmp_path):
    """Stateful streaming exact-dedup: novel docs emit once; dups (in
    the same batch or ANY earlier batch) never emit. Files arrive in
    doc_id order, so keep-first-by-arrival == batch min-doc_id."""
    import time as _time

    from index_spark.streaming.aggregate import dedup_stream

    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon",
             "gamma delta", "alpha beta", "zeta eta", "epsilon"]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "dedup_stream")
    docs.where("doc_id < 4").coalesce(1).write.parquet(src)
    _time.sleep(1.2)
    docs.where("doc_id >= 4").coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream, n_groups=4).writeStream.format("memory")
         .queryName("dedup").outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    try:
        got = {(r["doc_id"], r["content_sha"]) for r in
               spark.sql("SELECT * FROM dedup").collect()}
        exp = {(r["doc_id"], r["content_sha"]) for r in spark.sql(
            """SELECT min(doc_id) AS doc_id, content_sha FROM (
                 SELECT doc_id, sha2(text, 256) AS content_sha FROM {d})
               GROUP BY content_sha""", d=docs).collect()}
        assert got == exp
        assert {d for d, _ in got} == {0, 1, 3, 6}
    finally:
        q.stop()


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (views enriched with the
    purchases that follow within 1 hour) == the same plan on the batch
    DataFrames over the same closed input."""
    import shutil

    from index_spark.streaming.aggregate import interval_join_stream

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    views = events.where("event_type = 'view'") \
                  .select("user_id", "ts", "event_id")
    buys = events.where("event_type = 'purchase'") \
                 .select("user_id", "ts", "event_id", "value")

    exp = {tuple(map(str, r)) for r in
           interval_join_stream(views, buys, left_vals=["event_id"],
                                right_vals=["event_id", "value"])
           .collect()}
    assert len(exp) > 0

    lsrc, rsrc = str(tmp_path / "views"), str(tmp_path / "buys")
    # two files per side so each stream sees multiple splits
    views.where("event_id % 2 = 0").write.parquet(lsrc)
    views.where("event_id % 2 = 1").write.mode("append").parquet(lsrc)
    buys.where("event_id % 2 = 0").write.parquet(rsrc)
    buys.where("event_id % 2 = 1").write.mode("append").parquet(rsrc)

    lst = spark.readStream.schema(views.schema).parquet(lsrc)
    rst = spark.readStream.schema(buys.schema).parquet(rsrc)
    joined = interval_join_stream(lst, rst, left_vals=["event_id"],
                                  right_vals=["event_id", "value"])
    q = (joined.writeStream.format("memory").queryName("ivjoin")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
        got = {tuple(map(str, r)) for r in
               spark.sql("SELECT * FROM ivjoin").collect()}
        assert got == exp
    finally:
        q.stop()
        shutil.rmtree(lsrc, ignore_errors=True)
        shutil.rmtree(rsrc, ignore_errors=True)


def test_interval_join_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer stream-stream interval join: an unmatched view emits
    with NULL right columns once the watermark passes view.ts +
    max_delay (a later sentinel event advances it)."""
    import shutil

    from index_spark.streaming.aggregate import interval_join_stream

    lsrc, rsrc = str(tmp_path / "v"), str(tmp_path / "p")
    # user 1's view converts; user 2's never does; the far-future
    # sentinel (user 99) pushes the watermark past both + delay
    views = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100), (2, "2024-01-01 10:05:00", 101)],
        "user_id long, ts string, event_id long")
    buys = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00", 200, 9.5)],
        "user_id long, ts string, event_id long, value double")
    sent_v = spark.createDataFrame(
        [(99, "2024-01-02 10:00:00", 900)],
        "user_id long, ts string, event_id long")
    sent_p = spark.createDataFrame(
        [(99, "2024-01-02 10:00:01", 901, 1.0)],
        "user_id long, ts string, event_id long, value double")
    views.write.parquet(lsrc)
    sent_v.write.mode("append").parquet(lsrc)
    buys.write.parquet(rsrc)
    sent_p.write.mode("append").parquet(rsrc)

    lst = (spark.readStream.schema(views.schema)
           .option("maxFilesPerTrigger", 1).parquet(lsrc))
    rst = (spark.readStream.schema(buys.schema)
           .option("maxFilesPerTrigger", 1).parquet(rsrc))
    joined = interval_join_stream(lst, rst, left_vals=["event_id"],
                                  right_vals=["event_id", "value"],
                                  how="left_outer")
    q = (joined.writeStream.format("memory").queryName("ivjoin_lo")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(180)
        got = {(r["user_id"], r["l_event_id"], r["r_event_id"],
                r["delay_s"]) for r in
               spark.sql("SELECT * FROM ivjoin_lo").collect()}
    finally:
        q.stop()
        shutil.rmtree(lsrc, ignore_errors=True)
        shutil.rmtree(rsrc, ignore_errors=True)
    assert (1, 100, 200, 1800) in got          # the conversion
    assert (2, 101, None, None) in got         # the unmatched view
    assert (99, 900, 901, 1) in got            # the sentinel pair


def test_dedup_events_stream_drops_cross_batch_redelivery(spark, tmp_path):
    """A key re-delivered in a LATER micro-batch (within the horizon)
    is dropped; distinct keys all pass exactly once."""
    import shutil

    from index_spark.streaming.aggregate import dedup_events_stream

    src = str(tmp_path / "ev")
    b1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:10")],
        "event_id long, ts string")
    b2 = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00"),   # re-delivery of key 1
         (3, "2024-01-01 10:06:00")],
        "event_id long, ts string")
    b1.write.parquet(src)
    b2.write.mode("append").parquet(src)

    st = (spark.readStream.schema(b1.schema)
          .option("maxFilesPerTrigger", 1).parquet(src))
    out = dedup_events_stream(st, ["event_id"], delay="30 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_st")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
        got = sorted(r.event_id for r in
                     spark.sql("SELECT event_id FROM dedup_st").collect())
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)
    assert got == [1, 2, 3]
