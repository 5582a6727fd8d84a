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


SESSION_GAP_S = 1800
_NO_TS = -1.0e18  # "no previous event" sentinel (state columns can't be null)


def sessionize_stream(events: DataFrame, gap_s: int = SESSION_GAP_S,
                      ts_col: str = "ts") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per
    user, running (n_events, n_sessions) where a session break is an
    event-time gap > ``gap_s`` — the streaming form of the batch
    events_user_sessions query (same rule: first event opens a session,
    ties ordered by (ts, event_id)).

    Per-user state is three scalars (last event time, counts); each
    micro-batch updates it vectorized (one diff + comparison over the
    user's batch rows — no per-row Python). Update output mode emits the
    running totals per user per batch; the final row per user equals the
    batch aggregation over the same closed input (test-pinned).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_type = ("user_id long, n_events long, n_sessions long")
    state_type = ("last_ts double, n_events long, n_sessions long")

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        last_ts, n_ev, n_sess = state.get if state.exists \
            else (_NO_TS, 0, 0)
        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["_ts_epoch", "event_id"])
        ts = batch["_ts_epoch"].to_numpy(dtype=np.float64)
        if ts.size:
            prev = np.concatenate(([last_ts], ts[:-1]))
            n_sess += int(((ts - prev) > gap_s).sum())
            n_ev += ts.size
            last_ts = float(ts[-1])
            state.update((last_ts, int(n_ev), int(n_sess)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_ev],
                            "n_sessions": [n_sess]})

    prepared = events.withColumn(
        "_ts_epoch", F.col(ts_col).cast("timestamp").cast("double"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn, out_type, state_type, "update", GroupStateTimeout.NoTimeout)


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 n_groups: int = 256) -> DataFrame:
    """Streaming exact dedup (applyInPandasWithState): keep-first by
    content sha256 ACROSS micro-batches — the stateful form of the
    curation tier's duplicate gate. Emits one row per NOVEL document,
    (doc_id, content_sha); a doc whose hash was seen in any earlier
    batch (or earlier in its own batch, lower doc_id first) emits
    nothing — downstream stages semi-join the emitted ids to keep.

    State is keyed by a hash-prefix group (``pmod(xxhash64(sha),
    n_groups)``), so seen-hash sets spread uniformly over ``n_groups``
    state partitions — state per group ~ distinct-docs/n_groups, and
    ``n_groups`` is the scale-out knob (10^4+ on a big cluster). Each
    group's state is the sorted array of its seen hashes; membership
    per batch is one vectorized ``np.isin``. Exact by construction —
    the bounded-memory variant (per-group Bloom filter, false-positive
    drops) rides the same contract; at 10^12 docs you shard groups
    until the array fits, or accept the Bloom tier.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_type = "doc_id long, content_sha string"
    state_type = "seen array<string>"

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (seen,) = state.get if state.exists else ([],)
        seen_arr = np.asarray(seen, dtype=object)
        batch = pd.concat(list(pdfs)).sort_values("doc_id")
        # keep-first within the batch (lowest doc_id per sha)...
        batch = batch.drop_duplicates("content_sha", keep="first")
        # ...then against every earlier batch's state
        novel = batch[~batch["content_sha"].isin(seen_arr)]
        if len(novel):
            state.update((sorted(set(seen) | set(novel["content_sha"])),))
        yield novel[["doc_id", "content_sha"]]

    prepared = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
         .alias("content_sha"),
        F.pmod(F.xxhash64(F.sha2(F.coalesce(F.col(text_col), F.lit("")),
                                 256)), F.lit(n_groups)).alias("_g"))
    return prepared.groupBy("_g").applyInPandasWithState(
        fn, out_type, state_type, "update", GroupStateTimeout.NoTimeout)


def near_dup_stream(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    min_equal: int | None = None,
                    max_bucket: int = 64) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate discovery
    (applyInPandasWithState): the stateful form of
    ``dedup.minhash_near_dup_pairs`` — emits verified pairs
    (doc_a, doc_b, n_equal) with >= ``min_equal`` (default 57) of 64
    equal signature bytes, across micro-batches, as documents arrive.

    Shape: the signature pass is the SAME batch-vectorized Arrow kernel
    as the batch path (``signatures_df`` — stateless, so it runs on a
    stream unchanged); band keys explode to (band_id, band_hash) rows
    and the state groups are the LSH BUCKETS themselves. Each bucket's
    state is its members' (ids, concatenated signatures); a batch's new
    members compare against the stored block and each other in two
    vectorized byte-equality passes — never per-row Python.

    Contracts and bounds:
    - A pair colliding in several bands emits once per band: consumers
      ``dropDuplicates([doc_a, doc_b])`` — the same pre-verify dedup
      the batch kernel does, which a per-bucket stateful operator
      cannot do globally. Within one band, STORED members never re-pair
      (re-delivered ids are filtered against the stored set); an
      at-least-once source re-delivering an OVERFLOW doc (arrived after
      the bucket cap, so not stored) re-emits its member pairs — the
      price of bounding state, absorbed by the same consumer
      dropDuplicates.
    - State per bucket caps at ``max_bucket`` members (the streaming
      form of the batch kernel's giant-bucket guard): later arrivals
      in an oversized bucket still compare against the stored members
      (so keep-first dedup still links every loser to an early keeper)
      but are not stored — the full pair listing inside pathological
      buckets is intentionally not enumerated, exactly like the batch
      star-pairing trade.
    - Bucket state is bounded (<= max_bucket * 72 bytes), groups are
      near-uniform FNV band hashes, so state scales out with
      ``spark.sql.shuffle.partitions`` like any keyed state store.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from index_spark.operators.dedup import (
        NUM_SIMILARITY,
        SIGNATURE_SIZE,
        signatures_df,
    )

    thresh = NUM_SIMILARITY if min_equal is None else min_equal
    out_type = "doc_a long, doc_b long, n_equal int"
    state_type = "ids array<long>, sigs binary"

    def fn(key, pdfs, state):
        ids, blob = state.get if state.exists else ([], b"")
        stored_ids = np.asarray(ids, dtype=np.int64)
        stored = np.frombuffer(blob, dtype=np.uint8) \
            .reshape(-1, SIGNATURE_SIZE)
        batch = pd.concat(list(pdfs)).sort_values("doc_id") \
            .drop_duplicates("doc_id")
        # a doc re-arriving in a later batch is already a bucket member
        batch = batch[~batch["doc_id"].isin(stored_ids)]
        if not len(batch):
            yield pd.DataFrame({"doc_a": [], "doc_b": [],
                                "n_equal": []}).astype(
                {"doc_a": np.int64, "doc_b": np.int64,
                 "n_equal": np.int32})
            return
        new_ids = batch["doc_id"].to_numpy(np.int64)
        new = np.frombuffer(b"".join(batch["sig"]), dtype=np.uint8) \
            .reshape(-1, SIGNATURE_SIZE)
        a_l, b_l, n_l = [], [], []

        def cross(ia, sa, ib, sb):
            eq = (sa[:, None, :] == sb[None, :, :]).sum(-1)
            hit = np.argwhere(eq >= thresh)
            if hit.size:
                x, y = ia[hit[:, 0]], ib[hit[:, 1]]
                a_l.append(np.minimum(x, y))
                b_l.append(np.maximum(x, y))
                n_l.append(eq[hit[:, 0], hit[:, 1]])

        # the cap splits the batch: members that FIT become bucket
        # members (full pairing); overflow only links to members —
        # later-vs-later pairs in an oversized bucket are not
        # enumerated (the batch kernel's star-pairing trade, streamed)
        room = max(0, max_bucket - stored.shape[0])
        kept, over = new[:room], new[room:]
        kept_ids, over_ids = new_ids[:room], new_ids[room:]
        if stored.shape[0]:
            cross(stored_ids, stored, new_ids, new)
        if kept.shape[0] > 1:
            eq = (kept[:, None, :] == kept[None, :, :]).sum(-1)
            iu = np.triu_indices(kept.shape[0], k=1)
            ok = eq[iu] >= thresh
            if ok.any():
                a_l.append(kept_ids[iu[0][ok]])
                b_l.append(kept_ids[iu[1][ok]])
                n_l.append(eq[iu][ok])
        if kept.shape[0] and over.shape[0]:
            cross(kept_ids, kept, over_ids, over)
        if kept.shape[0]:
            state.update((
                [int(x) for x in np.concatenate([stored_ids, kept_ids])],
                stored.tobytes() + kept.tobytes()))
        yield pd.DataFrame({
            "doc_a": np.concatenate(a_l) if a_l else np.empty(0, np.int64),
            "doc_b": np.concatenate(b_l) if b_l else np.empty(0, np.int64),
            "n_equal": (np.concatenate(n_l).astype(np.int32)
                        if n_l else np.empty(0, np.int32))})

    sigs = signatures_df(docs, text_col=text_col, id_col=id_col)
    bands = sigs.select(
        "doc_id", "sig",
        F.posexplode("bands").alias("band_id", "band_hash"))
    return bands.groupBy("band_id", "band_hash").applyInPandasWithState(
        fn, out_type, state_type, "update", GroupStateTimeout.NoTimeout)


def interval_join_stream(left: DataFrame, right: DataFrame,
                         key_col: str = "user_id", ts_col: str = "ts",
                         left_vals: list[str] | None = None,
                         right_vals: list[str] | None = None,
                         max_delay: str = "1 hour",
                         watermark: str = "2 hours",
                         how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join — the canonical
    streaming enrichment (attribute each left event to the right
    events that follow it within ``max_delay`` on the same key:
    impressions x clicks, views x purchases). Join on

        l.key = r.key AND l.ts <= r.ts <= l.ts + max_delay

    Returns (key, l_ts, r_ts, delay_s, l_<left_vals...>,
    r_<right_vals...>).

    ``how='left_outer'`` keeps unmatched left events with NULL right
    columns — the unattributed-impressions form of the same plan (an
    impression with no conversion is a row you report on, not one you
    drop). On a stream, an unmatched left row emits only once the
    watermark passes l.ts + max_delay (the join must be SURE no match
    can still arrive — standard outer stream-stream semantics), so a
    closed input's trailing horizon stays buffered until a later event
    (or stream end in a subsequent trigger) advances the watermark.

    Kappa parity: the SAME plan serves batch DataFrames (no watermark
    node) and streams — the tests pin stream == batch on a closed
    input. On streams both sides get the watermark, which with the
    time-range predicate bounds the join STATE: a buffered left row
    can be dropped once the watermark passes l.ts + max_delay, so
    state is O(events in the delay+lateness horizon), never the full
    history — the property that makes a stream-stream join runnable
    forever at 100-TB/day rates."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    lv = left_vals or []
    rv = right_vals or []

    def _side(df: DataFrame, tag: str, vals: list[str]) -> DataFrame:
        out = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        if out.isStreaming:
            out = out.withWatermark(ts_col, watermark)
        return out.select(
            F.col(key_col).alias(f"{tag}_k"),
            F.col(ts_col).alias(f"{tag}_ts"),
            *[F.col(c).alias(f"{tag}_{c}") for c in vals])

    l, r = _side(left, "l", lv), _side(right, "r", rv)
    cond = ((l["l_k"] == r["r_k"])
            & (r["r_ts"] >= l["l_ts"])
            & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {max_delay}")))
    # whole seconds of the MICROSECOND difference (unix_timestamp would
    # truncate each side to seconds first: .99 -> .05 next minute would
    # read one second high)
    delay = F.expr("(unix_micros(r_ts) - unix_micros(l_ts)) "
                   "div 1000000").alias("delay_s")
    return (l.join(r, cond, how)
            .select(F.col("l_k").alias(key_col), "l_ts", "r_ts", delay,
                    *[f"l_{c}" for c in lv], *[f"r_{c}" for c in rv]))


def dedup_events_stream(events: DataFrame, keys: list[str], ts_col: str = "ts",
                 delay: str = "1 hour") -> DataFrame:
    """Exactly-once event deduplication within a watermark horizon —
    the stream-ingest hygiene gate (at-least-once sources re-deliver;
    downstream counts must not double). First arrival per key wins;
    re-deliveries within ``delay`` of the watermark are dropped.
    Complements :func:`dedup_stream` (the CONTENT-hash keep-first doc
    gate with custom grouped state): this is the KEY-based form on
    Spark's built-in bounded-state operator, for event streams whose
    identity is already a column.

    Streaming form: ``withWatermark(ts_col, delay)`` +
    ``dropDuplicatesWithinWatermark(keys)`` — state holds one entry
    per DISTINCT key seen in the horizon and entries expire as the
    watermark advances, so memory is O(keys per horizon), never the
    full history (the property that keeps the gate runnable forever;
    plain ``dropDuplicates`` on a stream would accrete state without
    bound). A duplicate arriving later than ``delay`` after its
    original passes — the horizon is the documented contract, sized to
    the source's re-delivery window, exactly like late-data loss in
    windowed aggregation.

    Batch form (Kappa parity): ``dropDuplicates(keys)`` over the same
    plan inputs. Parity is over the KEY SET — which physical duplicate
    row survives is engine-chosen on both forms, so project the keys
    (or treat non-key columns as per-key-constant) when comparing."""
    if not keys:
        raise ValueError("dedup_events_stream needs at least one key column")
    out = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if out.isStreaming:
        return (out.withWatermark(ts_col, delay)
                .dropDuplicatesWithinWatermark(keys))
    return out.dropDuplicates(keys)


def sessionize_window_stream(events: DataFrame, gap_s: int = SESSION_GAP_S,
                             ts_col: str = "ts",
                             watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization on Spark's NATIVE ``session_window``
    (vs :func:`sessionize_stream`'s custom Python state): watermarked
    event time, per-user session rows (start, end = last event + gap,
    n_events) emitted when the watermark passes the session's close —
    append mode, so every emitted row is FINAL (exactly the late-data
    contract a downstream sink wants).  State is JVM-side and merges
    adjacent micro-batch sessions automatically; no Python worker in
    the loop."""
    t = F.col(ts_col).cast("timestamp")
    return (events.withColumn("_t", t)
            .withWatermark("_t", watermark)
            .groupBy(F.col("user_id"),
                     F.session_window(F.col("_t"), f"{gap_s} seconds")
                     .alias("sw"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"), "n_events"))


def enrich_stream(events: DataFrame, dim: DataFrame,
                  keys: list[str] | str = "user_id",
                  how: str = "left",
                  broadcast: bool = True) -> DataFrame:
    """Stream-static enrichment join — the ES ingest ``enrich``
    processor / dimension-lookup stage of a streaming pipeline: each
    micro-batch's events equi-join a STATIC dimension relation (user
    profile, repo metadata, geo table).

    Spark's stream-static join needs no watermark and keeps no state —
    the static side is (re)planned per micro-batch, so a small
    dimension broadcasts and the stream stays one map-side pass; the
    SAME call on two batch frames produces the identical plan (Kappa
    parity, pinned by test). ``how`` is ``left`` (keep unmatched
    events, NULL attributes — the enrich-processor default) or
    ``inner``. ``broadcast=False`` drops the hint for a dimension too
    large to broadcast (multi-GB profile tables) and lets the
    optimizer pick the join strategy per micro-batch instead of
    forcing a build-side OOM."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, keys, how)
