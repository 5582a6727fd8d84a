"""Index build pipeline: corpus -> docs/postings -> sharded posting blobs.

Spark-first re-expression of the reference build kernel
(/root/reference/index.cpp:112-162 ``Index::addDocument`` and the
PostingList machinery, index.h:139-284). Default (fused, Arrow-native)
plan:

  read corpus -> doc_id range exchange (the build's ONLY wide shuffle)
              -> ONE mapInArrow kernel per contiguous-doc-range shard:
                 tokenize+stem off the Arrow string buffers -> per-(doc,
                 term) counts -> delta+varbyte blobs + skips + block-max,
                 emitted zero-copy -> term+shard blob index table
                 (+ '%' doc-table rows carrying doc ids / lengths)

A two-stage shuffle plan (tokenize+count UDF -> groupBy(shard) ->
applyInPandas blob kernel) remains available via ``fused=False`` for
callers that need the intermediate (term, doc_id, tf) relation
(streaming ingest, chunked checkpoint builds).

Design notes for 100 TB / 10^12-file scale:

- **doc_id assignment** avoids the single-partition global window AND a
  corpus-sized cache: deterministic hash-sampled key-range buckets, a
  metadata-size per-bucket count pass, then doc_id = bucket offset +
  rank within bucket (scalable zipWithIndex; see ``assign_doc_ids``).
- **sharding IS the skew handling** (north_rule's explicit hot-term
  salting, range-salt variant from SURVEY.md §4.1): every term's postings
  are range-partitioned by ``doc_id // shard_size``, so a hot term like
  ``import`` (present in ~every doc) is split into bounded-size blobs
  instead of one giant reducer key. Shard boundaries are global, so the
  shards of different terms align and the query side can run
  document-at-a-time scoring per shard. Cold terms occupy few shards by
  construction (df small), so the overhead is bounded.
- **merge to the global per-term index** (north_star's sorted-merge
  stage) is concatenation + boundary-delta patching, because range shards
  hold disjoint, ordered doc_id ranges — see :mod:`.merge`.
- blobs: sorted doc_ids -> deltas -> leading-ones varbyte
  (index.h:63-74 semantics); skip pointers at power-of-two doc_id
  crossings (index.h:276-281 semantics); block-max metadata per
  128-posting block (Ding & Suel, SIGIR'11) for WAND.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize_series

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
DEFAULT_SHARD_SIZE = 4096

TOKENS_SCHEMA = T.ArrayType(T.StringType())

INDEX_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("shard", T.LongType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("doc_blob", T.BinaryType(), False),
    T.StructField("tf_blob", T.BinaryType(), False),
    T.StructField("dl_blob", T.BinaryType(), False),
    T.StructField("pos_blob", T.BinaryType(), False),
    T.StructField("skips", T.ArrayType(
        T.StructType([
            T.StructField("idx", T.LongType(), False),
            T.StructField("doc", T.LongType(), False),
        ])), False),
    T.StructField("blocks", T.ArrayType(
        T.StructType([
            T.StructField("start", T.LongType(), False),
            T.StructField("last_doc", T.LongType(), False),
            T.StructField("max_tf", T.LongType(), False),
            T.StructField("min_dl", T.DoubleType(), False),
            # blob-local byte offsets of the block's first varbyte in
            # doc/tf/dl blobs: block-max WAND decodes ONLY surviving
            # blocks (the delta base of block i is blocks[i-1].last_doc)
            T.StructField("doc_off", T.LongType(), False),
            T.StructField("tf_off", T.LongType(), False),
            T.StructField("dl_off", T.LongType(), False),
        ])), False),
    T.StructField("max_tf", T.LongType(), False),
    T.StructField("min_dl", T.DoubleType(), False),
])


_KEY_SEP = "\x01"


def _bucket_partition(corpus: DataFrame, num_partitions: int | None = None,
                      buckets_per_partition: int = 4,
                      docs_per_partition: int = 4096):
    """Deterministic key-range bucketing, cache-free.

    1. deterministic pseudo-sample of keys (hash filter — NOT Spark's
       range sampler, whose boundaries differ run to run) -> sorted
       bucket boundaries; buckets are contiguous (repo, path) key ranges
    2. one tiny map-side-combined count per bucket -> exact bucket
       offsets (``doc_id`` = bucket offset + rank within bucket = the
       exact global (repo, path) rank — independent of partitioning;
       sampling quality only affects balance, never ids)
    3. hash repartition on bucket id + sort within partitions by
       (bucket, repo, path): every partition holds whole buckets whose
       rows ascend in doc_id — the contiguity invariant the fused build
       needs

    Returns (parted_df_with__bucket, offsets, counts). Determinism holds
    because every step depends only on the key set; a nondeterministic
    upstream is caught by the consumers' count verification.
    """
    spark = corpus.sparkSession
    derive_parts = num_partitions is None
    if derive_parts:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    # NULL repo/path coalesce to '' (concat_ws would silently DROP a null
    # column, collapsing the key); both bucketing and the within-partition
    # sort below order by THIS key string, so bucket boundaries and ranks
    # can never disagree. String-order(key) == tuple-order(repo, path)
    # whenever keys contain no \x00/\x01 bytes (the separator assumption —
    # for keys carrying control bytes doc_ids are still deterministic and
    # dense, just ranked by the joined key string).
    key = F.concat_ws(_KEY_SEP,
                      F.coalesce(F.col("repo"), F.lit("")),
                      F.coalesce(F.col("path"), F.lit("")))
    n = corpus.count()
    if n == 0:
        return None, {}, {}
    if derive_parts:
        # don't over-partition a small corpus: every partition of every
        # Python stage pays a worker launch + Arrow channel, which
        # dominates when partitions hold a few hundred docs (the kernel
        # itself is ~20us/doc). At real scale ceil(n/docs_per_partition)
        # >> parallelism and the cap never binds.
        num_partitions = max(1, min(num_partitions,
                                    -(-n // docs_per_partition)))
    n_buckets = num_partitions * buckets_per_partition
    # ~128 deterministic samples per bucket; mod-hash keeps it exact
    rate = max(1, n // (n_buckets * 128))
    sample = [r["k"] for r in corpus.select(key.alias("k"))
              .where(F.pmod(F.xxhash64(key), F.lit(rate)) == 0)
              .collect()]
    sample.sort()
    bounds = [sample[(len(sample) * i) // n_buckets]
              for i in range(1, n_buckets)] if sample else []

    # bucket id = searchsorted(bounds, key, side='right'). A pandas UDF
    # (Arrow-vectorized binary search, O(log n_buckets)/row) — NOT a JVM
    # size(filter(literal_array, ...)) expression: higher-order functions
    # run INTERPRETED per element, O(n_buckets)/row, measured 2.6x slower
    # on the whole 200k-doc build. (Bucket evaluation happens twice — the
    # count pass and the repartition — so its cost is on the build's
    # critical path.)
    bounds_arr = np.array(bounds, dtype=object)

    @F.pandas_udf(T.IntegerType())
    def _bucket(keys: pd.Series) -> pd.Series:
        if bounds_arr.size == 0:
            return pd.Series(np.zeros(len(keys), dtype=np.int32))
        b = np.searchsorted(bounds_arr, keys.to_numpy(dtype=object),
                            side="right").astype(np.int32)
        return pd.Series(b)

    bucketed = corpus.withColumn("_key", key) \
                     .withColumn("_bucket", _bucket(F.col("_key")))
    counts = {int(r["_bucket"]): int(r["count"])
              for r in bucketed.groupBy("_bucket").count().collect()}
    offsets = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    # exact load-balanced placement (round-5): hashing 4p bucket ids
    # into p partitions is binomially imbalanced — measured max/mean
    # partition load 1.79 at p=32 on the 200k corpus, i.e. the wide
    # stage waits ~80% extra on one straggler, the dominant cost in the
    # 8->32 scaling gap. Since per-bucket doc counts are ALREADY
    # collected, assign buckets to partitions greedily (LPT bin
    # packing, deterministic) and route each bucket through a TOKEN
    # whose hash lands on its assigned partition (repartition(n, col)
    # places rows at pmod(hash(col), n) — empirically pinned in
    # tests). Balance becomes ~max_bucket/mean_bin (~1.02 here). The
    # token map is a bounded literal (4 entries per partition); at
    # 10^4+ executors it would ship as a broadcast join instead.
    import heapq

    tokens = _partition_tokens(spark, num_partitions)
    bins = [(0, p) for p in range(num_partitions)]
    heapq.heapify(bins)
    assign: dict[int, int] = {}
    for b in sorted(counts, key=lambda b: (-counts[b], b)):
        load, p = heapq.heappop(bins)
        assign[b] = p
        heapq.heappush(bins, (load + counts[b], p))
    tok_pairs = []
    for b, p in assign.items():
        # token must be LONG: Murmur3 hashes int32 and int64 values
        # differently, and the probe table hashed longs
        tok_pairs += [F.lit(int(b)).cast("int"),
                      F.lit(int(tokens[p])).cast("long")]
    tok_map = F.create_map(*tok_pairs)
    parted = (bucketed
              .withColumn("_tok", tok_map[F.col("_bucket")])
              .repartition(num_partitions, "_tok")
              .sortWithinPartitions("_bucket", "_key")
              .drop("_key", "_tok"))
    return parted, offsets, counts


_TOKEN_CACHE: dict[int, dict[int, int]] = {}


def _partition_tokens(spark, nparts: int) -> dict[int, int]:
    """partition id -> an int64 token with pmod(murmur3_hash(token),
    nparts) == id, probed through Spark's own hash so it matches the
    HashPartitioner exactly; cached per partition count."""
    got = _TOKEN_CACHE.get(nparts)
    if got is not None:
        return got
    out: dict[int, int] = {}
    lo = 0
    while len(out) < nparts:
        rows = (spark.range(lo, lo + max(64, 4 * nparts))
                .select("id", F.pmod(F.hash("id"), F.lit(nparts))
                        .alias("r")).collect())
        for r in rows:
            out.setdefault(int(r["r"]), int(r["id"]))
        lo += max(64, 4 * nparts)
    _TOKEN_CACHE[nparts] = out
    return out


def _run_ids(b: np.ndarray, offsets: dict, seen: dict) -> np.ndarray:
    """doc_ids for one batch of bucket codes (sorted runs), updating the
    per-partition ``seen`` progress map."""
    ids = np.empty(len(b), dtype=np.int64)
    runs = np.concatenate(([0], np.flatnonzero(np.diff(b)) + 1, [len(b)]))
    for lo, hi in zip(runs[:-1], runs[1:]):
        bk = int(b[lo])
        base = offsets[bk] + seen.get(bk, 0)
        ids[lo:hi] = np.arange(base, base + (hi - lo), dtype=np.int64)
        seen[bk] = seen.get(bk, 0) + (hi - lo)
    return ids


def _verify_seen(seen: dict, counts: dict) -> None:
    for bk, cnt in seen.items():
        if cnt != counts.get(bk, -1):
            raise RuntimeError(
                f"doc_id assignment drift: bucket {bk} saw {cnt} rows, "
                f"count pass saw {counts.get(bk)} — nondeterministic input?")


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None,
                   buckets_per_partition: int = 4) -> DataFrame:
    """Deterministic doc_id = 0-based rank of (repo, path), cache-free.

    Scalable zipWithIndex via :func:`_bucket_partition`; see there for the
    design. The id kernel re-verifies each bucket's row count against the
    count pass and raises on drift, so a nondeterministic upstream fails
    loudly instead of corrupting ids. (The reference's insertion-ordinal
    docID, index.cpp:160-161, is inherently sequential; rank replaces it.)
    """
    parted, offsets, counts = _bucket_partition(
        corpus, num_partitions, buckets_per_partition)
    out_schema = T.StructType(corpus.schema.fields
                              + [T.StructField("doc_id", T.LongType(), False)])
    if parted is None:
        return corpus.sparkSession.createDataFrame([], out_schema)

    def add_ids(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in pdf_iter:
            ids = _run_ids(pdf["_bucket"].to_numpy(), offsets, seen)
            pdf = pdf.drop(columns=["_bucket"]).copy()
            pdf["doc_id"] = ids
            yield pdf
        _verify_seen(seen, counts)

    return parted.mapInPandas(add_ids, schema=out_schema)


def _ids_from_parted(parted: DataFrame, offsets: dict, counts: dict,
                     cols: list[str]) -> DataFrame:
    """(doc_id, *cols) from an existing bucket partitioning — the docs
    dimension derives from the build's own (parted, offsets, counts)
    instead of re-running the count/sample passes."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [parted.schema[c] for c in cols])

    def add_ids(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict[int, int] = {}
        for pdf in pdf_iter:
            ids = _run_ids(pdf["_bucket"].to_numpy(), offsets, seen)
            out = pdf[cols].copy()
            out.insert(0, "doc_id", ids)
            yield out
        _verify_seen(seen, counts)

    return parted.select("_bucket", *cols).mapInPandas(
        add_ids, schema=out_schema)


def tokenized_docs(corpus_with_ids: DataFrame, stem: bool = True,
                   text_col: str = "content",
                   camel: bool = True) -> DataFrame:
    """(doc_id, tokens, doc_len) via the vectorized tokenize+stem UDF."""

    @F.pandas_udf(TOKENS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, stem=stem, camel=camel)

    return (
        corpus_with_ids
        .select("doc_id", _tok(F.col(text_col)).alias("tokens"))
        .withColumn("doc_len", F.size("tokens").cast("long"))
    )


def postings(tok_docs: DataFrame, positions: bool = False) -> DataFrame:
    """(term, doc_id, tf[, positions], doc_len) — map-side combinable agg.

    Kept for position-carrying builds; the fused ``doc_term_counts`` path
    below is the fast path when positions aren't needed (it counts inside
    the tokenize UDF and skips this 1-row-per-token shuffle entirely)."""
    exploded = tok_docs.select(
        "doc_id", "doc_len", F.posexplode("tokens").alias("pos", "term")
    )
    aggs = [
        F.count("*").alias("tf"),
        F.first("doc_len").alias("doc_len"),
    ]
    if positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return exploded.groupBy("term", "doc_id").agg(*aggs)


_COUNTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.LongType(), False),
    T.StructField("doc_len", T.LongType(), False),
])


def doc_term_counts(corpus_with_ids: DataFrame, stem: bool = True,
                    text_col: str = "content", camel: bool = True) -> DataFrame:
    """Fused tokenize + per-doc term counting in ONE Arrow pass.

    Emits (doc_id, term, tf, doc_len) — already aggregated per document,
    so the per-token explode + groupBy(term, doc_id) shuffle of the naive
    plan disappears; the only shuffle left in the whole build is the
    groupBy(shard) of the blob stage. Counting is vectorized for the
    whole batch: factorize terms, combine (doc, term) into one int64 key,
    count with np.unique on ints.

    Empty documents emit a single sentinel row (term='', tf=0) so
    docs/stats stay exact; the index build filters it out.
    """
    from index_spark.functions.text import term_counts_batch

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        doc_ids = pdf["doc_id"].to_numpy()
        vocab, d, t, cnt, lens = term_counts_batch(pdf[text_col].tolist(),
                                                   stem=stem, camel=camel)
        out = pd.DataFrame({
            "doc_id": doc_ids[d],
            "term": vocab[t] if vocab.size else np.empty(0, dtype=object),
            "tf": cnt,
            "doc_len": lens[d],
        })
        empty = np.flatnonzero(lens == 0)
        if empty.size:
            out = pd.concat([out, pd.DataFrame({
                "doc_id": doc_ids[empty], "term": [""] * empty.size,
                "tf": np.zeros(empty.size, dtype=np.int64),
                "doc_len": np.zeros(empty.size, dtype=np.int64)})],
                ignore_index=True)
        return out

    def fn(batches):
        for pdf in batches:
            yield _one(pdf)

    cols = [c for c in corpus_with_ids.columns if c in ("doc_id", text_col)]
    return corpus_with_ids.select(*cols).mapInPandas(fn, schema=_COUNTS_SCHEMA)


def corpus_stats(tok_docs: DataFrame) -> dict:
    row = tok_docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": row["total_tokens"]}


def _blob_rows(terms_sorted: np.ndarray, tc: np.ndarray, docs: np.ndarray,
               tfs: np.ndarray, dls: np.ndarray, shard: int) -> pd.DataFrame:
    """Shared blob kernel: (term-code-sorted posting arrays) -> index rows.

    Inputs must already be sorted by (term_code, doc_id); ``terms_sorted``
    maps term codes -> term strings. Per-term semantics: sorted doc_ids ->
    deltas (first absolute) + varbyte; skip pointers at power-of-two
    doc_id crossings (reference index.h:276-281); 128-posting block-max
    (max_tf, min_dl). The varbyte encode runs ONCE over the whole delta
    stream; per-term blobs are byte-range slices via encoded_lengths
    cumsums.
    """
    core = _blob_core(tc, docs, tfs, dls)
    term_of_group = np.asarray(terms_sorted, dtype=object)[tc[core["starts"]]]
    n_terms = core["starts"].size

    doc_bytes, doc_cum = core["doc_bytes"], core["doc_cum"]
    tf_bytes, tf_cum = core["tf_bytes"], core["tf_cum"]
    dl_bytes, dl_cum = core["dl_bytes"], core["dl_cum"]
    starts, ends = core["starts"], core["ends"]
    doc_blobs = [doc_bytes[doc_cum[s] : doc_cum[e]] for s, e in zip(starts, ends)]
    tf_blobs = [tf_bytes[tf_cum[s] : tf_cum[e]] for s, e in zip(starts, ends)]
    dl_blobs = [dl_bytes[dl_cum[s] : dl_cum[e]] for s, e in zip(starts, ends)]

    sk_local = core["sk_local"].tolist()
    sk_doc = core["sk_doc"].tolist()
    skips_col = []
    p = 0
    for c in core["sk_counts"].tolist():
        skips_col.append(list(zip(sk_local[p : p + c], sk_doc[p : p + c])))
        p += c

    b_local = core["b_local"].tolist()
    b_last_l = core["b_last"].tolist()
    b_mtf = core["b_max_tf"].tolist()
    b_mdl = [float(x) for x in core["b_min_dl"].tolist()]
    b_doff = core["b_doc_off"].tolist()
    b_toff = core["b_tf_off"].tolist()
    b_loff = core["b_dl_off"].tolist()
    blocks_col = []
    p = 0
    for c in core["nb_g"].tolist():
        blocks_col.append(list(zip(b_local[p : p + c], b_last_l[p : p + c],
                                   b_mtf[p : p + c], b_mdl[p : p + c],
                                   b_doff[p : p + c], b_toff[p : p + c],
                                   b_loff[p : p + c])))
        p += c

    return pd.DataFrame({
        "term": term_of_group,
        "shard": np.full(n_terms, shard, dtype=np.int64),
        "df": core["df_g"],
        "cf": core["cf_g"],
        "first_doc": core["first_doc"],
        "last_doc": core["last_doc"],
        "doc_blob": doc_blobs,
        "tf_blob": tf_blobs,
        "dl_blob": dl_blobs,
        "pos_blob": [b""] * n_terms,  # positions ride the fused path only
        "skips": skips_col,
        "blocks": blocks_col,
        "max_tf": core["max_tf_g"],
        "min_dl": core["min_dl_g"],
    })


def _blob_core(tc: np.ndarray, docs: np.ndarray, tfs: np.ndarray,
               dls: np.ndarray) -> dict:
    """Numpy core shared by the pandas and Arrow blob builders."""
    starts = np.concatenate(([0], np.flatnonzero(np.diff(tc)) + 1))
    ends = np.concatenate((starts[1:], [len(tc)]))

    deltas = docs.copy()
    deltas[1:] -= docs[:-1]
    deltas[starts] = docs[starts]  # first posting of each term: absolute

    # one encode per stream; per-term byte ranges from length cumsums
    def _enc_with_offsets(vals: np.ndarray):
        lens = vb.encoded_lengths(vals.astype(np.uint64))
        cum = np.concatenate(([0], np.cumsum(lens)))
        return vb.encode(vals.astype(np.uint64)), cum

    doc_bytes, doc_cum = _enc_with_offsets(deltas)
    tf_bytes, tf_cum = _enc_with_offsets(tfs)
    dl_bytes, dl_cum = _enc_with_offsets(dls)

    # per-term aggregates, vectorized via reduceat
    df_g = (ends - starts).astype(np.int64)
    cf_g = np.add.reduceat(tfs, starts)
    first_doc = docs[starts]
    last_doc = docs[ends - 1]
    max_tf_g = np.maximum.reduceat(tfs, starts)
    min_dl_g = np.minimum.reduceat(dls, starts)
    n_terms = len(starts)

    # skip pointers, vectorized: posting i is a skip target iff a power
    # of two lies in (prev_doc, doc_i] — i.e. bit_length grows (docs are
    # strictly increasing within a term). bit_length via frexp exponent,
    # exact for doc_ids < 2^53.
    bl = np.frexp(docs.astype(np.float64))[1]
    prev_bl = np.empty_like(bl)
    prev_bl[0] = 0
    prev_bl[1:] = bl[:-1]
    prev_bl[starts] = 0
    sk_pos = np.flatnonzero(bl > prev_bl)
    sk_term = np.searchsorted(starts, sk_pos, side="right") - 1
    sk_local = sk_pos - starts[sk_term]
    sk_doc = docs[sk_pos]
    sk_counts = np.bincount(sk_term, minlength=n_terms)

    # block-max metadata, vectorized: per-term 128-posting blocks are
    # contiguous across the whole shard, so one reduceat covers all terms
    nb_g = (df_g + BLOCK_SIZE - 1) // BLOCK_SIZE
    nb_cum = np.concatenate(([0], np.cumsum(nb_g)))
    total_b = int(nb_cum[-1])
    rep = np.repeat(np.arange(n_terms), nb_g)
    intra = np.arange(total_b, dtype=np.int64) - nb_cum[rep]
    b_start = starts[rep] + intra * BLOCK_SIZE
    b_end = np.minimum(b_start + BLOCK_SIZE, ends[rep])
    b_max_tf = np.maximum.reduceat(tfs, b_start) if total_b else np.empty(0, np.int64)
    b_min_dl = np.minimum.reduceat(dls, b_start) if total_b else np.empty(0, np.int64)
    b_last = docs[b_end - 1] if total_b else np.empty(0, np.int64)
    # blob-local byte offsets of each block's first varbyte (enables
    # decode of ONLY the blocks a WAND query's theta admits)
    if total_b:
        term_doc0 = doc_cum[starts[rep]]
        b_doc_off = doc_cum[b_start] - term_doc0
        b_tf_off = tf_cum[b_start] - tf_cum[starts[rep]]
        b_dl_off = dl_cum[b_start] - dl_cum[starts[rep]]
    else:
        b_doc_off = b_tf_off = b_dl_off = np.empty(0, np.int64)

    return {
        "starts": starts, "ends": ends,
        "df_g": df_g, "cf_g": cf_g.astype(np.int64),
        "first_doc": first_doc, "last_doc": last_doc,
        "max_tf_g": max_tf_g.astype(np.int64),
        "min_dl_g": min_dl_g.astype(np.float64),
        "doc_bytes": doc_bytes, "doc_cum": doc_cum,
        "tf_bytes": tf_bytes, "tf_cum": tf_cum,
        "dl_bytes": dl_bytes, "dl_cum": dl_cum,
        "sk_local": sk_local, "sk_doc": sk_doc, "sk_counts": sk_counts,
        "nb_g": nb_g, "b_local": intra * BLOCK_SIZE, "b_last": b_last,
        "b_max_tf": b_max_tf.astype(np.int64),
        "b_min_dl": b_min_dl.astype(np.float64),
        "b_doc_off": b_doc_off.astype(np.int64),
        "b_tf_off": b_tf_off.astype(np.int64),
        "b_dl_off": b_dl_off.astype(np.int64),
    }


def _build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one shard's (term, doc_id, tf, doc_len) rows
    -> blob rows (shuffle-based build path / streaming ingest)."""
    shard = int(pdf["shard"].iloc[0])
    term_codes, terms = pd.factorize(pdf["term"])
    terms = np.asarray(terms, dtype=object)
    # sorted-at-rest (see _shard_record_batch): remap codes to term order
    sort_v = np.argsort(terms)
    remap = np.empty(terms.size, dtype=np.int64)
    remap[sort_v] = np.arange(terms.size)
    term_codes = remap[term_codes.astype(np.int64)]
    terms = terms[sort_v]
    docs = pdf["doc_id"].to_numpy().astype(np.int64)
    tfs = pdf["tf"].to_numpy().astype(np.int64)
    dls = pdf["doc_len"].to_numpy().astype(np.int64)

    order = np.lexsort((docs, term_codes))
    tc = term_codes[order]
    out = _blob_rows(terms, tc, docs[order], tfs[order], dls[order], shard)
    if "positions" in pdf.columns:
        # per-posting occurrence-ordinal deltas (first absolute), sliced
        # per term group — format-identical to the fused kernel's pos_blob
        plists = pdf["positions"].to_numpy()[order]
        cnts = np.fromiter((len(p) for p in plists), np.int64,
                           count=len(plists))
        total = int(cnts.sum())
        if total:
            flat = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in plists if len(p)])
            deltas = flat.copy()
            deltas[1:] -= flat[:-1]
            first_idx = np.concatenate(([0], np.cumsum(cnts)))[:-1]
            first_idx = first_idx[cnts > 0]
            deltas[first_idx] = flat[first_idx]
            plens = vb.encoded_lengths(deltas.astype(np.uint64))
            pb = vb.encode(deltas.astype(np.uint64))
            byte_cum = np.concatenate(([0], np.cumsum(plens)))
            val_cum = np.concatenate(([0], np.cumsum(cnts)))
            pair_bytes = byte_cum[val_cum[1:]] - byte_cum[val_cum[:-1]]
            pair_off = np.concatenate(([0], np.cumsum(pair_bytes)))
            starts = np.concatenate(([0], np.flatnonzero(np.diff(tc)) + 1))
            ends = np.concatenate((starts[1:], [tc.size]))
            out["pos_blob"] = [pb[pair_off[s]: pair_off[e]]
                               for s, e in zip(starts, ends)]
    return out


def build_sharded_index(post_df: DataFrame,
                        shard_size: int = DEFAULT_SHARD_SIZE) -> DataFrame:
    """(term, doc_id, tf, doc_len) rows -> sharded blob index.

    ONE shuffle: groupBy(shard). A shard is a bounded doc_id range, so
    reducer keys stay bounded no matter how hot a term is (the explicit
    skew handling — a term like ``import`` is split across every shard).
    Inside each shard the kernel is vectorized numpy over all terms.
    No global statistics are needed at build time (block-max stores raw
    (max_tf, min_dl)), so chunked/resumable builds compose without
    cross-chunk coordination.
    """
    sharded = post_df.filter(F.col("term") != "").withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("long")
    )
    return sharded.groupBy("shard").applyInPandas(_build_shard, schema=INDEX_SCHEMA)


def doc_lengths(counts: DataFrame) -> DataFrame:
    """(doc_id, doc_len) from the fused counts (includes empty docs)."""
    return counts.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))


def stats_from_doclens(doclens: DataFrame) -> dict:
    row = doclens.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": row["total_tokens"]}


# end-of-document pseudo-term: one row per shard carrying the shard's doc
# table (doc ids + doc lengths). Mirrors the reference's "%" posting list
# (index.cpp:152-153 — the document-boundary table of the position space).
# The tokenizer only emits [a-z0-9]+ so "%" can never collide with a term.
# Convention: tf of a "%" posting := doc_len, so df == docs-in-shard and
# cf == tokens-in-shard, making corpus stats a metadata-only aggregate.
DOC_MARKER = "%"


def _pa_index_schema():
    import pyarrow as pa

    return pa.schema([
        ("term", pa.string()), ("shard", pa.int64()), ("df", pa.int64()),
        ("cf", pa.int64()), ("first_doc", pa.int64()), ("last_doc", pa.int64()),
        ("doc_blob", pa.binary()), ("tf_blob", pa.binary()),
        ("dl_blob", pa.binary()), ("pos_blob", pa.binary()),
        ("skips", pa.list_(pa.struct([("idx", pa.int64()),
                                      ("doc", pa.int64())]))),
        ("blocks", pa.list_(pa.struct([("start", pa.int64()),
                                       ("last_doc", pa.int64()),
                                       ("max_tf", pa.int64()),
                                       ("min_dl", pa.float64()),
                                       ("doc_off", pa.int64()),
                                       ("tf_off", pa.int64()),
                                       ("dl_off", pa.int64())]))),
        ("max_tf", pa.int64()), ("min_dl", pa.float64()),
    ])


def _shard_record_batch(doc_ids: np.ndarray, buf: np.ndarray,
                        bounds: np.ndarray, stem: bool, shard: int,
                        camel: bool = True, positions: bool = False,
                        style_spans: list | None = None,
                        style_shift: int = 2):
    """Arrow-native fused kernel: one shard's raw UTF-8 stream -> index
    RecordBatch, zero-copy on every hot column.

    ``style_spans`` (implies ``positions``): per-doc (start, end, style)
    token-ordinal span lists, aligned with ``doc_ids``. Each occurrence's
    position delta packs its style code into the low ``style_shift``
    bits — ``value = (gap << shift) | style`` — the reference's styled
    word post (index.h:44-60; functions/style.py). The packed stream is
    still a plain varbyte stream of per-doc-local values, so merge
    concatenation and the pos_blob grammar are unchanged; consumers
    recover gaps with ``unpack_styled`` / a shift-aware decode.

    tokenize+count straight off the Arrow string buffer
    (term_counts_stream), then the shared numpy blob core; blob columns
    are BinaryArrays whose offsets slice the single varbyte stream
    in place, and skips/blocks are ListArrays assembled from numpy
    offset/child arrays — no per-row Python objects anywhere.

    ``positions=True`` additionally emits ``pos_blob``: per posting, the
    varbyte deltas of the term's occurrence ordinals within the document
    (first absolute; tf values per posting) — the per-doc re-expression
    of the reference's position postings (index.h:215-224; per-doc rather
    than chunk-global positions so shards stay independently mergeable,
    SURVEY.md §7). Phrase/proximity queries decode it shard-locally.
    """
    import pyarrow as pa

    from index_spark.functions.text import term_counts_stream

    n = len(doc_ids)
    if style_spans is not None:
        positions = True
        if len(style_spans) != n:
            raise ValueError("style_spans must align with doc_ids")
    if positions:
        vocab, d, t, cnt, lens, pos = term_counts_stream(
            buf, bounds, stem=stem, camel=camel, positions=True)
    else:
        vocab, d, t, cnt, lens = term_counts_stream(
            buf, bounds, stem=stem, camel=camel)
        pos = None
    n_real = cnt.size
    terms_all = np.concatenate([vocab, np.array([DOC_MARKER], dtype=object)])
    t = np.concatenate([t, np.full(n, vocab.size, np.int64)])
    d = np.concatenate([d, np.arange(n, dtype=np.int64)])
    pos_cnt = np.concatenate([cnt, np.zeros(n, np.int64)])  # '%' has no pos
    cnt = np.concatenate([cnt, lens])  # '%': tf := doc_len
    # emit rows sorted by TERM STRING (not first-appearance code): the
    # sorted-at-rest analog of the reference's dict.Optimize
    # (index.cpp:51-52) — parquet row groups get tight term min/max
    # stats, so term-pruned scans skip whole row groups
    sort_v = np.argsort(terms_all)
    remap = np.empty(terms_all.size, dtype=np.int64)
    remap[sort_v] = np.arange(terms_all.size)
    t = remap[t]
    terms_all = terms_all[sort_v]
    order = np.lexsort((d, t))
    tc = t[order]
    core = _blob_core(tc, doc_ids[d[order]], cnt[order], lens[d[order]])
    starts, ends = core["starts"], core["ends"]
    n_terms = starts.size
    term_of_group = terms_all[tc[starts]]

    if pos is not None:
        # delta-encode the flat position stream per posting (first value
        # absolute), ONE varbyte encode for the whole shard, then a
        # vectorized ragged gather to permute per-posting byte ranges
        # into the term-sorted posting order
        seg = np.concatenate(([0], np.cumsum(pos_cnt[:n_real])))
        deltas = pos.copy()
        deltas[1:] -= pos[:-1]
        deltas[seg[:-1]] = pos[seg[:-1]]
        vals = deltas.astype(np.uint64)
        if style_spans is not None and pos.size:
            from index_spark.functions.style import styles_from_spans

            # per-doc style arrays from token-ordinal spans, then one
            # flat gather at each occurrence's absolute ordinal
            style_flat = np.concatenate(
                [styles_from_spans(int(dl), sp or (), shift=style_shift)
                 for dl, sp in zip(lens, style_spans)]) \
                if n else np.empty(0, np.int64)
            doc_off = np.zeros(n, dtype=np.int64)
            if n > 1:
                doc_off[1:] = np.cumsum(lens)[:-1]
            occ_doc = np.repeat(d[:n_real], pos_cnt[:n_real])
            occ_style = style_flat[doc_off[occ_doc] + pos]
            vals = (vals << np.uint64(style_shift)) \
                | occ_style.astype(np.uint64)
        plens = vb.encoded_lengths(vals)
        pair_bytes = np.zeros(pos_cnt.size, dtype=np.int64)
        if n_real:
            pair_bytes[:n_real] = np.add.reduceat(plens, seg[:-1]) \
                if plens.size else 0
        pb = np.frombuffer(vb.encode(vals), np.uint8)
        pair_off = np.concatenate(([0], np.cumsum(pair_bytes)))
        sel_len = pair_bytes[order]
        src = pair_off[:-1][order]
        tgt_off = np.concatenate(([0], np.cumsum(sel_len)))
        out_idx = np.repeat(src - tgt_off[:-1], sel_len) \
            + np.arange(int(tgt_off[-1]), dtype=np.int64)
        pos_stream = pb[out_idx]
        pos_cum = tgt_off
    else:
        pos_stream = np.empty(0, np.uint8)
        pos_cum = np.zeros(tc.size + 1, dtype=np.int64)

    def bin_arr(data: bytes, cum: np.ndarray):
        if int(cum[ends[-1]]) > np.iinfo(np.int32).max:
            # int32 Arrow binary offsets would silently wrap -> corrupt
            # blobs; a shard's concatenated varbyte stream past 2 GiB
            # means shard_size is far too large for the corpus density
            raise ValueError(
                "shard blob stream exceeds int32 offsets "
                f"({int(cum[ends[-1]])} bytes); lower shard_size")
        offs = np.empty(n_terms + 1, dtype=np.int32)
        offs[:-1] = cum[starts]
        offs[-1] = cum[ends[-1]]
        return pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)])

    def list_arr(counts: np.ndarray, fields: list, names: list):
        offs = np.zeros(counts.size + 1, dtype=np.int32)
        np.cumsum(counts, out=offs[1:])
        child = pa.StructArray.from_arrays(
            [pa.array(f) for f in fields], names)
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), child)

    arrays = [
        pa.array(term_of_group, pa.string()),
        pa.array(np.full(n_terms, shard, dtype=np.int64)),
        pa.array(core["df_g"]),
        pa.array(core["cf_g"]),
        pa.array(core["first_doc"]),
        pa.array(core["last_doc"]),
        bin_arr(core["doc_bytes"], core["doc_cum"]),
        bin_arr(core["tf_bytes"], core["tf_cum"]),
        bin_arr(core["dl_bytes"], core["dl_cum"]),
        bin_arr(pos_stream, pos_cum),
        list_arr(core["sk_counts"], [core["sk_local"], core["sk_doc"]],
                 ["idx", "doc"]),
        list_arr(core["nb_g"],
                 [core["b_local"], core["b_last"], core["b_max_tf"],
                  core["b_min_dl"], core["b_doc_off"], core["b_tf_off"],
                  core["b_dl_off"]],
                 ["start", "last_doc", "max_tf", "min_dl",
                  "doc_off", "tf_off", "dl_off"]),
        pa.array(core["max_tf_g"]),
        pa.array(core["min_dl_g"]),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=_pa_index_schema())


def build_partition_index(with_ids: DataFrame, stem: bool = True,
                          shard_size: int = DEFAULT_SHARD_SIZE,
                          text_col: str = "content", camel: bool = True,
                          positions: bool = False) -> DataFrame:
    """Zero-shuffle build: contiguous-doc_id partitions -> blob rows.

    Requires the ``assign_doc_ids`` invariant: within every partition,
    doc_ids ascend contiguously (partitions are disjoint doc ranges).
    Shard = ``doc_id // shard_size`` cuts each partition into bounded doc
    ranges processed one at a time (streaming within the partition, so
    worker memory is O(shard), not O(partition)); a shard that spans a
    partition boundary yields one row per side — disjoint sub-ranges that
    every consumer (query groupBy(shard), merge concat) handles.

    This is the scale path: after the range exchange that assigns doc
    ids, tokenize -> count -> compress never crosses the JVM boundary or
    the network again, and document text never becomes Python strings —
    the kernel runs directly on the Arrow string buffers (mapInArrow)
    and emits blob columns zero-copy.
    """
    def fn(batches):
        pairs = ((rb.column(0).to_numpy(), rb.column(1)) for rb in batches)
        yield from _fused_shard_stream(pairs, stem, shard_size,
                                       camel=camel, positions=positions)

    return with_ids.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    ).mapInArrow(fn, schema=INDEX_SCHEMA)


def _fused_shard_stream(pairs, stem: bool, shard_size: int,
                        camel: bool = True, positions: bool = False,
                        styled: bool = False, style_shift: int = 2):
    """Shared shard-cutting generator: (doc_ids ndarray, Arrow string
    column[, per-doc span list]) pairs -> index RecordBatches,
    one-or-more per shard. ``styled`` expects each pair to carry the
    third element (token-ordinal style spans per doc) and packs the
    style channel into pos_blob."""
    cur: int | None = None
    last_id: int | None = None
    ids_buf: list[np.ndarray] = []
    byte_buf: list[np.ndarray] = []
    bounds_buf: list[np.ndarray] = []
    spans_buf: list[list] = []

    def flush(shard):
        ids = np.concatenate(ids_buf)
        data = np.concatenate(byte_buf) if byte_buf else np.empty(0, np.uint8)
        total = 0
        parts = [np.zeros(1, dtype=np.int64)]
        for b in bounds_buf:
            parts.append(b[1:] + total)
            total += int(b[-1])
        bounds = np.concatenate(parts)
        spans = ([sp for chunk in spans_buf for sp in chunk]
                 if styled else None)
        return _shard_record_batch(ids, data, bounds, stem, shard,
                                   camel=camel, positions=positions,
                                   style_spans=spans,
                                   style_shift=style_shift)

    import pyarrow as pa

    for pair in pairs:
        if styled:
            ids, col, spans = pair
        else:
            (ids, col), spans = pair, None
        nrows = len(col)
        # offset width is dictated by the Arrow type — int32 for
        # string/binary, int64 for large_string/large_binary (Spark ships
        # large_ when spark.sql.execution.arrow.useLargeVarTypes=true);
        # reading with the wrong width silently misparses, so branch on
        # the type and reject anything else loudly
        if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
            odt = np.int64
        elif pa.types.is_string(col.type) or pa.types.is_binary(col.type):
            odt = np.int32
        else:
            raise TypeError(f"fused build needs a string column, got {col.type}")
        if col.null_count:
            # callers coalesce nulls JVM-side; the Arrow spec does not
            # guarantee meaningful offsets in null slots, so never index
            # from them
            raise ValueError("fused build received NULL content rows; "
                             "coalesce(content, '') before mapInArrow")
        off0 = col.offset
        obuf = col.buffers()[1]
        dbuf = col.buffers()[2]
        offs = np.frombuffer(obuf, odt)[off0: off0 + nrows + 1] \
                 .astype(np.int64)
        data = (np.frombuffer(dbuf, np.uint8) if dbuf is not None
                else np.empty(0, np.uint8))
        shards = ids // shard_size
        # cut on shard change OR doc_id discontinuity: a partition holds
        # whole key-range buckets, so its doc ids come in ascending
        # contiguous runs with gaps owned by OTHER partitions — two runs
        # of the same shard id must not be glued (their blobs would
        # interleave with the other partitions' rows at merge time)
        cuts = np.concatenate(
            ([0],
             np.flatnonzero((np.diff(shards) != 0)
                            | (np.diff(ids) != 1)) + 1,
             [nrows]))
        for lo, hi in zip(cuts[:-1], cuts[1:]):
            if lo == hi:
                continue
            s = int(shards[lo])
            if cur is not None and (s != cur or int(ids[lo]) != last_id + 1):
                yield flush(cur)
                ids_buf, byte_buf, bounds_buf = [], [], []
                spans_buf = []
            cur = s
            last_id = int(ids[hi - 1])
            ids_buf.append(ids[lo:hi])
            byte_buf.append(data[offs[lo]: offs[hi]])
            bounds_buf.append(offs[lo: hi + 1] - offs[lo])
            if styled:
                spans_buf.append(spans[lo:hi])
    if ids_buf:
        yield flush(cur)


def _build_bucketed(parted: DataFrame, offsets: dict, counts: dict,
                    stem: bool, shard_size: int,
                    text_col: str = "content", camel: bool = True,
                    positions: bool = False,
                    style_col: str | None = None,
                    style_shift: int = 2) -> DataFrame:
    """Fully fused build over a bucket-partitioned corpus: doc_id
    assignment happens INSIDE the Arrow kernel (from the int32 bucket
    column + offsets), so document content crosses the JVM->Python
    boundary exactly once in the whole build. Verifies per-bucket row
    counts against the count pass (raises on nondeterministic input).

    ``style_col``: optional per-doc style-span column
    (array<struct<start,end,style>>, token ordinals) — packs the style
    channel into pos_blob (implies positions)."""
    styled = style_col is not None

    def fn(batches):
        seen: dict[int, int] = {}

        def pairs():
            for rb in batches:
                ids = _run_ids(rb.column(0).to_numpy(), offsets, seen)
                if styled:
                    spans = [
                        [(s["start"], s["end"], s["style"])
                         for s in (row or [])]
                        for row in rb.column(2).to_pylist()]
                    yield ids, rb.column(1), spans
                else:
                    yield ids, rb.column(1)

        yield from _fused_shard_stream(pairs(), stem, shard_size,
                                       camel=camel,
                                       positions=positions or styled,
                                       styled=styled,
                                       style_shift=style_shift)
        _verify_seen(seen, counts)

    cols = ["_bucket",
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col)]
    if styled:
        cols.append(F.col(style_col))
    return parted.select(*cols).mapInArrow(fn, schema=INDEX_SCHEMA)


def _pin_index_zone(index: DataFrame, zone: str | None) -> DataFrame:
    """Filter a zoned index to one validated zone (default ``body``).

    Raises when the pinned zone is absent instead of silently yielding
    n_docs=0 / empty doclens (which would propagate a zeroed avgdl into
    BM25). Validation is a pushed-filter limit-1 probe — cheap at any
    scale; the distinct-zone listing runs only on the error path."""
    if "zone" not in index.columns:
        return index
    z = zone or "body"
    pinned = index.filter(F.col("zone") == z)
    if pinned.isEmpty() and not index.isEmpty():
        zones = sorted(r["zone"] for r in index.select("zone")
                       .distinct().collect())
        raise ValueError(
            f"zone {z!r} not present in this zoned index (zones: {zones}); "
            "pass zone=...")
    return pinned


def stats_from_index(index: DataFrame, zone: str | None = None) -> dict:
    """Corpus stats from the '%' doc-table rows (metadata-only agg).

    Zoned indexes carry '%' rows per zone; pin one (default ``body``,
    validated) — summing across zones would overcount n_docs."""
    index = _pin_index_zone(index, zone)
    row = index.filter(F.col("term") == DOC_MARKER).agg(
        F.sum("df").alias("n"), F.sum("cf").alias("tot")).collect()[0]
    n = int(row["n"] or 0)
    tot = int(row["tot"] or 0)
    return {"n_docs": n, "avgdl": (tot / n) if n else 0.0, "total_tokens": tot}


_DOCLEN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("doc_len", T.LongType(), False),
])


def doclens_from_index(index: DataFrame, zone: str | None = None) -> DataFrame:
    """(doc_id, doc_len) decoded from the '%' doc-table blobs.

    A zoned index carries one '%' row set PER ZONE (each zone has its
    own doc lengths); pin one zone (default ``body``, validated) so
    lengths never mix across zones."""
    index = _pin_index_zone(index, zone)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
                dls = vb.decode(row.tf_blob).astype(np.int64)
                yield pd.DataFrame({"doc_id": docs, "doc_len": dls})

    return (index.filter(F.col("term") == DOC_MARKER)
            .select("doc_blob", "tf_blob")
            .mapInPandas(fn, schema=_DOCLEN_SCHEMA))


def build_index(corpus: DataFrame, stem: bool = True,
                shard_size: int = DEFAULT_SHARD_SIZE, fused: bool = True,
                camel: bool = True, positions: bool = False):
    """Full build: corpus -> (docs_df, index_df, stats).

    Fused plan (default; the scale path):
      scan -> range exchange (doc_id assignment — the build's ONLY wide
      shuffle) -> one mapInPandas doing tokenize+stem+count+compress per
      shard -> blob rows (+ '%' doc-table rows)

    ``fused=False`` keeps the two-stage plan (tokenize+count UDF ->
    groupBy(shard) -> blob kernel) used by streaming/checkpoint callers
    that need the intermediate (term, doc_id, tf) relation.

    docs_df is the docID -> (repo, path, doc_len) dimension (the
    reference's ``vector<string> documents``, index.h:294).
    """
    if fused:
        parted, offsets, counts = _bucket_partition(corpus)
        if parted is None:
            spark = corpus.sparkSession
            empty_idx = spark.createDataFrame([], INDEX_SCHEMA)
            docs_schema = T.StructType([
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("repo", T.StringType(), True),
                T.StructField("path", T.StringType(), True),
                T.StructField("doc_len", T.LongType(), True)])
            return (spark.createDataFrame([], docs_schema), empty_idx,
                    {"n_docs": 0, "avgdl": 0.0, "total_tokens": 0})
        index = _build_bucketed(parted, offsets, counts, stem, shard_size,
                                camel=camel, positions=positions)
        index = index.persist()
        stats = stats_from_index(index)
        # docs dimension reuses the SAME bucketing (parted/offsets/counts)
        # — no second count()/sample-collect pass; the key-only projection
        # is column-pruned so content never moves for it
        keys_with_ids = _ids_from_parted(parted, offsets, counts,
                                         ["repo", "path"])
        docs = keys_with_ids.join(doclens_from_index(index), "doc_id", "left")
        index._build_caches = [index]
        return docs, index, stats
    if positions:
        raise ValueError("positions requires the fused build path")
    with_ids = assign_doc_ids(corpus)
    counts = doc_term_counts(with_ids, stem=stem, camel=camel).persist()
    doclens = doc_lengths(counts)
    stats = stats_from_doclens(doclens)
    index = build_sharded_index(counts, shard_size=shard_size)
    docs = with_ids.select("doc_id", "repo", "path").join(doclens, "doc_id")
    index._build_caches = [counts]
    return docs, index, stats


def doc_lookup(docs: DataFrame, repo: str | None = None,
               path: str | None = None,
               doc_id: int | None = None) -> DataFrame:
    """Point lookups on the docs dimension — the reference's
    ``IndexReadHandler::FindUrl`` / ``getDocument`` analogs
    (/root/reference/index.h:408-409, index.cpp:16-19).

    The docs dimension is keyed by (repo, path) AND by doc_id, so both
    directions are predicate-pushdown point gets on the parquet scan —
    the columnar replacement for the blob's URL-key hash probe
    (``'##'+url``, index.cpp:156-158) and the docID->URL array lookup.
    """
    out = docs
    if repo is not None:
        out = out.filter(F.col("repo") == repo)
    if path is not None:
        out = out.filter(F.col("path") == path)
    if doc_id is not None:
        out = out.filter(F.col("doc_id") == doc_id)
    return out


def build_zoned_index(corpus: DataFrame, zones: list[tuple[str, str]],
                      stem: bool = True, camel: bool = True,
                      shard_size: int = DEFAULT_SHARD_SIZE,
                      positions: bool = False,
                      style_spans: dict[str, str] | None = None,
                      style_shift: int = 2):
    """Multi-zone build: one index with a ``zone`` column.

    ``style_spans``: {zone_name: span_column} — zones listed here emit
    STYLED positional postings: each occurrence's pos_blob value packs
    the reference's style channel (``(gap << style_shift) | style``,
    index.h:44-60) from the doc's (start, end, style) token-ordinal
    spans (the shape an upstream markup parser hands the indexer;
    functions/style.py:styles_from_spans). Implies positions for those
    zones. Phrase/proximity consumers pass the same ``style_shift`` to
    recover gaps; :func:`~index_spark.operators.analytics.
    style_histogram` aggregates the channel.

    The reference multiplexes zones into the term key space with marker
    prefixes (title '@', head '<', anchor '$', self-URL '##' —
    /root/reference/index.h:320-326, index.cpp:119-158). Spark-first, the
    zone is a first-class COLUMN: parquet scans prune on (zone, term) via
    min/max stats exactly like the key-prefix trick pruned the hash
    space, and per-zone statistics (df, avgdl) fall out of ordinary
    filters instead of string surgery.

    ``zones``: [(zone_name, text_col), ...]. One bucketing pass; one
    fused Arrow kernel per zone (each column-pruned to its own text
    column); doc_ids shared across zones. Returns (docs_df, index_df,
    stats) where stats = {zone: {n_docs, avgdl, total_tokens}}.
    """
    from functools import reduce

    parted, offsets, counts = _bucket_partition(corpus)
    spark = corpus.sparkSession
    if parted is None:
        docs_schema = T.StructType([
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("repo", T.StringType(), True),
            T.StructField("path", T.StringType(), True)])
        empty_schema = T.StructType(
            INDEX_SCHEMA.fields + [T.StructField("zone", T.StringType(), False)])
        return (spark.createDataFrame([], docs_schema),
                spark.createDataFrame([], empty_schema),
                {z: {"n_docs": 0, "avgdl": 0.0, "total_tokens": 0}
                 for z, _ in zones})
    parts = []
    style_spans = style_spans or {}
    unknown = set(style_spans) - {z for z, _ in zones}
    if unknown:
        raise ValueError(f"style_spans names unknown zones: {sorted(unknown)}")
    for zone_name, col in zones:
        zi = _build_bucketed(parted, offsets, counts, stem, shard_size,
                             text_col=col, camel=camel, positions=positions,
                             style_col=style_spans.get(zone_name),
                             style_shift=style_shift)
        parts.append(zi.withColumn("zone", F.lit(zone_name)))
    index = reduce(lambda a, b: a.unionByName(b), parts).persist()
    stats = {}
    for r in (index.filter(F.col("term") == DOC_MARKER)
              .groupBy("zone").agg(F.sum("df").alias("n"),
                                   F.sum("cf").alias("tot")).collect()):
        n, tot = int(r["n"] or 0), int(r["tot"] or 0)
        stats[r["zone"]] = {"n_docs": n, "avgdl": (tot / n) if n else 0.0,
                            "total_tokens": tot}
    docs = _ids_from_parted(parted, offsets, counts, ["repo", "path"])
    index._build_caches = [index]
    return docs, index, stats


def release_build(index: DataFrame) -> None:
    """Unpersist the caches a build_index call pinned (the built index
    blobs for the fused path; the counts relation for ``fused=False``).
    Call when done with a built index — long-lived sessions running
    repeated builds would otherwise accumulate a cache per build."""
    for df in getattr(index, "_build_caches", []):
        try:
            df.unpersist()
        except Exception:
            pass


def build_cjk_index(corpus: DataFrame, stem: bool = True,
                    camel: bool = True,
                    shard_size: int = DEFAULT_SHARD_SIZE):
    """Mixed-analyzer build: the latin token stream UNION the CJK
    bigram stream (:func:`~index_spark.functions.text.cjk_bigrams_expr`
    — Lucene CJKAnalyzer composition) -> the same sharded blob index
    as :func:`build_index`, so every query kernel works unchanged;
    queries tokenize with :func:`~index_spark.functions.text.
    cjk_query_terms` (``search(qterms=...)`` / :func:`~index_spark.
    operators.query.search_cjk`).

    Per-doc length = latin tokens + CJK bigram occurrences (each
    bigram is one token position, the analyzer-composition length), so
    BM25's length normalization sees the full stream.  Plan shape is
    the two-stage build: the CJK stream is one extra map-side
    projection + the shared groupBy(shard) — no new wide shuffle
    beyond the standard non-fused plan's.
    """
    from index_spark.functions.text import cjk_term_counts

    with_ids = assign_doc_ids(corpus)
    latin = doc_term_counts(with_ids, stem=stem, camel=camel)
    cjk = cjk_term_counts(with_ids, text_col="content",
                          id_col="doc_id")
    cjk_len = cjk.groupBy("doc_id").agg(F.sum("tf").alias("_cl"))
    lat_len = latin.groupBy("doc_id").agg(F.first("doc_len").alias("_ll"))
    dl = (lat_len.join(cjk_len, "doc_id", "left")
          .select("doc_id",
                  (F.col("_ll") + F.coalesce("_cl", F.lit(0)))
                  .alias("doc_len")))
    counts = (latin.drop("doc_len")
              .unionByName(cjk)
              .join(dl, "doc_id")
              .persist())
    doclens = doc_lengths(counts)
    stats = stats_from_doclens(doclens)
    index = build_sharded_index(counts, shard_size=shard_size)
    docs = with_ids.select("doc_id", "repo", "path").join(doclens, "doc_id")
    index._build_caches = [counts]
    return docs, index, stats
