"""Near-duplicate detection — MinHash/LSH (reference semantics) + variants.

Re-expresses the reference ShingleMap (/root/reference/shingles/shingle.h,
shingle.cpp) as a batch Spark pipeline, plus the other dedup modes a
training-data pipeline needs (exact, SimHash, n-gram Jaccard; the
embedding-cosine variant lives in operators/similarity.py).

Pinned MinHash spec (constants identical to shingle.h:27-70):

- shingle = FNV-ish hash of each 8-word window (whole doc if shorter),
  ``h = offset; for byte: h = (h * prime) ^ byte`` over the concatenated
  words (no separators), mod 2^64 — shingle.cpp:6-21.
- signature[j] = min over shingles of ``(a[j]*x + b[j]) mod 255`` as
  *unsigned* uint8 (the reference's signed-char compare is order-dependent
  UB for values >= 128 — SURVEY.md §2.1 pins unsigned min; empty docs get
  the 0xFF init vector, shingle.cpp:62-63).
- LSH: 8 bands x 8 bytes; candidates collide on (band_id, fnv(band
  bytes)); near-dup iff >= ceil(0.90*64)=57 of 64 signature bytes equal —
  shingle.h:16-24, shingle.cpp:110-154.

Distributed shape: signatures via one pandas UDF pass; banding =
``posexplode`` into 8 rows/doc; candidate pairs = shuffle equi-join on
(band, band_hash) — Catalyst plans the join, AQE splits skewed buckets;
the >=57/64 agreement check is a vectorized numpy kernel over the joined
signature pairs. Keep-first = min(doc_id) per duplicate cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHINGLE_SIZE = 8
SIGNATURE_SIZE = 64
NUM_BANDS = 8
BAND_SIZE = 8
SIMILARITY_THRESHOLD = 0.90
NUM_SIMILARITY = int(SIMILARITY_THRESHOLD * SIGNATURE_SIZE)  # 57

FNV_PRIME = np.uint64(1099511628211)
FNV_OFFSET = np.uint64(146959810393466560)
P = np.uint64(255)

# affine hash constants a[j], b[j] — shingle.h:33-70 (period-16 tables)
_A16 = [0x12345678, 0x23456789, 0x3456789A, 0x456789AB,
        0x56789ABC, 0x6789ABCD, 0x789ABCDE, 0x89ABCDEF,
        0x9ABCDEF0, 0xABCDEF01, 0xBCDEF012, 0xCDEF0123,
        0xDEF01234, 0xEF012345, 0xF0123456, 0x01234567]
_B16 = [0x87654321, 0x98765432, 0xA9876543, 0xBA987654,
        0xCBA98765, 0xDCBA9876, 0xEDCBA987, 0xFEDCBA98,
        0x0FEDCBA9, 0x10FEDCBA, 0x210FEDCB, 0x3210FEDC,
        0x43210FED, 0x543210FE, 0x6543210F, 0x76543210]
A = np.array(_A16 * 4, dtype=np.uint64)
B_C = np.array(_B16 * 4, dtype=np.uint64)


def _fnv_bytes(data: bytes) -> int:
    """FNV-ish hash (multiply-then-xor like the reference, shingle.cpp:6-21),
    mod-2^64 wraparound via python int masking."""
    h = int(FNV_OFFSET)
    prime = int(FNV_PRIME)
    for byte in data:
        h = ((h * prime) & 0xFFFFFFFFFFFFFFFF) ^ byte
    return h


def shingle_hashes(words: list[str]) -> np.ndarray:
    """FNV hash of each 8-word window (whole doc if < 8 words)."""
    if not words:
        return np.zeros(0, dtype=np.uint64)
    if len(words) < SHINGLE_SIZE:
        return np.array([_fnv_bytes("".join(words).encode())], dtype=np.uint64)
    # FNV is not rolling-updatable (multiply+xor), so hash per window, but
    # vectorized ACROSS windows: pad window byte strings into a matrix and
    # run the multiply-xor recurrence down the byte axis for all windows
    # at once (the numpy stand-in for the reference's disabled AVX2 path,
    # shingle.cpp:66-99)
    joined = [w.encode() for w in words]
    n = len(words) - SHINGLE_SIZE + 1
    win = [b"".join(joined[i : i + SHINGLE_SIZE]) for i in range(n)]
    lens = np.fromiter((len(w) for w in win), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, wbytes in enumerate(win):
        mat[i, : lens[i]] = np.frombuffer(wbytes, dtype=np.uint8)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] * FNV_PRIME) ^ mat[active, j].astype(np.uint64)
    finally:
        np.seterr(**old)
    return h


def minhash_signature(words: list[str]) -> bytes:
    """64-byte signature: min over shingles of (a*x+b) mod 255, uint8."""
    sh = shingle_hashes(words)
    if sh.size == 0:
        return bytes([0xFF] * SIGNATURE_SIZE)
    old = np.seterr(over="ignore")
    try:
        hashes = (A[:, None] * sh[None, :] + B_C[:, None]) % P
    finally:
        np.seterr(**old)
    return hashes.min(axis=1).astype(np.uint8).tobytes()


def minhash_signatures_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whole-batch MinHash: (n, 64) uint8 signatures + (n, 8) int64 band
    hashes, byte-identical to :func:`minhash_signature` per document.

    One window byte-matrix and ONE FNV recurrence for the entire Arrow
    batch (never per document): all docs' window byte ranges live in one
    buffer, the multiply-xor recurrence runs down the shared byte axis,
    and per-doc signature minima come from ``np.minimum.reduceat`` over
    doc window segments. Band hashes run the same batched recurrence over
    the 8 signature bytes per band.
    """
    n = len(texts)
    sigs = np.full((n, SIGNATURE_SIZE), 0xFF, dtype=np.uint8)
    if n == 0:
        return sigs, np.empty((0, NUM_BANDS), dtype=np.int64)

    # flatten all words; per-doc word counts
    words_per_doc = [(t or "").split() for t in texts]
    wcounts = np.fromiter((len(w) for w in words_per_doc), np.int64, count=n)
    buf_parts: list[bytes] = []
    wlens: list[int] = []
    for words in words_per_doc:
        for w in words:
            wb = w.encode()
            buf_parts.append(wb)
            wlens.append(len(wb))
    total_words = len(wlens)
    # per-doc window (start_byte, end_byte) ranges over the joined buffer
    word_off = np.zeros(total_words + 1, dtype=np.int64)
    np.cumsum(np.asarray(wlens, dtype=np.int64), out=word_off[1:])
    doc_w0 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wcounts, out=doc_w0[1:])
    # window count per doc: W-7 full windows, or 1 whole-doc window (W<8)
    nwin = np.where(wcounts >= SHINGLE_SIZE, wcounts - SHINGLE_SIZE + 1,
                    np.minimum(wcounts, 1))
    win_doc = np.repeat(np.arange(n), nwin)
    win_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nwin, out=win_cum[1:])
    intra = np.arange(int(win_cum[-1]), dtype=np.int64) - win_cum[win_doc]
    w_first = doc_w0[win_doc] + intra
    w_last = np.where(wcounts[win_doc] >= SHINGLE_SIZE,
                      w_first + SHINGLE_SIZE, doc_w0[win_doc + 1])
    starts = word_off[w_first]
    lens = word_off[w_last] - starts
    n_win = starts.size
    if n_win == 0:
        return sigs, _band_hashes(sigs)[1]

    buf = np.frombuffer(b"".join(buf_parts), dtype=np.uint8)
    maxlen = int(lens.max())
    buf_pad = np.concatenate([buf, np.zeros(maxlen, dtype=np.uint8)])
    # batched FNV multiply-xor recurrence down the byte axis
    h = np.full(n_win, FNV_OFFSET, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] * FNV_PRIME) \
                ^ buf_pad[starts[active] + j].astype(np.uint64)
        # 64 affine minhashes; per-function pass keeps memory at O(n_win)
        has_win = nwin > 0
        seg = win_cum[:-1][has_win]
        for j in range(SIGNATURE_SIZE):
            v = (A[j] * h + B_C[j]) % P
            sigs[has_win, j] = np.minimum.reduceat(v, seg).astype(np.uint8)
    finally:
        np.seterr(**old)
    _, bands = _band_hashes(sigs)
    return sigs, bands


def _band_hashes(sigs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 64) signatures -> (n, 8) FNV band hashes (shingle.cpp:23-33),
    shifted into signed int64 exactly like ``int(h) - 2**63``."""
    n = sigs.shape[0]
    bands = np.empty((n, NUM_BANDS), dtype=np.int64)
    old = np.seterr(over="ignore")
    try:
        for b in range(NUM_BANDS):
            h = np.full(n, FNV_OFFSET, dtype=np.uint64)
            for j in range(BAND_SIZE):
                h = (h * FNV_PRIME) ^ sigs[:, b * BAND_SIZE + j].astype(np.uint64)
            bands[:, b] = (h ^ np.uint64(1 << 63)).view(np.int64)
    finally:
        np.seterr(**old)
    return sigs, bands


def signatures_df(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, sig binary, band_0..7 hash) via one batch-vectorized UDF pass."""
    out_schema = T.StructType([
        T.StructField("sig", T.BinaryType(), False),
        T.StructField("bands", T.ArrayType(T.LongType()), False),
    ])

    @F.pandas_udf(out_schema)
    def _sig(texts: pd.Series) -> pd.DataFrame:
        sigs, bands = minhash_signatures_batch(texts.tolist())
        return pd.DataFrame({
            "sig": [sigs[i].tobytes() for i in range(sigs.shape[0])],
            "bands": bands.tolist(),
        })

    return df.select(F.col(id_col).alias("doc_id"),
                     _sig(F.col(text_col)).alias("s")) \
             .select("doc_id", F.col("s.sig").alias("sig"),
                     F.col("s.bands").alias("bands"))


_PAIR_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType(), False),
    T.StructField("doc_b", T.LongType(), False),
    T.StructField("n_equal", T.IntegerType(), False),
])


def minhash_candidate_pairs(sigs: DataFrame,
                            max_bucket: int = 64) -> DataFrame:
    """LSH band join -> distinct candidate pairs with byte-agreement count.

    **Bucket-size guard** (the scale bound): a band bucket of m docs
    normally contributes O(m²) candidate pairs — one pathological bucket
    (m mutually-identical documents, or a degenerate band value) would
    blow up the join quadratically at corpus scale. Buckets larger than
    ``max_bucket`` therefore switch to *star pairing*: every member pairs
    with the bucket's min doc_id only — O(m) pairs. For keep-first dedup
    this preserves the outcome whenever the oversized bucket is a cluster
    of mutual near-dups (each loser still links to the keeper); the full
    pair *listing* inside such buckets is intentionally not enumerated.

    Bucket stats come from a map-side-combinable groupBy joined back on
    the band keys — NOT a window over (band_id, band_hash): a window
    would funnel a pathological bucket's every row into one task, while
    the aggregate combines map-side and the join-back is AQE
    skew-splittable.
    """
    bands = sigs.select(
        "doc_id", "sig", F.posexplode("bands").alias("band_id", "band_hash")
    )
    stats = (bands.groupBy("band_id", "band_hash")
             .agg(F.count("*").alias("bsz"),
                  F.min(F.struct("doc_id", "sig")).alias("_m"))
             .select("band_id", "band_hash", "bsz",
                     F.col("_m.doc_id").alias("bmin"),
                     F.col("_m.sig").alias("bsig")))
    bands = bands.join(stats, ["band_id", "band_hash"])
    small = bands.where(F.col("bsz") <= max_bucket)
    left = small.alias("l")
    right = small.alias("r")
    cand_small = (
        left.join(right, on=["band_id", "band_hash"], how="inner")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("l.sig").alias("sig_a"),
                F.col("r.doc_id").alias("doc_b"), F.col("r.sig").alias("sig_b"))
    )
    cand_large = (
        bands.where((F.col("bsz") > max_bucket)
                    & (F.col("doc_id") != F.col("bmin")))
        .select(F.col("bmin").alias("doc_a"), F.col("bsig").alias("sig_a"),
                F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    )
    cand = cand_small.unionByName(cand_large) \
                     .dropDuplicates(["doc_a", "doc_b"])

    def agree(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"doc_a": [], "doc_b": [], "n_equal": []})
                continue
            sa = np.frombuffer(b"".join(pdf["sig_a"]), dtype=np.uint8).reshape(-1, SIGNATURE_SIZE)
            sb = np.frombuffer(b"".join(pdf["sig_b"]), dtype=np.uint8).reshape(-1, SIGNATURE_SIZE)
            n_eq = (sa == sb).sum(axis=1).astype(np.int32)
            yield pd.DataFrame({"doc_a": pdf["doc_a"].to_numpy(),
                                "doc_b": pdf["doc_b"].to_numpy(),
                                "n_equal": n_eq})

    return cand.mapInPandas(agree, schema=_PAIR_SCHEMA)


def minhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_a, doc_b, n_equal) for pairs with >= 57/64 equal sig bytes."""
    sigs = signatures_df(df, text_col, id_col)
    pairs = minhash_candidate_pairs(sigs)
    return pairs.where(F.col("n_equal") >= NUM_SIMILARITY)


def dedup_keep_first(df: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Drop every doc that near-duplicates a lower-id doc (the batch analog
    of the reference's online admit/reject, shingle.cpp:156-166)."""
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------- variants

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: (text_md5, n_dups, keep_doc_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def simhash_batch(texts) -> np.ndarray:
    """Whole-batch 64-bit SimHash (Charikar 2002), value-identical to the
    per-document definition: per token a 64-bit hash votes +1/-1 per bit
    weighted by tf; sign of the vote sum -> fingerprint bit.

    Pinned token hash: the same FNV-ish multiply-then-xor recurrence the
    MinHash shingles use (:func:`_fnv_bytes` — reference shingle.cpp:6-21
    semantics). Pinned spec note: round 2 used blake2b here; swapped to
    FNV so the recurrence is ANSI-SQL-expressible and the driver's DuckDB
    oracle can value-check the whole pipeline (and so ONE hash family
    covers both near-dup kernels). Any 64-bit avalanche hash satisfies
    Charikar's construction; the choice only has to be pinned.

    Batch-vectorized: tokens are hash-factorized across the batch and the
    Zipf-small *unique vocabulary* is hashed ONCE (not per occurrence);
    per-doc bit votes come from 64 weighted bincounts over the (doc,
    unique-term, count) pairs — no per-document Python loop.
    """
    n = len(texts)
    fp = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return fp.view(np.int64)
    words_per_doc = [(t or "").split() for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), np.int64, count=n)
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for lst in words_per_doc:
        flat[pos: pos + len(lst)] = lst
        pos += len(lst)
    if flat.size == 0:
        return fp.view(np.int64)
    codes, uniq = pd.factorize(flat)
    hs = np.fromiter((_fnv_bytes(w.encode()) for w in uniq),
                     dtype=np.uint64, count=len(uniq))
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    key = doc_of * np.int64(len(uniq)) + codes
    uk, cnt = np.unique(key, return_counts=True)
    d = (uk // len(uniq)).astype(np.int64)
    hsc = hs[(uk % len(uniq)).astype(np.int64)]
    cw = cnt.astype(np.float64)  # exact for counts < 2^52
    total = np.bincount(d, weights=cw, minlength=n)
    for b in range(64):
        bit = ((hsc >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        votes = np.bincount(d, weights=cw * bit, minlength=n)
        # votes*2 > total  <=>  sum((2*bit-1)*count) > 0
        fp |= np.uint64(1 << b) * (2.0 * votes > total).astype(np.uint64)
    return fp.view(np.int64)


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens — see :func:`simhash_batch`."""
    out = T.StructType([T.StructField("doc_id", T.LongType(), False),
                        T.StructField("simhash", T.LongType(), False)])

    def fn(it):
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy().astype(np.int64),
                "simhash": simhash_batch(pdf[text_col].tolist()),
            })

    return df.select(id_col, text_col).mapInPandas(fn, schema=out)


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3,
                           text_col: str = "text", id_col: str = "doc_id",
                           max_bucket: int = 64) -> DataFrame:
    """SimHash near-dups via 4x16-bit block LSH (pigeonhole: hamming <= 3
    guarantees >= 1 identical block of 4; exact Hamming check after).

    Same bucket-size guard as :func:`minhash_candidate_pairs` — block
    buckets larger than ``max_bucket`` star-pair to the bucket min
    instead of all-pairs (16-bit blocks only span 65,536 values, so at
    corpus scale unguarded buckets WILL be huge; widen the blocks or
    raise block count before raising ``max_bucket``). Bucket stats via
    groupBy + join-back (skew-safe), not a window."""
    sh = simhash64(df, text_col, id_col)
    blocks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("block_id"),
                     F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(0xFFFF).alias("block"))
            for i in range(4)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.block_id", "b.block")
    stats = (blocks.groupBy("block_id", "block")
             .agg(F.count("*").alias("bsz"),
                  F.min(F.struct("doc_id", "simhash")).alias("_m"))
             .select("block_id", "block", "bsz",
                     F.col("_m.doc_id").alias("bmin"),
                     F.col("_m.simhash").alias("bhash")))
    blocks = blocks.join(stats, ["block_id", "block"])
    small = blocks.where(F.col("bsz") <= max_bucket)
    l, r = small.alias("l"), small.alias("r")
    cand_small = (
        l.join(r, ["block_id", "block"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"),
                F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"))
    )
    cand_large = (
        blocks.where((F.col("bsz") > max_bucket)
                     & (F.col("doc_id") != F.col("bmin")))
        .select(F.col("bmin").alias("doc_a"), F.col("doc_id").alias("doc_b"),
                F.col("bhash").alias("ha"), F.col("simhash").alias("hb"))
    )
    cand = cand_small.unionByName(cand_large) \
                     .dropDuplicates(["doc_a", "doc_b"])
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def _doc_grams(df: DataFrame, n: int, text_col: str,
               id_col: str) -> DataFrame:
    """(doc_id, gram) distinct token n-grams (SQL-parity tokenizer)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda x: x != F.lit("")).alias("toks"),
    )
    # outer explode: plain explode's inferred size-filter inlines the
    # gram transform (tokenization inside the lambda) and re-evaluates
    # it per element — O(tokens^2) per doc
    return (toks.select(
        "doc_id",
        F.explode_outer(F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
        )).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .where(F.size(F.split(F.col("gram"), " ")) == n).distinct())


def _gram_prefix(grams: DataFrame, threshold: float,
                 gdf: DataFrame | None = None) -> DataFrame:
    """Each doc's PREFIX grams under the global (df asc, gram) order.
    ``gdf``: optional precomputed (gram, gdf) relation — the R-S join
    passes the UNION-side df so both relations share one total order.

    Prefix-filtering principle (Chaudhuri et al. ICDE'06 / PPJoin):
    J(a,b) >= t implies |a ∩ b| >= ceil(t·max(|a|,|b|)) (since the union
    is at least the max), and an overlap of α forces the two docs'
    first (|x| - α + 1) grams under ANY shared total order to intersect.
    Ordering by ascending document frequency puts the RAREST grams in
    the prefix, so a stop-gram shared by every doc almost never joins —
    the candidate join is bounded by rare-gram buckets instead of going
    quadratic. EXACT: no above-threshold pair can be missed. The f.p.
    epsilon only ever enlarges the prefix (safe direction).

    Gram df comes from a map-side-combinable groupBy joined back on the
    gram (AQE-skew-splittable), never a window over ``gram`` — a window
    would push every occurrence of a stop-gram into one task. The
    remaining windows partition by ``doc_id`` (bounded by doc size).
    """
    from pyspark.sql import Window as W

    if gdf is None:
        gdf = grams.groupBy("gram").agg(F.count("*").alias("gdf"))
    w_doc = W.partitionBy("doc_id")
    ranked = (grams.join(gdf, "gram")
              .withColumn("n_grams", F.count("*").over(w_doc))
              .withColumn("rn", F.row_number().over(
                  w_doc.orderBy("gdf", "gram"))))
    prefix_len = (F.col("n_grams")
                  - F.ceil(F.col("n_grams") * F.lit(threshold) - F.lit(1e-9))
                  + 1)
    return ranked.where(F.col("rn") <= prefix_len) \
                 .select("doc_id", "gram", "n_grams")


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        mode: str = "auto",
                        naive_max_join_rows: float = 5e7) -> DataFrame:
    """Token n-gram Jaccard similarity >= threshold. EXACT in every mode.

    The all-grams equi-join produces Σ_g df(g)² rows — optimal while no
    gram is common (direct map-side-combinable aggregation, no candidate
    materialization) but quadratic in a stop-gram's document frequency at
    corpus scale. Modes:

    - ``"naive"``: the direct join (best when Σ df² is modest).
    - ``"prefix"``: PPJoin-style prefix filtering (:func:`_gram_prefix`)
      — candidates only join on each doc's rarest grams, so a stop-gram
      shared by everything cannot induce a quadratic join; verification
      is ``array_intersect`` over per-doc gram sets (one row per
      candidate pair, JVM codegen — not a row-exploding re-join).
    - ``"auto"``: one metadata aggregate computes Σ df² and picks naive
      iff it stays under ``naive_max_join_rows`` — the skew statistic IS
      the plan choice, mirroring what a cost-based optimizer would do.
    """
    # every plan (and the auto decision aggregate) reads the gram
    # relation several times; persist it (memory-and-disk, spills at
    # scale) or the explode+distinct recomputes per subtree
    grams = _doc_grams(df, n, text_col, id_col).persist()
    caches = [grams]
    if mode == "auto":
        row = (grams.groupBy("gram").count()
               .agg(F.sum(F.col("count") * F.col("count")).alias("j"))
               .collect()[0])
        mode = "naive" if int(row["j"] or 0) <= naive_max_join_rows else "prefix"

    counts = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    if mode == "naive":
        l, r = grams.alias("l"), grams.alias("r")
        inter = (
            l.join(r, "gram")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .groupBy(F.col("l.doc_id").alias("doc_a"),
                     F.col("r.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("n_inter"))
        )
        ca = counts.select(F.col("doc_id").alias("doc_a"),
                           F.col("n_grams").alias("ga"))
        cb = counts.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_grams").alias("gb"))
        scored = inter.join(ca, "doc_a").join(cb, "doc_b")
    else:
        # candidate generation at a hair below the nominal threshold: the
        # final filter compares round(jaccard, 4) >= threshold (oracle
        # parity), so a pair whose true J sits in [t - 5e-5, t) can round
        # UP into the output — the prefix must not have pruned it. The
        # lowered t only ever ENLARGES the prefix (safe direction).
        prefix = _gram_prefix(grams, max(threshold - 5e-5, 0.0))
        pl, pr = prefix.alias("l"), prefix.alias("r")
        cand = (
            pl.join(pr, "gram")
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("doc_a"),
                    F.col("r.doc_id").alias("doc_b"))
            .dropDuplicates(["doc_a", "doc_b"])
        )
        doc_sets = grams.groupBy("doc_id").agg(
            F.collect_list("gram").alias("gset"),
            F.count("*").alias("n_grams"))
        a_sets = doc_sets.select(F.col("doc_id").alias("doc_a"),
                                 F.col("gset").alias("aset"),
                                 F.col("n_grams").alias("ga"))
        b_sets = doc_sets.select(F.col("doc_id").alias("doc_b"),
                                 F.col("gset").alias("bset"),
                                 F.col("n_grams").alias("gb"))
        scored = (
            cand.join(a_sets, "doc_a").join(b_sets, "doc_b")
            .withColumn("n_inter",
                        F.size(F.array_intersect("aset", "bset")).cast("long"))
        )
    out = (
        scored
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("ga") + F.col("gb") - F.col("n_inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    out._build_caches = caches  # release via build.release_build(out)
    return out


# ------------------------------------------------------------ fingerprints

FP_BASE = 31
FP_MOD = 2147483647  # 2^31 - 1; sum of 8 terms stays < 2^63 pre-mod


def winnow_batch(texts, k: int = 8, window: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    polynomial rolling hash over character k-grams, then the min of each
    w-hash window; the fingerprint set is the DISTINCT window minima.

    Returns (doc_idx, fp) pairs, deduped per document. Pure integer
    arithmetic (base 31, mod 2^31-1, byte codes) so ANSI SQL reproduces
    it exactly — the driver oracle recomputes the same values in DuckDB.
    Docs with fewer than k+window-1 characters emit no fingerprints.
    Grams are UTF-8 BYTE k-grams (a char-level SQL restatement matches
    only on ASCII text; non-ASCII fingerprints are still deterministic,
    just byte- rather than codepoint-grained).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    d_out, f_out = [], []
    weights = (FP_BASE ** np.arange(k - 1, -1, -1, dtype=np.int64))
    for i, t in enumerate(texts):
        b = np.frombuffer((t or "").encode("utf-8", "replace"), dtype=np.uint8)
        if b.size < k:
            continue
        grams = sliding_window_view(b, k).astype(np.int64)
        h = (grams * weights[None, :]).sum(axis=1) % FP_MOD
        if h.size < window:
            continue
        fps = np.unique(sliding_window_view(h, window).min(axis=1))
        d_out.append(np.full(fps.size, i, dtype=np.int64))
        f_out.append(fps)
    if not d_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(d_out), np.concatenate(f_out)


def winnow_fingerprints(df: DataFrame, k: int = 8, window: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — each doc's winnowing fingerprint set. Content-reuse
    detection = equi-join on fp (bounded buckets: fingerprints are
    near-uniform hash values, so no stop-gram-style skew)."""
    out = T.StructType([T.StructField("doc_id", T.LongType(), False),
                        T.StructField("fp", T.LongType(), False)])

    def fn(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy().astype(np.int64)
            d, f = winnow_batch(pdf[text_col].tolist(), k=k, window=window)
            yield pd.DataFrame({"doc_id": ids[d], "fp": f})

    return df.select(id_col, text_col).mapInPandas(fn, schema=out)


# ------------------------------------------------------- duplicate clusters

def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., SoCC 2014, Alg. 2): every
    node connects its strictly-larger neighbors to the minimum of its
    closed neighborhood.  Aggregate + join-back form — neighborhoods are
    never collected, so a web-scale hub node costs one groupBy row, not
    a giant array."""
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (und.groupBy("u").agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m")))
    return (und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round (ibid., Alg. 3) over edges already oriented
    big->small: every node re-points itself and its smaller neighbors at
    the minimum of its smaller neighborhood."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    repoint = (e.join(mins, "u")
               .where(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
    selfe = mins.select(F.col("u"), F.col("m").alias("v"))
    return repoint.union(selfe).distinct()


def connected_components(pairs: DataFrame, id_a: str = "doc_a",
                         id_b: str = "doc_b",
                         max_iters: int = 30) -> DataFrame:
    """Minimum-label connected components over an undirected pair relation
    -> (node, cluster) for every node that appears in a pair, where
    cluster is the smallest node id in its component.

    Alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
    Rastogi, Vassilvitskii, "Connected Components in MapReduce and
    Beyond", SoCC 2014): O(log^2 n) rounds, each round two shuffles of
    O(|E|) rows on near-uniform keys, no neighborhood materialization.
    This is the transitive step the LSH/SimHash/Jaccard pair kernels
    stop short of: A~B and B~C land in one duplicate cluster even when
    A~C was never emitted as a candidate.

    Each round ends in localCheckpoint to truncate the iterative plan
    (on a real cluster: ``checkpoint()`` to reliable storage).
    Convergence = fixed point of the edge set, detected by a 4-value
    checksum aggregate (count / endpoint sums / xxhash64 sum), so the
    driver never sees edge rows.
    """
    for c in (id_a, id_b):
        kind = dict(pairs.dtypes)[c]
        if kind not in ("tinyint", "smallint", "int", "bigint"):
            # cast('long') on strings yields NULLs that silently wipe
            # every assignment — hash non-numeric ids (xxhash64) first
            raise TypeError(
                f"pair column {c!r} must be integral, got {kind}")
    e = (pairs.select(F.col(id_a).cast("long").alias("a"),
                      F.col(id_b).cast("long").alias("b"))
         .where(F.col("a") != F.col("b"))
         .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
         .distinct())
    prev_sig = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint()
        dec = "decimal(38,0)"  # full-range longs: sums must not overflow
        sig = tuple(e.agg(F.count(F.lit(1)),
                          F.sum(F.col("u").cast(dec)),
                          F.sum(F.col("v").cast(dec)),
                          F.sum(F.xxhash64("u", "v").cast(dec))).first())
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds")
    return (e.select(F.col("u").alias("node"), F.col("v").alias("cluster"))
            .union(e.select(F.col("v").alias("node"), F.col("v").alias("cluster")))
            .distinct())


def dup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                 id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """(doc_id, cluster) for EVERY document: transitive duplicate-cluster
    assignment from a near-dup pair relation; docs in no pair are their
    own singleton cluster.  Keep-first policy over clusters = keep rows
    where cluster == doc_id."""
    kind = dict(df.dtypes)[id_col]
    if kind not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(f"doc id column {id_col!r} must be integral, "
                        f"got {kind} (hash string ids with xxhash64 first)")
    assign = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (df.select(F.col(id_col).cast("long").alias(id_col))
            .join(assign.withColumnRenamed("node", id_col), id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster")))


def cross_jaccard_pairs(left: DataFrame, right: DataFrame, n: int = 3,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id", mode: str = "auto",
                        naive_max_join_rows: float = 5e7) -> DataFrame:
    """R-S token n-gram Jaccard similarity join: (left_id, right_id,
    jaccard) for every cross-relation pair with J >= threshold — the
    two-corpus form of :func:`ngram_jaccard_pairs` (train-vs-benchmark
    fuzzy decontamination, crawl-vs-crawl overlap audits).  EXACT in
    every mode.

    Modes mirror the self-join kernel:

    - ``"naive"``: direct gram equi-join (Σ_g df_L(g)·df_R(g) rows).
    - ``"prefix"``: PPJoin prefix filtering under ONE total order
      shared by both sides — gram df is computed over the UNION of the
      two gram relations (the prefix-intersection proof needs a shared
      order, nothing else), so a stop-gram common to both corpora
      cannot induce a quadratic join; verification is
      ``array_intersect`` per candidate pair.
    - ``"auto"``: the cross-df statistic Σ df_L·df_R picks the plan.

    Candidate generation runs at threshold − 5e-5 so a pair whose true
    J rounds UP into ``round(j, 4) >= threshold`` is never pruned
    (same boundary contract as the self-join)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    lg = _doc_grams(left, n, text_col, id_col).persist()
    rg = _doc_grams(right, n, text_col, id_col).persist()
    caches = [lg, rg]
    try:
        if mode == "auto":
            ldf = lg.groupBy("gram").agg(F.count("*").alias("dl"))
            rdf = rg.groupBy("gram").agg(F.count("*").alias("dr"))
            row = (ldf.join(rdf, "gram")
                   .agg(F.sum(F.col("dl") * F.col("dr")).alias("j"))
                   .collect()[0])
            mode = ("naive" if int(row["j"] or 0) <= naive_max_join_rows
                    else "prefix")
        lc = lg.groupBy("doc_id").agg(F.count("*").alias("ga"))
        rc = rg.groupBy("doc_id").agg(F.count("*").alias("gb"))
        if mode == "naive":
            inter = (lg.alias("l").join(rg.alias("r"), "gram")
                     .groupBy(F.col("l.doc_id").alias("left_id"),
                              F.col("r.doc_id").alias("right_id"))
                     .agg(F.count("*").alias("n_inter")))
            scored = (inter
                      .join(lc.select(F.col("doc_id").alias("left_id"),
                                      "ga"), "left_id")
                      .join(rc.select(F.col("doc_id").alias("right_id"),
                                      "gb"), "right_id"))
        elif mode == "prefix":
            t = max(threshold - 5e-5, 0.0)
            # one shared order: df over the union of both gram
            # relations, fed to the SAME prefix kernel as the
            # self-join (one source of truth for the prefix-length /
            # boundary-epsilon contract)
            gdf = (lg.select("gram").unionAll(rg.select("gram"))
                   .groupBy("gram").agg(F.count("*").alias("gdf")))
            cand = (_gram_prefix(lg, t, gdf=gdf)
                    .select("doc_id", "gram").alias("l")
                    .join(_gram_prefix(rg, t, gdf=gdf)
                          .select("doc_id", "gram").alias("r"), "gram")
                    .select(F.col("l.doc_id").alias("left_id"),
                            F.col("r.doc_id").alias("right_id"))
                    .dropDuplicates(["left_id", "right_id"]))
            lsets = lg.groupBy("doc_id").agg(
                F.collect_list("gram").alias("aset"),
                F.count("*").alias("ga"))
            rsets = rg.groupBy("doc_id").agg(
                F.collect_list("gram").alias("bset"),
                F.count("*").alias("gb"))
            scored = (cand
                      .join(lsets.select(F.col("doc_id").alias("left_id"),
                                         "aset", "ga"), "left_id")
                      .join(rsets.select(F.col("doc_id").alias("right_id"),
                                         "bset", "gb"), "right_id")
                      .withColumn("n_inter",
                                  F.size(F.array_intersect("aset", "bset"))
                                  .cast("long")))
        else:
            raise ValueError(f"unknown mode: {mode!r}")
        out = (scored
               .withColumn("jaccard", F.round(
                   F.col("n_inter")
                   / (F.col("ga") + F.col("gb") - F.col("n_inter")), 4))
               .where(F.col("jaccard") >= threshold)
               .select("left_id", "right_id", "jaccard"))
        out = out.localCheckpoint()
        return out
    finally:
        for c in caches:
            c.unpersist()
