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


def signatures_df(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, sig binary, band_0..7 hash) via one vectorized UDF pass."""
    out_schema = T.StructType([
        T.StructField("sig", T.BinaryType(), False),
        T.StructField("bands", T.ArrayType(T.LongType()), False),
    ])

    @F.pandas_udf(out_schema)
    def _sig(texts: pd.Series) -> pd.DataFrame:
        sigs, bandlists = [], []
        for t in texts:
            words = (t or "").split()
            sig = minhash_signature(words)
            sigs.append(sig)
            # band hash = FNV over the band's 8 bytes (shingle.cpp:23-33)
            bandlists.append([
                int(_fnv_bytes(sig[b * BAND_SIZE : (b + 1) * BAND_SIZE]))
                - (1 << 63)  # shift into signed long range for the column
                for b in range(NUM_BANDS)
            ])
        return pd.DataFrame({"sig": sigs, "bands": bandlists})

    return df.select(F.col(id_col).alias("doc_id"),
                     _sig(F.col(text_col)).alias("s")) \
             .select("doc_id", F.col("s.sig").alias("sig"),
                     F.col("s.bands").alias("bands"))


_PAIR_SCHEMA = T.StructType([
    T.StructField("doc_a", T.LongType(), False),
    T.StructField("doc_b", T.LongType(), False),
    T.StructField("n_equal", T.IntegerType(), False),
])


def minhash_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """LSH band join -> distinct candidate pairs with byte-agreement count."""
    bands = sigs.select(
        "doc_id", "sig", F.posexplode("bands").alias("band_id", "band_hash")
    )
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(right, on=["band_id", "band_hash"], how="inner")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("l.sig").alias("sig_a"),
                F.col("r.doc_id").alias("doc_b"), F.col("r.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )

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


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens (Charikar 2002): per token a
    64-bit hash votes +1/-1 per bit weighted by tf; sign -> fingerprint."""
    out = T.StructType([T.StructField("doc_id", T.LongType(), False),
                        T.StructField("simhash", T.LongType(), False)])

    def fn(it):
        import hashlib

        for pdf in it:
            ids, fps = [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                words, counts = np.unique((t or "").split(), return_counts=True)
                if words.size == 0:
                    ids.append(int(did)); fps.append(0)
                    continue
                hs = np.array(
                    [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                     for w in words], dtype=np.uint64)
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
                votes = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
                fp = np.uint64(0)
                for i in np.flatnonzero(votes > 0):
                    fp |= np.uint64(1) << np.uint64(i)
                ids.append(int(did)); fps.append(int(fp.astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": fps})

    return df.select(id_col, text_col).mapInPandas(fn, schema=out)


def simhash_near_dup_pairs(df: DataFrame, max_hamming: int = 3,
                           text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash near-dups via 4x16-bit block LSH (any identical block is a
    candidate; exact Hamming check after)."""
    sh = simhash64(df, text_col, id_col)
    blocks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("block_id"),
                     F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(0xFFFF).alias("block"))
            for i in range(4)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.block_id", "b.block")
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(r, ["block_id", "block"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"),
                F.col("l.simhash").alias("ha"), F.col("r.simhash").alias("hb"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).where(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token n-gram Jaccard similarity via shingle equi-join (SQL-shaped:
    the DuckDB oracle runs the same relational plan)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda x: x != F.lit("")).alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
        )).alias("gram"),
    ).where(F.size(F.split(F.col("gram"), " ")) == n).distinct()
    counts = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("ga"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("gb"))
    return (
        inter.join(ca, "doc_a").join(cb, "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_inter") / (F.col("ga") + F.col("gb") - F.col("n_inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
