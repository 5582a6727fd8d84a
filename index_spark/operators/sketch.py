"""Deterministic, engine-portable sketches: HyperLogLog cardinality and
Count-Min frequency.

Spark ships HLL++ (``approx_count_distinct``) and a CountMinSketch —
those are the production defaults — but their register hashing is
engine-private, so their outputs cannot be reproduced by another system,
compared across engines, or value-checked by an independent oracle. At
training-data scale the sketch IS the deliverable (dataset cards quote
"~N distinct documents / tokens"): a sketch whose value is
engine-portable can be recomputed, merged, and audited anywhere.

So these sketches pin the full hash → register pipeline to a
dialect-shared spec:

  * hash = md5 hex (identical in every engine); nibbles parsed with
    ``instr('0123456789abcdef', ...) - 1`` (pure ANSI-ish string ops);
  * HLL (Flajolet et al. 2007): bucket = first 2 nibbles (p=8, m=256
    registers); rho = leading-zero count of the next 56 bits + 1,
    computed by a generated nibble-scan CASE (no log2 — libm-free);
    the harmonic denominator is summed as EXACT DECIMAL(38,0) scaled
    integers (2^(57-M) is an exact double for every M in 0..57), so the
    estimate is one deterministic double division — no float-sum
    order dependence anywhere;
  * Count-Min (Cormode & Muthukrishnan 2005): depth d rows, each
    hashing ``value:row`` md5-nibbles mod width — estimates upper-bound
    true counts by construction.

Both are classic map-side-combinable aggregates: HLL state is m
register maxima, CMS state is d*w counters — constant-size partials
merge associatively, so at 10^12 rows each sketch is one exchange of
bounded state per partition (and sketches of corpus shards union by
max / sum, the same way the reference's per-chunk stats roll up).

The SQL expression strings are built here and shared verbatim by the
Spark operators (``F.expr`` — whole-stage codegen, no UDF) and the
DuckDB driver oracle, so the correctness check covers the hash, the
registers, and the estimate arithmetic bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEX = "0123456789abcdef"

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_RHO_BITS = 56      # nibbles 3..16 of the md5 hex
_RHO_MAX = _RHO_BITS + 1
# 2^(_RHO_MAX) as an integer literal for the scaled harmonic sum
_SCALE_POW = 1 << _RHO_MAX
# alpha_m for m = 256 (Flajolet et al. 2007, m >= 128 regime), written
# as a literal arithmetic expression so both engines derive the same
# IEEE-754 double. The ``e0`` suffix matters: bare ``0.7213`` parses as
# a DECIMAL literal in Spark SQL (and DuckDB), silently switching the
# whole expression to engine-specific decimal arithmetic; scientific
# notation pins every literal to DOUBLE in both dialects.
_ALPHA_NUM = (f"(0.7213e0 / (1.0e0 + 1.079e0 / {HLL_M}.0e0)) "
              f"* {HLL_M}.0e0 * {HLL_M}.0e0 * {_SCALE_POW}.0e0")


def _nib(h: str, i: int) -> str:
    """SQL for the value (0..15) of 1-based hex digit ``i`` of ``h``."""
    return f"(instr('{_HEX}', substr({h}, {i}, 1)) - 1)"


def hll_bucket_sql(col: str) -> str:
    """Register index (0..255) from the first 2 md5 nibbles."""
    h = f"md5({col})"
    return f"({_nib(h, 1)} * 16 + {_nib(h, 2)})"


def hll_rho_sql(col: str) -> str:
    """rho = 1 + leading-zero count of md5 bits 8..63 — a generated
    first-non-zero nibble scan (4 comparisons per nibble, no log2)."""
    h = f"md5({col})"
    arms = []
    for k, i in enumerate(range(3, 3 + _RHO_BITS // 4)):
        n = _nib(h, i)
        within = (f"CASE WHEN {n} >= 8 THEN 0 WHEN {n} >= 4 THEN 1 "
                  f"WHEN {n} >= 2 THEN 2 ELSE 3 END")
        arms.append(f"WHEN {n} != 0 THEN {4 * k} + {within} + 1")
    return "CASE " + " ".join(arms) + f" ELSE {_RHO_MAX} END"


def hll_estimate_sql(s_scaled: str, n_hit: str) -> str:
    """The raw HLL estimate alpha_m * m^2 / Z from the scaled-integer
    harmonic sum over PRESENT registers (``s_scaled``, DECIMAL) and the
    number of present registers (``n_hit``): absent registers
    contribute 2^-0 = 1 each, i.e. 2^{rho_max} scaled units."""
    full = (f"({s_scaled} + CAST({HLL_M} - {n_hit} AS DECIMAL(38,0)) "
            f"* CAST({_SCALE_POW} AS DECIMAL(38,0)))")
    return f"(({_ALPHA_NUM}) / CAST({full} AS DOUBLE))"


def hll_final_sql(s_scaled: str, n_hit: str) -> str:
    """Estimate with the standard small-range correction: linear
    counting (m * ln(m / empty)) only while empty registers remain and
    the raw estimate is under 2.5m. Shared verbatim by the Spark
    operator and the DuckDB oracle."""
    raw = hll_estimate_sql(s_scaled, n_hit)
    lin = (f"({HLL_M}.0e0 * ln({HLL_M}.0e0 / "
           f"CAST({HLL_M} - {n_hit} AS DOUBLE)))")
    return (f"CASE WHEN {n_hit} < {HLL_M} AND {raw} <= 2.5e0 * {HLL_M}.0e0 "
            f"THEN {lin} ELSE {raw} END")


def hll_cardinality(df: DataFrame, col: str) -> DataFrame:
    """Approximate count-distinct of ``df[col]`` with the portable HLL
    (p=8, ~6.5% standard error): one row
    ``(hll_estimate double, n_registers_hit bigint)``.

    Plan: map-side partial max per register -> one exchange of <= 256
    rows per partition -> a single-row final projection. Raises no
    branch ambiguity: the small-range (linear counting) correction
    applies only when empty registers remain (``n_registers_hit < m``)
    AND the raw estimate is under 2.5m — callers in that regime should
    count exactly instead (the input is tiny); we still apply the
    standard correction, using ln only in that branch."""
    regs = (df.select(F.expr(hll_bucket_sql(col)).alias("bucket"),
                      F.expr(hll_rho_sql(col)).alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("m")))
    agg = regs.agg(
        F.count("*").alias("n_registers_hit"),
        F.sum(F.expr(f"CAST(power(2.0, {_RHO_MAX} - m) AS DECIMAL(38,0))")
              ).alias("s_scaled"))
    return agg.select(
        F.expr(hll_final_sql("s_scaled", "n_registers_hit"))
        .alias("hll_estimate"),
        F.col("n_registers_hit").cast("long"))


CMS_DEPTH = 4
CMS_WIDTH = 64


def cms_bucket_sql(col: str, row: str, width: int = CMS_WIDTH) -> str:
    """Counter index for sketch row ``row``: first 2 nibbles of
    md5(value:row) mod width (both operands non-negative)."""
    h = f"md5(concat({col}, ':', cast({row} as string)))"
    return f"(({_nib(h, 1)} * 16 + {_nib(h, 2)}) % {width})"


def cms_sketch(df: DataFrame, col: str, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min sketch of the multiset ``df[col]``:
    ``(j, bucket, cnt)`` — depth*width rows. One pass: the depth
    replication happens inside the map stage (explode of a literal
    sequence), counts combine map-side, the exchange carries <= d*w
    rows per partition."""
    return (df.select(F.col(col).alias("v"),
                      F.explode(F.expr(f"sequence(0, {depth - 1})"))
                      .alias("j"))
            .select("j", F.expr(cms_bucket_sql("v", "j", width))
                    .alias("bucket"))
            .groupBy("j", "bucket").agg(F.count("*").alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 col: str = "term", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch for each candidate value: the classic
    min-over-rows estimate (``cms_est >= true count`` always). The
    candidate relation is broadcast against the d*w-row sketch."""
    probes = (candidates
              .select(col, F.explode(F.expr(f"sequence(0, {depth - 1})"))
                      .alias("j"))
              .select(col, "j",
                      F.expr(cms_bucket_sql(col, "j", width))
                      .alias("bucket")))
    return (probes.join(sketch, ["j", "bucket"])
            .groupBy(col).agg(F.min("cnt").alias("cms_est")))


def cms_heavy_hitters(df: DataFrame, col: str, k: int = 20,
                      depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> DataFrame:
    """Exact top-k frequent values side-by-side with their Count-Min
    estimates: ``(term, exact_cnt, cms_est)`` — the overestimate
    property (cms_est >= exact_cnt) is visible per row. The exact
    counts here serve verification; at 10^12 tokens the sketch replaces
    them (candidate sets come from per-partition local top-k)."""
    exact = (df.groupBy(F.col(col).alias("term"))
             .agg(F.count("*").alias("exact_cnt"))
             .orderBy(F.desc("exact_cnt"), F.asc("term")).limit(k))
    sk = cms_sketch(df, col, depth, width)
    est = cms_estimate(sk, exact.select("term"), "term", depth, width)
    return (exact.join(est, "term")
            .select("term", "exact_cnt", "cms_est")
            .orderBy(F.desc("exact_cnt"), F.asc("term")))


def hll_cardinality_by(df: DataFrame, col: str, by: str) -> DataFrame:
    """Per-group portable HLL count-distinct: one row per ``by`` value,
    ``(by, hll_estimate, n_registers_hit)`` — the grouped form of
    :func:`hll_cardinality` (ES ``cardinality`` inside a ``terms``
    bucket). Same scale shape: partial register maxima combine
    map-side, the exchange carries <= m rows per (partition, group),
    and group sketches union by register max — so per-shard sketches
    roll up exactly like the reference's per-chunk stats."""
    regs = (df.select(F.col(by),
                      F.expr(hll_bucket_sql(col)).alias("bucket"),
                      F.expr(hll_rho_sql(col)).alias("rho"))
            .groupBy(by, "bucket").agg(F.max("rho").alias("m")))
    agg = regs.groupBy(by).agg(
        F.count("*").alias("n_registers_hit"),
        F.sum(F.expr(f"CAST(power(2.0, {_RHO_MAX} - m) AS DECIMAL(38,0))")
              ).alias("s_scaled"))
    return (agg.select(
        F.col(by),
        F.expr(hll_final_sql("s_scaled", "n_registers_hit"))
        .alias("hll_estimate"),
        F.col("n_registers_hit").cast("long"))
        .orderBy(by))


BLOOM_M_BITS = 1 << 23          # 1 MiB of bits
BLOOM_K = 5


def _bloom_pos_cols(col: str, m_bits: int, k: int):
    """The k probe positions as JVM codegen columns — xxhash64 with k
    distinct integer seeds, folded into [0, m_bits).  Hashing stays
    JVM-side so build and probe agree bit-for-bit with no Python in
    the hash path."""
    return [(F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)))
            .alias(f"_p{i}") for i in range(k)]


def bloom_bits(df: DataFrame, col: str, m_bits: int = BLOOM_M_BITS,
               k: int = BLOOM_K) -> np.ndarray:
    """Distributed Bloom-filter build: one uint64 bit-array over the
    DISTINCT values of ``col``.  Shape: k probe positions per value
    (JVM xxhash64), explode, fold each position to its (word, bit),
    ONE map-side-combinable ``bit_or`` groupBy, and a collect bounded
    by m_bits/64 rows (131,072 for the 2^23 default — ~2 MB at the
    driver REGARDLESS of input cardinality).  The returned array
    broadcasts to executors inside an Arrow UDF closure at ~1 MiB —
    the whole point vs broadcasting the value set itself."""
    if m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    pos = df.select(F.explode(F.array(
        *_bloom_pos_cols(col, m_bits, k))).alias("_pos"))
    words = (pos.select((F.col("_pos") / 64).cast("long").alias("_w"),
                        F.expr("shiftleft(1L, cast(_pos % 64 as int))")
                        .alias("_b"))
             .groupBy("_w").agg(F.bit_or("_b").alias("_bits")))
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words.collect():
        arr[int(r._w)] = np.uint64(r._bits & ((1 << 64) - 1))
    return arr


def bloom_maybe_filter(df: DataFrame, col: str, bits: np.ndarray,
                       k: int = BLOOM_K) -> DataFrame:
    """Rows of ``df`` whose ``col`` MAY be in the Bloom set (all k bits
    set; false positives possible, false negatives not).  Probe
    positions are the same JVM xxhash64 columns as the build; the bit
    lookups run vectorized in one Arrow-batched UDF over the
    closure-broadcast array."""
    m_bits = bits.size * 64
    b = bits  # closure capture -> shipped once per executor

    @F.pandas_udf(T.BooleanType())
    def probe(*pos: pd.Series) -> pd.Series:
        ok = np.ones(len(pos[0]), dtype=bool)
        for p in pos:
            pv = p.to_numpy(dtype=np.int64)
            ok &= ((b[pv >> 6] >> (pv & 63).astype(np.uint64))
                   & np.uint64(1)).astype(bool)
        return pd.Series(ok)

    pos_cols = _bloom_pos_cols(col, m_bits, k)
    out = df.select("*", *pos_cols)
    probe_cols = [F.col(f"_p{i}") for i in range(k)]
    return (out.filter(probe(*probe_cols))
            .drop(*[f"_p{i}" for i in range(k)]))
