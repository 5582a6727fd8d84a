"""Deterministic sampling — domain mixing and train/val/test splits.

A 100-TB training-data pipeline samples by POLICY, not by RNG: each
source/domain gets a target rate ("keep 100% of books, 12% of
commoncrawl"), and the decision for a given row must be reproducible
across reruns, engines, and partitionings — Spark's ``df.sample`` is
none of those (seed x partition layout dependent).

The decision function here is pure data: a row's uniform draw is the
first 8 hex digits of ``md5(key ':' salt)``, compared LEXICOGRAPHICALLY
against a precomputed 8-hex-digit threshold (equal-length lowercase hex
compares identically as strings and as integers, so no engine-specific
hex->int cast is needed — the same predicate runs verbatim in any ANSI
dialect with an md5()). Everything is a map-only catalyst expression:
no shuffle, no UDF, no RNG, trivially restatable as the DuckDB oracle.

md5 is used as a SPREADER, not for security — 32 bits of it are plenty
to hit a sampling rate within ~2^-16 relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# any 8-hex-digit string is < "g": the keep-everything threshold
_KEEP_ALL = "g"


def rate_threshold(rate: float) -> str:
    """The 8-hex-digit threshold t such that P[u_hex < t] ~= rate."""
    if rate >= 1.0:
        return _KEEP_ALL
    if rate <= 0.0:
        return "00000000"
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def _u_hex(key_col: str, salt: str) -> F.Column:
    return F.substring(
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))),
        1, 8)


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source", key_col: str = "doc_id",
                      salt: str = "sample",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row independently with its stratum's rate.

    ``rates`` maps stratum values to keep-probabilities; strata absent
    from the map use ``default_rate``. The per-row draw depends only on
    (key, salt) — NOT on the stratum — so re-weighting a source later
    keeps a superset/subset of the previous sample (rates only move the
    threshold), which is what iterative mixture tuning needs.
    Schema-preserving; the strata map broadcasts as a literal (domain
    catalogs are small by construction).
    """
    if rates:
        thr_map = F.create_map(*[
            lit for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(rate_threshold(r)))])
        thr = F.coalesce(thr_map[F.col(strata_col)],
                         F.lit(rate_threshold(default_rate)))
    else:
        thr = F.lit(rate_threshold(default_rate))
    return df.filter(_u_hex(key_col, salt) < thr)


def mixture_rates(df: DataFrame, targets: dict[str, float],
                  strata_col: str = "source") -> DataFrame:
    """(strata_col, n_docs, rate) — per-stratum keep rates for the
    LARGEST downsample-only subset whose stratum proportions equal
    ``targets`` (shares normalized to sum 1; strata not in the map get
    rate 0).  K = min_s n_s/t_s is the achievable kept total, so
    rate_s = t_s * K / n_s — the binding stratum keeps everything.
    One count aggregate + a 1-row min cross join; nothing collected.
    A targeted stratum absent from the data leaves the mixture
    unachievable for that stratum (its kept share is 0); callers that
    need a guarantee should validate the stratum catalog first."""
    if not targets:
        raise ValueError("targets must be non-empty")
    if any(t <= 0 for t in targets.values()):
        raise ValueError("target shares must be positive")
    tot = float(sum(targets.values()))
    tmap = F.create_map(*[
        lit for s, t in sorted(targets.items())
        for lit in (F.lit(s), F.lit(float(t) / tot))])
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n_docs")))
    wt = counts.withColumn("t", tmap[F.col(strata_col)])
    k = (wt.where(F.col("t").isNotNull())
         .agg(F.min(F.col("n_docs") / F.col("t")).alias("k")))
    return (wt.crossJoin(k)
            .select(strata_col, "n_docs",
                    F.when(F.col("t").isNull(), F.lit(0.0))
                    .otherwise(F.col("t") * F.col("k") / F.col("n_docs"))
                    .alias("rate")))


# rate (double) -> 8-hex draw threshold, in pure SQL (parity-pinned with
# the DuckDB oracle: floor() BEFORE the cast — DuckDB's double->bigint
# cast rounds while Spark's truncates)
_THR_SQL = ("CASE WHEN rate >= 1.0 THEN 'g' ELSE "
            "format_string('%08x', CAST(floor(rate * 4294967296) AS BIGINT))"
            " END")


def temperature_rates(df: DataFrame, alpha: float = 0.5,
                      strata_col: str = "source") -> DataFrame:
    """Temperature / alpha sampling (T5 & mT5 multilingual mixing,
    Raffel et al. 2020 §3.4.3; Conneau et al. 2020 §3): target shares
    p_s ∝ n_s^alpha — alpha=1 keeps raw proportions, alpha→0 tends to
    uniform, so rare strata are UP-weighted relative to their raw share
    without ever upsampling (rates stay <= 1 by the same K = min n/t
    construction as :func:`mixture_rates`).

    Returns (strata_col, n_docs, target_share, rate): feed the rate
    relation to :func:`balance_corpus` (``rates=``) for the
    deterministic draw. Derivation is one count aggregate plus two
    1-row cross joins (normalizer and K) — nothing collected, stratum
    domain bounded."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n_docs")))
    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    pw = counts.withColumn(
        "_p", F.expr(f"power(CAST(n_docs AS DOUBLE), {a})"))
    z = pw.agg(F.sum("_p").alias("_z"))
    wt = pw.crossJoin(z).withColumn("t", F.col("_p") / F.col("_z"))
    k = wt.agg(F.min(F.col("n_docs") / F.col("t")).alias("k"))
    return (wt.crossJoin(k)
            .select(strata_col, "n_docs",
                    F.col("t").alias("target_share"),
                    (F.col("t") * F.col("k") / F.col("n_docs"))
                    .alias("rate")))


def balance_corpus(df: DataFrame, targets: dict[str, float],
                   strata_col: str = "source", key_col: str = "doc_id",
                   salt: str = "mixture",
                   rates: DataFrame | None = None) -> DataFrame:
    """The rebalanced corpus: rows kept by the deterministic per-row
    draw against their stratum's :func:`mixture_rates` rate.  The rate
    relation is stratum-bounded, so it broadcast-joins; the draw is the
    same (key, salt) contract as :func:`sample_stratified`.  Pass a
    precomputed ``rates`` relation to avoid re-aggregating the corpus
    when the caller also reports the rates."""
    if rates is None:
        rates = mixture_rates(df, targets, strata_col)
    out = df.join(F.broadcast(rates.select(strata_col, "rate")),
                  strata_col, "inner")
    return (out.where(_u_hex(key_col, salt) < F.expr(_THR_SQL))
            .drop("rate"))


def upsample_corpus(df: DataFrame, rates: dict[str, float],
                    strata_col: str = "source", key_col: str = "doc_id",
                    salt: str = "epoch", default_rate: float = 1.0,
                    out_col: str = "copy") -> DataFrame:
    """Deterministic UP-sampling — fractional epoch weighting (the
    GPT-3 / Pile mixture form: "wikipedia x 3.4 epochs, commoncrawl x
    0.44"): each row emits ``floor(rate)`` copies plus one more iff its
    draw < frac(rate), so a stratum's expected multiplicity is exactly
    its rate. Complements the downsample-only :func:`mixture_rates`
    family for targets that EXCEED a stratum's raw share.

    Output = input columns + ``out_col`` (0-based replica ordinal, so
    downstream shuffles/splits can key on (key, copy)). The draw is the
    shared md5 policy — reproducible across engines and partitionings;
    the whole operator is a map-only catalyst expression (literal rate
    map + guarded sequence explode), no shuffle, no RNG. Rates < 1
    degenerate to :func:`sample_stratified` (0 or 1 copies); rate 0
    drops the stratum.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be non-negative")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists; "
                         f"pass out_col=")
    if rates:
        rmap = F.create_map(*[
            lit for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(float(r)))])
        rate = F.coalesce(rmap[F.col(strata_col)],
                          F.lit(float(default_rate)))
    else:
        rate = F.lit(float(default_rate))
    base = F.floor(rate).cast("long")
    # frac(rate) -> 8-hex threshold, computed in SQL so the oracle
    # restates it verbatim (floor BEFORE the cast, cf. _THR_SQL)
    frac_thr = F.format_string(
        "%08x", F.floor((rate - F.floor(rate)) * F.lit(2.0 ** 32))
        .cast("bigint"))
    n = base + F.when(_u_hex(key_col, salt) < frac_thr, F.lit(1)) \
               .otherwise(F.lit(0))
    # guarded sequence: sequence(0, -1) would DESCEND in Spark, so n=0
    # maps to NULL and the outer explode's null row is filtered (outer
    # to dodge InferFiltersFromGenerate re-evaluation, cf. chunk.py)
    copies = F.explode_outer(
        F.when(n >= 1, F.sequence(F.lit(0), (n - 1).cast("int")))
    ).alias(out_col)
    return (df.select("*", copies)
            .filter(F.col(out_col).isNotNull())
            .withColumn(out_col, F.col(out_col).cast("long")))


def shuffle_order(df: DataFrame, key_col: str = "doc_id",
                  salt: str = "shuffle", out_col: str = "ord",
                  group_nibbles: int = 3) -> DataFrame:
    """Deterministic global permutation ordinal — the per-epoch corpus
    reshuffle pretraining loaders need (vary ``salt`` per epoch, e.g.
    ``"epoch3"``): adds ``out_col`` = the row's 0-based rank under
    ascending (md5 draw, key). Reproducible across reruns, engines, and
    partitionings — unlike ``orderBy(rand())``.

    Scale shape: a single unpartitioned ``row_number`` window over the
    corpus is not a plan at 10^12 rows. The rank is a two-level prefix
    sum keyed by the DRAW ITSELF (cf. ``pack.pack_sequences``): rows
    group by the draw's first ``group_nibbles`` hex digits (16^g
    near-uniform groups — the draw is the hash, so group sizes are
    balanced by construction); per-group counts aggregate map-side; the
    exclusive prefix runs over the SMALL group relation (the only
    unpartitioned window — one row per group); within-group ranks are
    windows partitioned by group. Lexicographic hex order makes
    (group, draw) order equal draw order, so the result is exactly
    ``row_number() OVER (ORDER BY draw, key) - 1`` — how the DuckDB
    oracle restates it.

    Sizing: each group's rank window sorts within one task, so pick
    ``group_nibbles`` such that corpus_rows / 16^g fits a task (g=3 →
    4,096 groups serves up to ~10^9 rows; g=6 → 16.7M groups serves
    10^12+ while the group relation still windows in one small task)."""
    if not 1 <= group_nibbles <= 6:
        raise ValueError(f"group_nibbles must be in [1, 6], "
                         f"got {group_nibbles}")
    for c in (out_col, "_u", "_g", "_goff"):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists on the input"
                             + ("; pass out_col=" if c == out_col else ""))
    from pyspark.sql import Window

    d = df.withColumn("_u", _u_hex(key_col, salt)) \
          .withColumn("_g", F.substring("_u", 1, group_nibbles))
    counts = d.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    wg = (Window.orderBy("_g")
          .rowsBetween(Window.unboundedPreceding, -1))
    goff = counts.withColumn(
        "_goff", F.coalesce(F.sum("_n").over(wg), F.lit(0)).cast("long")) \
        .select("_g", "_goff")
    wd = Window.partitionBy("_g").orderBy("_u", F.col(key_col))
    return (d.join(goff, "_g")
            .withColumn(out_col,
                        (F.col("_goff") + F.row_number().over(wd) - 1)
                        .cast("long"))
            .drop("_u", "_g", "_goff"))


def assign_splits(df: DataFrame, weights: list[tuple[str, float]]
                  | None = None, key_col: str = "doc_id",
                  salt: str = "split", out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: adds ``out_col`` with
    the split name chosen by the row's draw against cumulative weight
    thresholds (order given by the caller; weights must sum to ~1 — the
    LAST split absorbs rounding tail). Same draw contract as
    :func:`sample_stratified` (different default salt, so sampling and
    splitting are independent decisions).
    """
    if weights is None:
        weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = sum(w for _, w in weights)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = _u_hex(key_col, salt)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    arms = []
    for name, w in weights[:-1]:
        cum += w
        arms.append((name, rate_threshold(cum)))
    for name, thr in reversed(arms):
        expr = F.when(u < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    key_col: str = "doc_id",
                    salt: str = "ws") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): take the k rows maximizing
    ``u^(1/w)`` — equivalently ``ln(u)/w`` — where u is a uniform draw
    and w the row's weight. The inclusion distribution matches
    sequential weighted draws without replacement; a doubled weight
    doubles a row's first-draw odds.

    The draw is the engine's md5 policy: u = (v + 0.5) / 2^32 with v
    the first 8 md5 nibbles of ``key:salt`` — no RNG, reproducible
    across engines/partitionings, same-key rows keep the same draw
    under any rate/k change (supersets nest like
    :func:`sample_stratified`). Rows with weight <= 0 are excluded
    (the E-S contract requires positive weights).

    Output (key, weight, es_key) with es_key = round(ln(u)/w, 6),
    ranked es_key desc / key asc; the cut compiles to
    TakeOrderedAndProject — map-only before the k-row heap merge, no
    corpus sort, no collect."""
    hexd = "0123456789abcdef"
    h = (f"md5(concat(cast({key_col} as string), ':', '{salt}'))")
    v = " + ".join(
        f"(instr('{hexd}', substr({h}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}.0e0"
        for i in range(8))
    u = f"(({v}) + 0.5e0) / 4294967296.0e0"
    w = F.col(weight_col).cast("double")
    return (df.filter(w > 0)
            .select(F.col(key_col),
                    w.alias("weight"),
                    F.round(F.expr(f"ln({u})") / w, 6).alias("es_key"))
            .orderBy(F.desc("es_key"), F.asc(key_col))
            .limit(k))


def quantile_buckets(df: DataFrame, value_col: str, n_buckets: int = 4,
                     out_col: str = "bucket", round_at: int | None = None,
                     approx: bool = False) -> DataFrame:
    """Assign each row its corpus-quantile bucket over ``value_col`` —
    the curriculum/stratification primitive (perplexity-bucketed
    curricula order training data easy-to-hard; quality-quantile gates
    keep the best X%). Bucket k in [0, n_buckets) holds rows with
    value in the (k/n, (k+1)/n] quantile band:

        bucket = sum over boundaries b_k (k = 1..n-1, the k/n exact
                 linear-interpolation quantiles of the non-NULL
                 values) of [value > b_k]

    so ties AT a boundary take the lower bucket (pinned; restatable
    with DuckDB's ``quantile_cont``, whose interpolation matches
    Spark's ``percentile`` to the last ulp — probed by the
    corpus_profile entry). ``round_at`` pre-rounds values before BOTH
    the boundary computation and the comparison (callers bucketing a
    score an oracle must reproduce should round at the score's own
    output precision). NULL values get a NULL bucket.

    NOT a window: ntile() would be one global sort over the corpus.
    The boundaries are ONE bounded aggregate row (n_buckets-1
    doubles); assignment is a map-only literal-comparison chain.
    ``approx=True`` swaps percentile for percentile_approx (t-digest)
    — the 100-TB form, trading oracle-exactness for a sketch."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    v = F.col(value_col).cast("double")
    if round_at is not None:
        v = F.round(v, round_at)
    probs = ", ".join(f"{k / n_buckets!r}" for k in range(1, n_buckets))
    fn = "percentile_approx" if approx else "percentile"
    row = (df.select(v.alias("_v")).where(F.col("_v").isNotNull())
           .agg(F.expr(f"{fn}(_v, array({probs}))").alias("b"))
           .collect()[0])
    bounds = list(row["b"] or [])
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(v > F.lit(float(b)), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.when(v.isNotNull(), bucket.cast("long")).otherwise(F.lit(None)))


def diversified_sample(df: DataFrame, key_col: str, diversify_col: str,
                       max_per_key: int = 1, n: int | None = None,
                       salt: str = "divsample") -> DataFrame:
    """ES ``diversified_sampler`` aggregation: a deterministic sample
    that admits at most ``max_per_key`` rows per ``diversify_col``
    value, then (optionally) keeps the overall ``n`` best draws.
    Selection order is the shared md5 draw on ``key_col`` (ascending
    hex — the corpus-wide sampling policy every sampler here pins), so
    the result is layout-independent and restatable by any SQL engine.

    Scale shape: one window partitioned by the diversify key (rank
    within key, state bounded by max_per_key per key) and, when ``n``
    is set, a k-row TakeOrdered — never a global sort materialized."""
    from pyspark.sql import Window

    if max_per_key < 1:
        raise ValueError(f"max_per_key must be >= 1, got {max_per_key}")
    draw = _u_hex(key_col, salt)
    w = Window.partitionBy(diversify_col).orderBy(
        F.col("_draw").asc(), F.col(key_col).asc())
    out = (df.withColumn("_draw", draw)
           .withColumn("_rk", F.row_number().over(w))
           .where(F.col("_rk") <= max_per_key)
           .drop("_rk"))
    if n is not None:
        out = out.orderBy(F.col("_draw").asc(),
                          F.col(key_col).asc()).limit(n)
    return out.drop("_draw")


def random_sampler_agg(df: DataFrame, key_col: str, group_col: str,
                       probability: float, value_col: str | None = None,
                       seed: int = 0) -> DataFrame:
    """ES ``random_sampler`` aggregation: compute aggregates over a
    random subset and scale the results back up by ``1/probability``.
    The draw is pinned as a Knuth multiplicative hash of ``key_col``
    (``(pmod(key, 2^31) * 2654435761 + seed) pmod 2^32 < p * 2^32``)
    instead of ES's implementation-defined per-shard PRNG, so any
    engine — including the SQL oracle — reproduces the exact subset;
    the hash is uniform enough that the estimator behaves like ES's.
    The inner ``pmod(·, 2^31)`` bounds the product inside int64 (no
    silent wrap for huge keys) and the outer ``pmod`` keeps the gate
    non-negative for negative keys — a sign-following ``%`` would
    admit every negative hash with probability 1.

    Returns per group: ``sampled_count`` (rows actually aggregated),
    ``est_count`` and — when ``value_col`` is given — ``est_sum``
    (the 1/p-scaled estimates).  One filtered map-side-combinable
    aggregate: the subset never materializes, rows fail the hash gate
    inside the scan, so cost scales with p at any corpus size."""
    if not (0.0 < probability <= 1.0):
        raise ValueError("probability must be in (0, 1]")
    thresh = int(probability * 4294967296.0)
    gate = (F.pmod(F.pmod(F.col(key_col).cast("long"),
                          F.lit(2147483648)) * F.lit(2654435761)
                   + F.lit(int(seed)),
                   F.lit(4294967296)) < F.lit(thresh))
    aggs = [F.count("*").alias("sampled_count"),
            (F.count("*") / F.lit(probability)).alias("est_count")]
    if value_col is not None:
        aggs.append((F.sum(value_col) / F.lit(probability))
                    .alias("est_sum"))
    return (df.filter(gate).groupBy(group_col).agg(*aggs)
            .orderBy(group_col))
