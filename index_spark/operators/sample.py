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
