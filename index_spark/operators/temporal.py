"""Temporal joins Spark lacks as built-ins: as-of and range joins.

Both are expressed as compositions of existing DataFrame operators (no
UDF, no mapInPandas), so Catalyst/AQE keep optimizing them:

- **as-of join** (each left row takes the latest right row at-or-before
  its timestamp, per key): the union-and-window form — right rows
  interleave into the left stream sorted by (key, ts), and
  ``last(payload, ignorenulls)`` over the running window carries the
  most recent right payload forward.  ONE shuffle on the key; state per
  window is a single row regardless of history length.  (kdb's aj /
  pandas merge_asof semantics; ties at equal ts take the right row.)

- **range join** (left.ts BETWEEN right.start AND right.end): the
  bucketed form — intervals explode onto fixed-width time buckets, the
  join runs as a bucket+key equi-join, and the true predicate
  re-filters.  Work is O(events + interval-spans) instead of the
  cross-product a naive theta-join plans; ``bucket_width`` trades
  explode fan-out against join selectivity (set it near the typical
  interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join", "rollup_timeseries"]


def rollup_timeseries(events: DataFrame, ts_col: str = "ts",
                      granularities: list[str] | None = None,
                      by: list[str] | None = None,
                      value_col: str = "value") -> DataFrame:
    """Hypertable-style continuous aggregate: (granularity, bucket,
    *by, n_events, sum_value, avg_value) for EVERY granularity in ONE
    pass — each row explodes to its (granularity, truncated-ts) pairs
    and a single map-side-combinable aggregate covers all levels, so k
    granularities cost one shuffle, not k scans.  Granularities are
    ``date_trunc`` units ('hour', 'day', 'week', ...)."""
    grans = granularities or ["hour", "day"]
    keys = by or []
    pairs = F.array(*[
        F.struct(F.lit(g).alias("granularity"),
                 F.date_trunc(g, F.col(ts_col)).alias("bucket"))
        for g in grans])
    ex = events.select(*keys, value_col, F.explode(pairs).alias("gb"))
    return (ex.groupBy("gb.granularity", "gb.bucket", *keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(value_col), 4).alias("sum_value"),
                 F.round(F.avg(value_col), 4).alias("avg_value")))


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | None = None,
              value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Every ``left`` row + the most recent ``right`` values with
    ``right.on <= left.on`` (within the same ``by`` key if given);
    unmatched rows keep NULLs.  ``value_cols`` defaults to every right
    column except ``on``/``by``."""
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    out_cols = [f"{c}{suffix}" for c in value_cols]

    lt = left.select(*left.columns,
                     F.lit(1).alias("_is_left"),
                     *[F.lit(None).cast(right.schema[c].dataType)
                       .alias(o) for c, o in zip(value_cols, out_cols)])
    rt = right.select(*[(F.lit(None).cast(left.schema[c].dataType)
                         if c not in ([by] if by else []) + [on]
                         else F.col(c)).alias(c)
                        for c in left.columns],
                      F.lit(0).alias("_is_left"),
                      *[F.col(c).alias(o)
                        for c, o in zip(value_cols, out_cols)])

    u = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal ts -> ties match
    keys = [by] if by else []
    w = (Window.partitionBy(*keys).orderBy(F.col(on).asc(),
                                           F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for o in out_cols:
        u = u.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return u.where(F.col("_is_left") == 1).drop("_is_left")


def range_join(events: DataFrame, intervals: DataFrame, ts_col: str = "ts",
               start_col: str = "start", end_col: str = "end",
               by: str | None = None,
               bucket_seconds: int = 3600) -> DataFrame:
    """Inner join of point events onto enclosing [start, end] intervals
    (inclusive), optionally also equi-keyed on ``by`` — via fixed-width
    time buckets so the plan is an equi-join, never a cross-product.
    Set ``bucket_seconds`` near the typical interval length (explode
    fan-out per interval = span / bucket_seconds + 1)."""
    def bucket(c: str) -> F.Column:
        return F.floor(F.unix_timestamp(F.col(c)) / F.lit(bucket_seconds))

    ev = events.withColumn("_b", bucket(ts_col))
    # explode each interval onto every bucket it overlaps
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(bucket(start_col), bucket(end_col))))

    keys = ["_b"] + ([by] if by else [])
    joined = ev.join(iv, keys)
    return (joined.where((F.col(ts_col) >= F.col(start_col))
                         & (F.col(ts_col) <= F.col(end_col)))
            .drop("_b"))


def pipeline_aggs(buckets: DataFrame, value_col: str = "sum_value",
                  ts_col: str = "bucket", by: list[str] | None = None,
                  window: int = 3) -> DataFrame:
    """Elasticsearch pipeline aggregations over a bucketed time series
    (the output shape of :func:`rollup_timeseries` or a
    date-histogram facet): per time bucket, in one pass —

      * ``derivative``   — value minus the previous bucket's value
        (NULL for each series' first bucket, ES semantics),
      * ``cumulative``   — running sum from the series start,
      * ``moving_avg``   — mean of the trailing ``window`` buckets
        (including the current one; partial windows average what
        exists, ES ``moving_fn`` default).

    All three are ONE window pass partitioned by the ``by`` keys and
    ordered by bucket time. Scale note: the window partitions by the
    series keys — a time-bucketed series is bounded by the time range
    (buckets, not events), so per-partition state stays small; an
    unkeyed call (``by=None``) puts the whole bucket relation in one
    partition and is only for bounded rollups — pass the category
    keys at scale."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    keys = by or []
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts_col)
    v = F.col(value_col).cast("double")
    return (buckets
            .withColumn("derivative",
                        F.round(v - F.lag(v, 1).over(w), 4))
            .withColumn("cumulative",
                        F.round(F.sum(v).over(
                            w.rowsBetween(Window.unboundedPreceding, 0)),
                            4))
            .withColumn("moving_avg",
                        F.round(F.avg(v).over(
                            w.rowsBetween(-(window - 1), 0)), 4)))
