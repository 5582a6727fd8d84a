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


def serial_diff(buckets: DataFrame, value_col: str = "sum_value",
                ts_col: str = "bucket", by: list[str] | None = None,
                lag: int = 1) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation: ``value - value[t-lag]``
    per series (NULL for each series' first ``lag`` buckets). Same
    one-window-pass shape and scale note as :func:`pipeline_aggs`."""
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    keys = by or []
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts_col)
    v = F.col(value_col).cast("double")
    return buckets.withColumn("serial_diff",
                              F.round(v - F.lag(v, lag).over(w), 4))


def funnel(events: DataFrame, steps: list[str], ts_col: str = "ts",
           user_col: str = "user_id", type_col: str = "event_type",
           horizon: str | None = None) -> DataFrame:
    """Ordered funnel analysis: for each step_i, how many users reached
    steps[0..i] IN ORDER — each step's event at-or-after the user's
    earliest completion time of the previous step (and, with
    ``horizon`` e.g. ``'24 hours'``, within that interval of the
    FIRST step). Returns (step_idx, step, n_users, conversion) with
    conversion = n_users / step-0 users, ordered by step_idx.

    Distributed shape: step 0 is one map-side-combinable min-aggregate
    keyed by user; each later step is an equi-join of the (bounded,
    one-row-per-qualifying-user) frontier against that step's events
    plus another min-aggregate — len(steps)-1 shuffles on the user key,
    never a per-user sort or collected timeline. Greedy earliest-
    completion is the standard funnel semantics (if a user can complete
    step i at several times, the earliest maximizes what can follow
    within a horizon that anchors at step 0)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    u, t = F.col(user_col), F.col(ts_col).cast("timestamp")
    frontier = (events.where(F.col(type_col) == steps[0])
                .groupBy(u.alias("user"))
                .agg(F.min(t).alias("t0"))
                .withColumn("t_prev", F.col("t0")))
    if horizon is not None:
        frontier = frontier.withColumn(
            "t_max", F.col("t0") + F.expr(f"INTERVAL {horizon}"))
    # persist each frontier: it is one row per still-qualifying user and
    # the next step's count would otherwise recompute the whole chain
    stages = [frontier.persist()]
    for step in steps[1:]:
        ev = events.where(F.col(type_col) == step).select(
            u.alias("user"), t.alias("t_ev"))
        cond = F.col("t_ev") >= F.col("t_prev")
        if horizon is not None:
            cond = cond & (F.col("t_ev") <= F.col("t_max"))
        prev = stages[-1]
        nxt = (ev.join(prev, "user").where(cond)
               .groupBy("user").agg(F.min("t_ev").alias("t_next")))
        frontier = (nxt.join(prev.drop("t_prev"), "user")
                    .select("user", "t0",
                            F.col("t_next").alias("t_prev"),
                            *(["t_max"] if horizon is not None else [])))
        stages.append(frontier.persist())
    counts = [s.count() for s in stages]
    for s in stages:
        s.unpersist()
    spark = events.sparkSession
    base = counts[0]
    rows = [(i, s, int(c), round(c / base, 4) if base else None)
            for i, (s, c) in enumerate(zip(steps, counts))]
    return spark.createDataFrame(
        rows, "step_idx int, step string, n_users bigint, conversion double")


def retention_cohorts(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      granularity: str = "week",
                      max_offset: int | None = None) -> DataFrame:
    """Cohort retention: users are cohorted by the period of their
    FIRST event; each (cohort, period-offset) cell counts the distinct
    users of that cohort active in that later period. Returns
    (cohort, offset, n_users) ordered by (cohort, offset); offset 0 is
    the cohort size.

    Two map-side-combinable aggregates and one broadcast-size join-back
    of the per-user first-period relation (one row per user) — no
    windows over unbounded keys. ``granularity``: 'day' | 'week' |
    'month' (date_trunc units)."""
    if granularity not in ("day", "week", "month"):
        raise ValueError(f"unsupported granularity: {granularity}")
    u, t = F.col(user_col), F.col(ts_col).cast("timestamp")
    period = F.date_trunc(granularity, t)
    per_event = events.select(u.alias("user"), period.alias("p"))
    first = per_event.groupBy("user").agg(F.min("p").alias("cohort"))
    div = {"day": 1, "week": 7, "month": None}[granularity]
    joined = per_event.join(first, "user")
    if granularity == "month":
        off = (F.months_between(F.col("p"), F.col("cohort"))
               .cast("int"))
    else:
        off = (F.datediff(F.col("p"), F.col("cohort")) / F.lit(div)) \
            .cast("int")
    cells = (joined.select(F.col("cohort"), off.alias("offset"), "user")
             .where(F.col("offset") >= 0))
    if max_offset is not None:
        cells = cells.where(F.col("offset") <= max_offset)
    return (cells.groupBy("cohort", "offset")
            .agg(F.countDistinct("user").alias("n_users"))
            .orderBy("cohort", "offset"))


def date_histogram(events: DataFrame, interval: str = "hour",
                   ts_col: str = "ts", by: list[str] | None = None,
                   value_col: str | None = None,
                   min_doc_count: int = 1,
                   extended_bounds: tuple[str, str] | None = None
                   ) -> DataFrame:
    """ES ``date_histogram`` with the two behaviors the plain rollup
    lacks: ``min_doc_count=0`` emits EMPTY buckets, and
    ``extended_bounds=(lo, hi)`` (ISO timestamps) forces the bucket
    axis to cover [lo, hi] even past the data.  Returns
    ([*by,] bucket, doc_count[, sum_value]) ordered by (*by, bucket).

    Scale shape: counts are one map-side-combinable aggregate.  The
    gap-fill axis is generated with ``sequence()`` from ONE row (the
    global min/max — a 1-row aggregate, or the literal bounds), so its
    cost is bounded by time-range/interval — independent of corpus
    size; per-``by`` axes come from cross-joining the tiny bucket axis
    with the distinct (bounded-cardinality) key relation, then a left
    join back to the counts.  ``interval``: a ``date_trunc`` unit
    ('hour', 'day', 'week', ...)."""
    if interval not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported interval: {interval}")
    keys = by or []
    t = F.date_trunc(interval, F.col(ts_col).cast("timestamp"))
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    counts = events.groupBy(*keys, t.alias("bucket")).agg(*aggs)
    if min_doc_count >= 1 and extended_bounds is None:
        out = counts.filter(F.col("doc_count") >= min_doc_count)
        return out.orderBy(*keys, "bucket")

    # gap-fill: the complete bucket axis from one bounds row
    step = (F.expr("INTERVAL 1 WEEK") if interval == "week"
            else F.expr(f"INTERVAL 1 {interval.upper()}"))
    data_bounds = events.agg(
        F.date_trunc(interval, F.min(F.col(ts_col).cast("timestamp")))
        .alias("dlo"),
        F.date_trunc(interval, F.max(F.col(ts_col).cast("timestamp")))
        .alias("dhi"))
    if extended_bounds is not None:
        # ES extended_bounds only EXTENDS the axis — it never clips
        # data buckets (that is the separate hard_bounds option), so
        # the axis is the union of the literal and data ranges;
        # least/greatest skip the NULLs an empty relation produces
        lo, hi = extended_bounds
        bounds = data_bounds.select(
            F.least(F.col("dlo"),
                    F.expr(f"date_trunc('{interval}', "
                           f"timestamp'{lo}')")).alias("lo"),
            F.greatest(F.col("dhi"),
                       F.expr(f"date_trunc('{interval}', "
                              f"timestamp'{hi}')")).alias("hi"))
    else:
        bounds = data_bounds.select(F.col("dlo").alias("lo"),
                                    F.col("dhi").alias("hi"))
    axis = bounds.select(
        F.explode(F.sequence("lo", "hi", step)).alias("bucket"))
    if keys:
        axis = axis.crossJoin(events.select(*keys).distinct())
    filled = (axis.join(counts, [*keys, "bucket"], "left")
              .withColumn("doc_count",
                          F.coalesce("doc_count", F.lit(0))))
    if value_col is not None:
        filled = filled.withColumn(
            "sum_value", F.coalesce("sum_value", F.lit(0.0)))
    return (filled.filter(F.col("doc_count") >= min_doc_count)
            .orderBy(*keys, "bucket"))


# ES auto_date_histogram interval ladder: (date_trunc unit, seconds per
# bucket — months use the mean Gregorian month, the choice only has to
# be pinned and restatable)
AUTO_HIST_LADDER = [("minute", 60.0), ("hour", 3600.0),
                    ("day", 86400.0), ("week", 604800.0),
                    ("month", 2629800.0)]


def auto_date_histogram(events: DataFrame, target_buckets: int = 100,
                        ts_col: str = "ts",
                        by: list[str] | None = None) -> DataFrame:
    """ES ``auto_date_histogram``: pick the COARSEST-necessary interval
    from the pinned ladder (minute → hour → day → week → month) such
    that ``span / interval + 1 <= target_buckets``, then bucket-count
    at that interval.  Returns ([*by,] interval, bucket, doc_count)
    ordered by (*by, bucket) — the chosen interval rides along so the
    choice itself is value-checked.

    Scale shape: the choice needs only the global (min, max) timestamp
    — ONE 1-row aggregate collected (bounded at any corpus size); the
    histogram is then the usual map-side-combinable groupBy.  The
    choice rule is plain arithmetic on epoch seconds, so an independent
    SQL engine re-derives the same interval."""
    if target_buckets < 1:
        raise ValueError(
            f"target_buckets must be >= 1, got {target_buckets}")
    keys = by or []
    t = F.col(ts_col).cast("timestamp")
    row = events.agg(F.min(t).alias("lo"), F.max(t).alias("hi")).first()
    if row.lo is None:
        raise ValueError("auto_date_histogram needs at least one row")
    span_s = (row.hi - row.lo).total_seconds()
    interval = AUTO_HIST_LADDER[-1][0]
    for g, size in AUTO_HIST_LADDER:
        if span_s / size + 1.0 <= target_buckets:
            interval = g
            break
    return (events.groupBy(*keys,
                           F.date_trunc(interval, t).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .select(*keys, F.lit(interval).alias("interval"), "bucket",
                    "doc_count")
            .orderBy(*keys, "bucket"))


def stats_bucket(buckets: DataFrame, value_col: str = "sum_value",
                 extended: bool = False, round_at: int = 4) -> DataFrame:
    """ES ``stats_bucket`` / ``extended_stats_bucket`` sibling pipeline
    aggregation: one summary row over a sibling aggregation's bucket
    VALUES — count/min/max/avg/sum, plus population variance and
    std_deviation when ``extended`` (ES uses population semantics
    here, unlike matrix_stats' sample semantics).  One fused aggregate
    over the (bounded) bucket relation."""
    v = F.col(value_col).cast("double")
    aggs = [F.count(v).alias("count"),
            F.round(F.min(v), round_at).alias("min"),
            F.round(F.max(v), round_at).alias("max"),
            F.round(F.avg(v), round_at).alias("avg"),
            F.round(F.sum(v), round_at).alias("sum")]
    if extended:
        aggs += [F.round(F.var_pop(v), round_at).alias("variance"),
                 F.round(F.stddev_pop(v), round_at).alias("std_deviation")]
    return buckets.agg(*aggs)


def bucket_script_pipeline(buckets: DataFrame,
                           script: dict[str, str] | None = None,
                           selector: str | None = None,
                           sort_by: str | list[tuple[str, str]] | None
                           = None,
                           ascending: bool = False,
                           size: int | None = None,
                           round_at: int = 4) -> DataFrame:
    """ES ``bucket_script`` + ``bucket_selector`` + ``bucket_sort``
    pipeline aggregations over a bucketed relation (the output shape of
    :func:`rollup_timeseries` / a date-histogram facet):

      * ``script``   — {new_col: SQL expression over the bucket's
        metric columns} (ES bucket_script; expressions are plain
        Catalyst SQL, e.g. ``"sum_value / n_events"``),
      * ``selector`` — boolean SQL expression; buckets where it is
        false/NULL are dropped (ES bucket_selector),
      * ``sort_by`` + ``size`` — order the surviving buckets and keep
        the first ``size`` (ES bucket_sort truncation).  ``sort_by``
        is a column name (direction from ``ascending``) or, like ES's
        multi-field bucket_sort, a list of (column, 'asc'|'desc')
        pairs — a trailing unique key makes the truncation
        deterministic under value ties.

    Scale shape: scripts and the selector are row-local codegen over
    the (time-bounded) bucket relation — no shuffle; the sort+size is
    a global top-k (TakeOrderedAndProject), never a full sort at rest.
    Numeric script outputs are rounded to ``round_at`` so independent
    engines agree."""
    out = buckets
    for name, expr in (script or {}).items():
        c = F.expr(expr)
        out = out.withColumn(
            name, F.round(c.cast("double"), round_at))
    if selector is not None:
        out = out.filter(F.expr(selector))
    if sort_by is not None:
        if isinstance(sort_by, str):
            keys = [F.col(sort_by).asc() if ascending
                    else F.col(sort_by).desc()]
        else:
            bad = [d for _, d in sort_by if d not in ("asc", "desc")]
            if bad:
                raise ValueError(f"sort direction must be asc|desc, "
                                 f"got {bad}")
            keys = [F.col(c).asc() if d == "asc" else F.col(c).desc()
                    for c, d in sort_by]
        out = out.orderBy(*keys)
        if size is not None:
            out = out.limit(size)
    elif size is not None:
        raise ValueError("size requires sort_by (ES bucket_sort "
                         "truncates a SORTED bucket list)")
    return out


# ES normalize-agg methods: name -> (needs, formula).  Documented
# semantics from the ES normalize pipeline aggregation: `mean` is
# (x - mean) / (max - min) (ES's documented definition, not a z-score).
NORMALIZE_METHODS = ("rescale_0_1", "rescale_0_100", "percent_of_sum",
                     "mean", "z-score", "softmax")


def normalize_buckets(buckets: DataFrame, value_col: str = "sum_value",
                      methods: list[str] | None = None,
                      ts_col: str = "bucket",
                      by: list[str] | None = None,
                      round_at: int = 4) -> DataFrame:
    """ES ``normalize`` pipeline aggregation: per series (the ``by``
    keys), rescale each bucket's value by a whole-series statistic.
    One column per requested method, all methods in ONE window pass
    (unbounded frame over the series — the per-series state is the
    handful of running aggregates, and a time-bucketed series is
    bounded by the time axis, not the corpus).

    Methods (ES definitions): ``rescale_0_1`` (x-min)/(max-min),
    ``rescale_0_100``, ``percent_of_sum`` x/sum, ``mean``
    (x-mean)/(max-min), ``z-score`` (x-mean)/pop_stddev, ``softmax``
    e^x/sum(e^x) (computed max-shifted for overflow safety —
    mathematically identical)."""
    ms = methods or ["rescale_0_1"]
    bad = [m for m in ms if m not in NORMALIZE_METHODS]
    if bad:
        raise ValueError(f"unknown normalize methods {bad}; "
                         f"pick from {NORMALIZE_METHODS}")
    keys = by or []
    w = (Window.partitionBy(*[F.col(k) for k in keys])
         .orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding,
                      Window.unboundedFollowing))
    v = F.col(value_col).cast("double")
    mn, mx = F.min(v).over(w), F.max(v).over(w)
    mean, sd = F.avg(v).over(w), F.stddev_pop(v).over(w)
    total = F.sum(v).over(w)
    # softmax needs sum(exp(v - series_max)) — a window aggregate over
    # another window's output, so the max materializes as a column
    # first (Spark forbids nested window expressions; the planner still
    # fuses both Window operators over the same partitioning into one
    # exchange)
    out = buckets
    if "softmax" in ms:
        out = (out.withColumn("_smax", mx)
               .withColumn("_expsum",
                           F.sum(F.exp(v - F.col("_smax"))).over(w)))
    # a constant series has max == min (and stddev 0): pin the
    # range-scaled methods to 0.0 there instead of NULL/inf so single-
    # bucket series stay well-defined (same CASE in any oracle)
    rng = F.when(mx != mn, mx - mn)
    formulas = {
        "rescale_0_1": F.coalesce((v - mn) / rng, F.lit(0.0)),
        "rescale_0_100": F.coalesce((v - mn) / rng * 100.0, F.lit(0.0)),
        "percent_of_sum": v / total,
        "mean": F.coalesce((v - mean) / rng, F.lit(0.0)),
        "z-score": F.coalesce((v - mean) / F.when(sd != 0.0, sd),
                              F.lit(0.0)),
        "softmax": (F.exp(v - F.col("_smax")) / F.col("_expsum")),
    }
    for m in ms:
        col = m.replace("-", "_")
        out = out.withColumn(col, F.round(formulas[m], round_at))
    if "softmax" in ms:
        out = out.drop("_smax", "_expsum")
    return out.orderBy(*keys, ts_col)


def moving_percentiles(buckets: DataFrame, value_col: str = "sum_value",
                       window: int = 5,
                       percents: list[float] | None = None,
                       ts_col: str = "bucket",
                       by: list[str] | None = None,
                       round_at: int = 4) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation, exact form: for
    each bucket, the requested percentiles of the TRAILING ``window``
    buckets (including the current one; partial leading windows use
    what exists — ES shift=0 default).  ES computes these over t-digest
    sketches; over a bounded bucket axis the exact percentile is both
    cheaper and engine-restatable, so this pins exact linear
    interpolation (Spark ``percentile`` == DuckDB ``quantile_cont``).

    One window pass per series; the frame holds ``window`` values, so
    per-row state is O(window) regardless of corpus size."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    ps = percents or [0.5]
    keys = by or []
    w = (Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts_col)
         .rowsBetween(-(window - 1), 0))
    v = F.col(value_col).cast("double")
    out = buckets
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percent must be in [0, 1], got {p}")
        col = f"p{int(round(p * 100)):02d}"
        out = out.withColumn(
            col, F.round(F.percentile(v, F.lit(p)).over(w), round_at))
    return out.orderBy(*keys, ts_col)


def holt_winters_case_sql(window: int, alpha: float, beta: float,
                          gamma: float, period: int,
                          dialect: str = "spark",
                          frame: str = "l") -> str:
    """Unrolled additive Holt-Winters (triple exponential smoothing,
    Winters 1960; Hyndman fpp2 §7.3 additive form) over a bounded
    frame array — ONE symbolic expansion rendered to either dialect
    (Spark SQL 0-based ``size``, DuckDB 1-based ``len``), so both
    engines evaluate the textually identical arithmetic and the
    rounded outputs match bitwise.

    Pinned model, frame ``l`` of length n (NULL when n < 2*period):

        s0  = mean(l[1..p]);  b0 = mean_i (l[i+p] - l[i]) / p
        c_i = l[i] - s0                      for i = 1..p   (additive)
        for k = p+1 .. n:
            s_k = alpha*(l[k] - c_{k-p}) + (1-alpha)*(s + b)
            c_k = gamma*(l[k] - s - b) + (1-gamma)*c_{k-p}
            b_k = beta*(s_k - s) + (1-beta)*b
        return s_n + b_n + c_{n+1-p}         (one-step-ahead forecast)

    The expansion re-evaluates shared subexpressions instead of
    let-binding them (neither dialect has a let); re-evaluation cannot
    change a value, so it is bitwise-equal to the sequential fold —
    but it GROWS geometrically in the iteration count, so the
    unrollable depth is capped (window - 2*period <= 4).  Sizes:
    ~5 KB at (window=6, period=3), ~20 KB at (7, 3), ~67 KB at (8, 3)
    — past ~64 KB Spark's generated Java method overflows and the
    expression evaluates interpreted (still correct, slower); keep
    window - 2*period <= 1 when codegen matters."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if window < 2 * period:
        raise ValueError(f"window must be >= 2*period, got window="
                         f"{window} period={period}")
    if window - 2 * period > 4:
        raise ValueError("unrolled expansion capped at window - "
                         f"2*period <= 4 (got {window - 2 * period})")
    if dialect == "spark":
        at = lambda i: f"{frame}[{i - 1}]"
        ln = f"size({frame})"
    else:
        at = lambda i: f"{frame}[{i}]"
        ln = f"len({frame})"
    a, ca = repr(float(alpha)), repr(1.0 - float(alpha))
    bt, cbt = repr(float(beta)), repr(1.0 - float(beta))
    g, cg = repr(float(gamma)), repr(1.0 - float(gamma))
    p = period
    arms = []
    for n in range(2 * p, window + 1):
        s = "((" + " + ".join(at(i) for i in range(1, p + 1)) + f") / {p}.0)"
        b = ("((" + " + ".join(f"({at(i + p)} - {at(i)}) / {p}.0"
                               for i in range(1, p + 1)) + f") / {p}.0)")
        c = {i: f"({at(i)} - {s})" for i in range(1, p + 1)}
        for k in range(p + 1, n + 1):
            s_new = f"({a} * ({at(k)} - {c[k - p]}) + {ca} * ({s} + {b}))"
            c[k] = f"({g} * ({at(k)} - {s} - {b}) + {cg} * {c[k - p]})"
            b = f"({bt} * ({s_new} - {s}) + {cbt} * {b})"
            s = s_new
        arms.append(f"WHEN {n} THEN ({s} + {b} + {c[n + 1 - p]})")
    return f"CASE {ln} " + " ".join(arms) + " END"


def moving_fn(buckets: DataFrame, value_col: str = "sum_value",
              window: int = 5, fn: str = "unweighted_avg",
              alpha: float = 0.3, beta: float = 0.1, shift: int = 0,
              ts_col: str = "bucket", by: list[str] | None = None,
              round_at: int = 6, out_col: str | None = None,
              gamma: float = 0.1, period: int = 3) -> DataFrame:
    """ES ``moving_fn`` pipeline aggregation: slide a ``window``-bucket
    frame along each series and evaluate one of the stock
    ``MovingFunctions`` on it.  Unlike :func:`moving_percentiles` (which
    pins the ES shift=0-INCLUSIVE percentile contract this repo
    documented), this follows the ES ``moving_fn`` frame exactly:
    ``shift=0`` positions the window on the ``window`` buckets BEFORE
    the current one (excluding it), ``shift=1`` slides it one bucket
    right to include the current bucket.  An empty frame (the first
    bucket at shift=0) yields NULL, the ES gap behavior.

    Supported ``fn`` (ES MovingFunctions, same arithmetic):

    * ``min`` / ``max`` / ``sum`` / ``unweighted_avg`` / ``stddev``
      (population, as ES computes it) — pure JVM window aggregates.
    * ``linear`` — linearWeightedAvg: weights 1..n ascending over the
      frame (latest bucket heaviest), sum(w*v)/sum(w).
    * ``ewma`` — exponentially weighted moving average seeded with the
      OLDEST frame value then folded left: acc = v*alpha +
      acc*(1-alpha) (exactly ES's loop, which DuckDB's seeded
      ``list_reduce`` reproduces).
    * ``holt`` — double exponential smoothing (Holt 1957; the ES holt
      model's standard formulation): state seeded s=v2, b=v2-v1 after
      the first two frame values, then s' = alpha*v + (1-alpha)*(s+b),
      b' = beta*(s'-s) + (1-beta)*b; returns the final smoothed s
      (a one-value frame returns that value). The two-state fold runs
      as a struct accumulator in both engines (DuckDB: list_reduce
      over a struct-lifted frame), same op order, so the 6-dp round
      matches bitwise.
    * ``holt_winters`` — additive TRIPLE smoothing (level + trend +
      seasonality of ``period`` buckets; Winters 1960): one-step-ahead
      forecast from a textually unrolled expression
      (:func:`holt_winters_case_sql`) whose identical rendering is the
      DuckDB oracle — cross-engine parity by construction. NULL until
      the frame holds 2 full seasons.

    The positional functions collect the frame with ``collect_list``
    over the ordered window — frame order IS series order, the
    load-bearing assumption both engines share.  Per-row state is
    O(window); one exchange per ``by`` series, none when the input is
    already bucketed per series."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if not 0 <= shift <= window:
        raise ValueError(f"shift must be in [0, window], got {shift}")
    target = out_col or fn
    if target in buckets.columns:
        # withColumn would silently REPLACE an existing column — two
        # passes of the same model with different parameters would
        # drop the first result without a signal
        raise ValueError(
            f"output column {target!r} already exists — pass out_col= "
            "to keep both results")
    keys = by or []
    w = (Window.partitionBy(*[F.col(k) for k in keys]).orderBy(ts_col)
         .rowsBetween(shift - window, shift - 1))
    v = F.col(value_col).cast("double")
    simple = {"min": F.min, "max": F.max, "sum": F.sum,
              "unweighted_avg": F.avg, "stddev": F.stddev_pop}
    if fn in simple:
        agg = simple[fn](v).over(w)
    elif fn == "holt":
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha must be in (0, 1], got {alpha}")
        if not 0.0 < beta <= 1.0:
            raise ValueError(f"beta must be in (0, 1], got {beta}")
        arr = F.collect_list(v).over(w)
        n = F.size(arr)
        a, ca = float(alpha), 1.0 - float(alpha)
        bt, cbt = float(beta), 1.0 - float(beta)
        v1, v2 = F.element_at(arr, 1), F.element_at(arr, 2)
        init = F.struct(v2.alias("s"), (v2 - v1).alias("b"))
        tail = F.transform(
            F.slice(arr, 3, F.greatest(n - 2, F.lit(0))),
            lambda x: F.struct(x.alias("s"), F.lit(0.0).alias("b")))
        # s' appears twice (also inside b') on BOTH engines — the
        # doubled computation keeps the op sequence identical to the
        # DuckDB struct fold, which has no let-binding either
        folded = F.aggregate(
            tail, init,
            lambda acc, e: F.struct(
                (F.lit(a) * e["s"]
                 + F.lit(ca) * (acc["s"] + acc["b"])).alias("s"),
                (F.lit(bt) * ((F.lit(a) * e["s"]
                               + F.lit(ca) * (acc["s"] + acc["b"]))
                              - acc["s"])
                 + F.lit(cbt) * acc["b"]).alias("b")))
        agg = F.when(n == 1, v1).when(n >= 2, folded["s"])
    elif fn == "holt_winters":
        # additive triple smoothing over the frame (seasonality-aware);
        # the SAME generated expression text serves as the DuckDB
        # oracle, so cross-engine parity is by construction — see
        # holt_winters_case_sql for the pinned model + unroll cap
        for nm, val in (("alpha", alpha), ("beta", beta),
                        ("gamma", gamma)):
            if not 0.0 < val <= 1.0:
                raise ValueError(f"{nm} must be in (0, 1], got {val}")
        arr = F.collect_list(v).over(w)
        case = holt_winters_case_sql(window, alpha, beta, gamma, period,
                                     dialect="spark", frame="__hw_frame")
        out = (buckets.withColumn("__hw_frame", arr)
               .withColumn(target, F.round(F.expr(case), round_at))
               .drop("__hw_frame"))
        return out.orderBy(*keys, ts_col)
    elif fn in ("linear", "ewma"):
        arr = F.collect_list(v).over(w)
        n = F.size(arr)
        if fn == "linear":
            wsum = F.aggregate(
                F.zip_with(arr, F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                           lambda a, i: a * i.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x)
            agg = F.when(n > 0,
                         wsum / (n.cast("double") * (n + 1) / 2.0))
        else:
            if not 0.0 < alpha <= 1.0:
                raise ValueError(f"alpha must be in (0, 1], got {alpha}")
            folded = F.aggregate(
                F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
                F.element_at(arr, F.lit(1)),
                lambda acc, x: x * F.lit(float(alpha))
                + acc * F.lit(1.0 - float(alpha)))
            agg = F.when(n > 0, folded)
    else:
        fns = sorted(simple) + ["linear", "ewma", "holt", "holt_winters"]
        raise ValueError(f"unknown fn: {fn!r} (expected one of {fns})")
    return (buckets.withColumn(target, F.round(agg, round_at))
            .orderBy(*keys, ts_col))


def cumulative_cardinality(events: DataFrame, key_col: str = "user_id",
                           interval: str = "day", ts_col: str = "ts",
                           by: list[str] | None = None) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation, exact form:
    per series, the running count of DISTINCT ``key_col`` values seen
    up to and including each time bucket (the "total unique users by
    day N" question ES answers with a cardinality agg + this
    pipeline).  Also emits ``new_keys`` — the bucket's first-seen
    count (the incremental_cardinality derivative ES users compute
    from it).

    Exact and distributed via the first-seen decomposition: a key
    contributes to the cumulative count exactly at its FIRST bucket,
    so  (1) groupBy (series, key) -> min bucket  (map-side-combinable
    min, one shuffle on the natural key),  (2) count first-seen rows
    per bucket,  (3) running sum over the bounded bucket axis.  No
    distinct-over-growing-prefix rescans, no HLL approximation, and
    per-window state in step 3 is one number."""
    keys = by or []
    bucket = F.date_trunc(interval, F.col(ts_col).cast("timestamp"))
    first_seen = (events
                  .groupBy(*keys, F.col(key_col).alias("_k"))
                  .agg(F.min(bucket).alias("bucket")))
    per_bucket = (first_seen.groupBy(*keys, "bucket")
                  .agg(F.count(F.lit(1)).alias("new_keys")))
    w = (Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (per_bucket
            .withColumn("cumulative_distinct",
                        F.sum("new_keys").over(w))
            .orderBy(*keys, "bucket"))


def session_window_agg(events: DataFrame, gap_s: int = 1800,
                       ts_col: str = "ts",
                       by: list[str] | None = None,
                       value_col: str | None = "value",
                       round_at: int = 4) -> DataFrame:
    """Per-session aggregation via Spark's NATIVE ``session_window``
    (the built-in scale path — state lives in the JVM's streaming-safe
    session operator, no Python, merges sessions map-side): one row
    per (keys, session) with the session bounds, event count, and
    optional value sum.  A session closes after ``gap_s`` seconds of
    inactivity; Spark's convention (pinned): ``session_end`` = last
    event + gap.

    The custom ``applyInPandasWithState`` sessionizer
    (streaming/aggregate.py) keeps running per-user COUNTERS; this
    built-in form materializes the SESSIONS themselves — both shapes
    are needed, and this one is pure Catalyst.  Restatable: sessions
    are gaps-and-islands (lag + running sum of breaks) in any SQL
    engine."""
    if gap_s < 1:
        raise ValueError(f"gap_s must be >= 1, got {gap_s}")
    keys = by or []
    t = F.col(ts_col).cast("timestamp")
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(F.col(value_col).cast("double")),
                            round_at).alias("sum_value"))
    sw = F.session_window(t, f"{gap_s} seconds")
    return (events.groupBy(*keys, sw.alias("sw"))
            .agg(*aggs)
            .select(*keys,
                    F.col("sw.start").alias("session_start"),
                    F.col("sw.end").alias("session_end"),
                    "n_events",
                    *(["sum_value"] if value_col is not None else []))
            .orderBy(*keys, "session_start"))


def sibling_bucket_aggs(buckets: DataFrame,
                        value_col: str = "sum_value",
                        keys: list[str] | None = None,
                        percents: list[float] | None = None,
                        round_at: int = 4) -> DataFrame:
    """The remaining ES sibling pipeline aggregations in one fused pass
    over a bucket relation: ``max_bucket`` / ``min_bucket`` (the
    extreme VALUE plus the bucket KEYS that attain it — ES returns the
    key list; ties pinned to the lexicographically-first key row) and
    ``percentiles_bucket`` (exact linear-interpolation percentiles of
    the bucket values).  Returns one row:
    (max_value, max_keys, min_value, min_keys, p50, ...).

    One aggregate over the (bounded) bucket relation: extremes via
    ``min_by``/``max_by`` over a struct ordered by (value, keys) —
    no second scan, no window."""
    ks = keys or []
    ps = percents or [0.5]
    v = F.col(value_col).cast("double")
    key_str = (F.concat_ws("|", *[F.col(k).cast("string") for k in ks])
               if ks else F.lit(""))
    # extremes via min_by over (±value, key) structs: struct ordering
    # is lexicographic, so ties deterministically take the smallest key
    aggs = [
        F.round(F.max(v), round_at).alias("max_value"),
        F.min_by(key_str, F.struct((-v).alias("nv"), key_str.alias("k")))
        .alias("max_keys"),
        F.round(F.min(v), round_at).alias("min_value"),
        F.min_by(key_str, F.struct(v.alias("v"), key_str.alias("k")))
        .alias("min_keys"),
    ]
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percent must be in [0, 1], got {p}")
        aggs.append(F.round(F.percentile(v, F.lit(p)), round_at)
                    .alias(f"p{int(round(p * 100)):02d}"))
    return buckets.agg(*aggs)


def date_range_facet(events: DataFrame, ranges: list[tuple[str | None,
                                                           str | None]],
                     ts_col: str = "ts",
                     value_col: str | None = None,
                     by: list[str] | None = None,
                     round_at: int = 4) -> DataFrame:
    """ES ``date_range`` aggregation: explicit half-open [from, to)
    DATE buckets (``from`` inclusive, ``to`` exclusive, None =
    unbounded), labeled the ES way ("from-to" with '*' for open
    ends).  Same fused shape as the numeric ``range`` agg: buckets may
    overlap, each is an independent conditional count in ONE aggregate
    pass; optional ``value_col`` adds a per-range sum.  Bounds are ISO
    timestamp strings parsed once as literals (no per-row parsing)."""
    if not ranges:
        raise ValueError("ranges must be non-empty")
    keys = by or []
    ts = F.col(ts_col)
    aggs, labels = [], []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            cond = cond & (ts < F.lit(hi).cast("timestamp"))
        label = f"{lo or '*'}-{hi or '*'}"
        labels.append(label)
        aggs.append(F.count(F.when(cond, F.lit(1)))
                    .alias(f"count:{label}"))
        if value_col is not None:
            aggs.append(F.round(
                F.sum(F.when(cond, F.col(value_col).cast("double"))),
                round_at).alias(f"sum:{label}"))
    wide = events.groupBy(*keys).agg(*aggs)
    pairs = []
    for label in labels:
        fields = [F.lit(label).alias("range"),
                  F.col(f"`count:{label}`").alias("doc_count")]
        if value_col is not None:
            fields.append(F.col(f"`sum:{label}`").alias("sum_value"))
        pairs.append(F.struct(*fields))
    out = (wide.select(*keys, F.explode(F.array(*pairs)).alias("b"))
           .select(*keys, "b.*"))
    return out.orderBy(*keys, "range") if keys else out.orderBy("range")


def change_point(buckets: DataFrame, value_col: str = "sum_value",
                 order_col: str = "bucket",
                 by: str | None = None,
                 min_buffer: int = 2,
                 round_at: int = 4) -> DataFrame:
    """ES ``change_point`` pipeline aggregation — locate the most likely
    STEP change and the strongest SPIKE/DIP in a bucketed series, with
    pinned deterministic statistics (ES's ml-backed detector mixes
    several tests with library-defined p-values; ours are restatable in
    any SQL dialect):

    - **step**: for every split after ordinal i (1-based, ``min_buffer``
      <= i <= n - min_buffer), the standardized mean shift
      ``|mean(1..i) - mean(i+1..n)| * sqrt(i * (n - i) / n)``; the
      change point is the FIRST bucket of the right segment at the
      maximizing split (ties -> earliest split).
    - **spike/dip**: the bucket maximizing ``|x - median|`` (ties ->
      earliest bucket), signed: positive = spike, negative = dip. The
      statistic is the raw deviation; callers normalize by the series'
      MAD if a scale-free score is wanted (kept raw so an exact-median
      oracle restates it bit-for-bit).

    Input is a BOUNDED bucket relation (a rollup / date-histogram
    output — one row per bucket, thousands at most), optionally one
    series per ``by`` key. Plan shape: one window pass per series for
    the prefix sums (partitioned by the series key — never a corpus
    window), one exact-median aggregate join-back, and a 1-row-per-
    series argmin; everything after the (bounded) rollup is metadata
    scale at 100 TB.

    Returns one row per series: (by?, n_buckets, step_at, step_stat,
    step_mean_before, step_mean_after, spike_at, spike_stat). Series
    with fewer than ``2 * min_buffer`` buckets have no admissible split
    and are omitted.
    """
    if min_buffer < 1:
        raise ValueError("min_buffer must be >= 1")
    keys = [by] if by else []
    v = F.col(value_col).cast("double")
    part = Window.partitionBy(*keys) if keys else Window.partitionBy()
    w_ord = part.orderBy(F.asc("_ord"))
    w_all = (part.orderBy(F.asc("_ord"))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    base = (buckets
            .select(*keys, F.col(order_col).alias("_ord"), v.alias("_v"))
            .withColumn("_i", F.row_number().over(w_ord))
            .withColumn("_csum", F.sum("_v").over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("_n", F.count("_v").over(w_all))
            .withColumn("_tot", F.sum("_v").over(w_all))
            .withColumn("_med", F.expr("percentile(_v, 0.5)").over(w_all))
            .withColumn("_next", F.lead("_ord", 1).over(w_ord)))

    n, i = F.col("_n"), F.col("_i")
    mean_l = F.col("_csum") / i
    mean_r = (F.col("_tot") - F.col("_csum")) / (n - i)
    stat = (F.abs(mean_l - mean_r)
            * F.sqrt(i.cast("double") * (n - i) / n))
    splits = (base
              .filter((i >= int(min_buffer)) & (i <= n - int(min_buffer)))
              .withColumn("_stat", stat)
              .withColumn("_ml", mean_l).withColumn("_mr", mean_r))
    w_step = part.orderBy(F.desc("_stat"), F.asc("_i"))
    # step_at = first bucket of the RIGHT segment (the _next ordinal,
    # computed on the UNFILTERED series so the last allowed split still
    # has a right-segment head)
    steps = (splits
             .withColumn("_rk", F.row_number().over(w_step))
             .filter(F.col("_rk") == 1)
             .select(*keys,
                     F.col("_n").alias("n_buckets"),
                     F.col("_next").alias("step_at"),
                     F.round("_stat", round_at).alias("step_stat"),
                     F.round("_ml", round_at).alias("step_mean_before"),
                     F.round("_mr", round_at).alias("step_mean_after")))
    w_spike = part.orderBy(F.desc(F.abs(F.col("_v") - F.col("_med"))),
                           F.asc("_i"))
    spikes = (base.withColumn("_rk", F.row_number().over(w_spike))
              .filter(F.col("_rk") == 1)
              .select(*keys, F.col("_ord").alias("spike_at"),
                      F.round(F.col("_v") - F.col("_med"),
                              round_at).alias("spike_stat")))
    out = steps.join(spikes, keys) if keys else steps.crossJoin(spikes)
    order = [F.asc(by)] if by else [F.asc("step_at")]
    return out.orderBy(*order).select(
        *keys, "n_buckets", "step_at", "step_stat", "step_mean_before",
        "step_mean_after", "spike_at", "spike_stat")
