"""As-of and range joins: semantics + plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from index_spark.operators.temporal import asof_join, range_join

T = dt.datetime


def _left(spark):
    return spark.createDataFrame(
        [(1, "u1", T(2024, 1, 1, 10, 0)), (2, "u1", T(2024, 1, 1, 12, 0)),
         (3, "u2", T(2024, 1, 1, 11, 0)), (4, "u2", T(2024, 1, 1, 9, 0))],
        "event_id long, user string, ts timestamp")


def _right(spark):
    return spark.createDataFrame(
        [("u1", T(2024, 1, 1, 9, 30), 10.0),
         ("u1", T(2024, 1, 1, 12, 0), 20.0),
         ("u2", T(2024, 1, 1, 10, 30), 30.0)],
        "user string, ts timestamp, price double")


def test_asof_join_backward_with_ties_and_misses(spark):
    out = {r.event_id: r.price_asof
           for r in asof_join(_left(spark), _right(spark),
                              on="ts", by="user").collect()}
    # 12:00 ties match; 9:00 predates every right row -> NULL
    assert out == {1: 10.0, 2: 20.0, 3: 30.0, 4: None}


def test_asof_join_preserves_left_rowcount(spark):
    left, right = _left(spark), _right(spark)
    assert asof_join(left, right, on="ts", by="user").count() == left.count()


def test_asof_join_without_key(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 1, 10, 0))],
                                 "event_id long, ts timestamp")
    right = spark.createDataFrame([(T(2024, 1, 1, 9, 0), 5.0)],
                                  "ts timestamp, v double")
    got = asof_join(left, right, on="ts").collect()[0]
    assert got.v_asof == 5.0


def test_asof_join_single_shuffle_no_python(spark):
    plan = (asof_join(_left(spark), _right(spark), on="ts", by="user")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") <= 2  # one per input side
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def _events(spark):
    rows = [(i, "u", T(2024, 1, 1, 10, m))
            for i, m in enumerate([0, 15, 40, 59])]
    rows.append((9, "u", T(2024, 1, 1, 13, 0)))
    return spark.createDataFrame(rows,
                                 "event_id long, user string, ts timestamp")


def _intervals(spark):
    return spark.createDataFrame(
        [("u", T(2024, 1, 1, 10, 10), T(2024, 1, 1, 10, 45), "w1"),
         ("u", T(2024, 1, 1, 9, 0), T(2024, 1, 1, 14, 0), "w2")],
        "user string, start timestamp, end timestamp, name string")


def test_range_join_inclusive_bounds(spark):
    got = sorted((r.event_id, r.name)
                 for r in range_join(_events(spark), _intervals(spark),
                                     by="user",
                                     bucket_seconds=1800).collect())
    assert got == [(0, "w2"), (1, "w1"), (1, "w2"), (2, "w1"), (2, "w2"),
                   (3, "w2"), (9, "w2")]


def test_range_join_bucket_width_invariant(spark):
    a = sorted((r.event_id, r.name)
               for r in range_join(_events(spark), _intervals(spark),
                                   by="user", bucket_seconds=60).collect())
    b = sorted((r.event_id, r.name)
               for r in range_join(_events(spark), _intervals(spark),
                                   by="user",
                                   bucket_seconds=86400).collect())
    assert a == b


def test_range_join_plan_is_equi_join(spark):
    plan = (range_join(_events(spark), _intervals(spark), by="user")
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "CartesianProduct" not in plan and "Cross" not in plan


def test_rollup_timeseries_one_shuffle_all_granularities(spark):
    from index_spark.operators.temporal import rollup_timeseries

    ev = spark.createDataFrame(
        [(1, "a", T(2024, 1, 1, 10, 5), 2.0),
         (2, "a", T(2024, 1, 1, 10, 50), 4.0),
         (3, "b", T(2024, 1, 2, 11, 0), 10.0)],
        "event_id long, event_type string, ts timestamp, value double")
    out = rollup_timeseries(ev, granularities=["hour", "day"],
                            by=["event_type"])
    rows = {(r.granularity, r.bucket, r.event_type):
            (r.n_events, r.sum_value, r.avg_value) for r in out.collect()}
    assert rows[("hour", T(2024, 1, 1, 10, 0), "a")] == (2, 6.0, 3.0)
    assert rows[("day", T(2024, 1, 1), "a")] == (2, 6.0, 3.0)
    assert rows[("day", T(2024, 1, 2), "b")] == (1, 10.0, 10.0)
    # ONE aggregate covers all levels (no per-granularity Union of
    # scans); AQE decorates the physical string, so assert logically
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1 and "Union" not in plan
