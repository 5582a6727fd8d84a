"""Set-based IR metrics: precision@k / recall@k / AP."""

import pytest


def test_precision_recall_ap(spark):
    from index_spark.operators.evaluate import precision_recall_metrics

    results = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 20, 30, 40, 50], 1)] +
        [(2, d, r) for r, d in enumerate([11, 21], 1)],
        "query_id int, doc_id int, rank int")
    qrels = spark.createDataFrame(
        [(1, 10, 1.0), (1, 30, 2.0), (1, 99, 1.0), (2, 77, 1.0)],
        "query_id int, doc_id int, rel double")
    out = {r.query_id: r for r in precision_recall_metrics(
        results, qrels, k=5).collect()}
    # q1: rel hits at ranks 1, 3 of 3 relevant
    assert out[1].p_at_k == 0.4 and out[1].r_at_k == 0.666667
    assert out[1].ap == round((1.0 + 2 / 3) / 3, 6)
    # q2 retrieved nothing relevant but keeps a row
    assert out[2].ap == 0.0 and out[2].n_rel == 1


def test_precision_eval_no_qrels_query(spark):
    from index_spark.operators.evaluate import precision_recall_metrics

    results = spark.createDataFrame([(9, 1, 1)],
                                    "query_id int, doc_id int, rank int")
    qrels = spark.createDataFrame([], "query_id int, doc_id int, rel double")
    out = precision_recall_metrics(results, qrels, k=10).collect()
    assert len(out) == 1 and out[0].n_rel == 0 and out[0].ap == 0.0
