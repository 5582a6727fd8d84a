"""Parent-child (join-field) queries — the Elasticsearch
``has_child`` / ``has_parent`` surface re-expressed as relational
aggregation + join.

ES implements the join field with in-shard global ordinals (parents and
children co-located in one Lucene shard).  The Spark-first form is the
honest distributed restatement: children's match scores aggregate per
parent key (one map-side-combinable exchange), then join the parent
relation; ``has_parent`` is the mirror — children inherit their
parent's score through one equi-join.  Neither side collects, and the
parent key plays the role ES's routing value plays, so co-partitioning
both relations by the parent key (bucketing) removes the shuffle
exactly like ES's co-located shards do.

Relationship to ``query.has_child_search``: that function owns the
INDEX path (tokenize → complete BM25 match scores → rollup, one call).
This module is the generic-relation complement — the child side is any
pre-scored (parent, score) relation (rescored output, function_score
combines, external signals), which is what ES's join field accepts as
an arbitrary child query; it also adds the ``min`` score mode, a
``max_children`` gate, and the ``has_parent`` direction, which the
index form does not carry.

Reference framing: /root/reference/index.h stops at posting-list
iteration; relevance joins across a document hierarchy are part of the
query surface above it (Lucene ``ToParentBlockJoinQuery`` /
Elasticsearch join field — public semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["has_child_search", "has_parent_search"]

_SCORE_MODES = ("max", "sum", "avg", "min", "none")


def has_child_search(parents: DataFrame, child_scores: DataFrame,
                     parent_col: str = "parent_id",
                     score_col: str = "score", score_mode: str = "max",
                     min_children: int = 1, max_children: int | None = None,
                     k: int | None = 10, round_at: int = 4) -> DataFrame:
    """ES ``has_child``: parents ranked by an aggregate of their
    matching children's scores.

    ``child_scores`` is a (parent_col, score_col) relation — one row
    per matching child (e.g. the complete BM25 match scores joined to
    the child→parent mapping).  ``score_mode``: ``max``/``sum``/
    ``avg``/``min`` combine child scores; ``none`` scores every
    qualifying parent 0 (ES filter semantics).  ``min_children`` /
    ``max_children`` gate on the matching-child count.  Returns the
    parent rows + (score, n_children), ordered (score desc, parent
    asc), cut to ``k``.

    Scale shape: one groupBy on the parent key (map-side combinable —
    max/sum/avg/min/count are all partial-aggregatable), one equi-join
    against the parent relation, then a k-row TakeOrdered.  No window,
    no collect; skew on a hot parent is a plain AQE skew-join case."""
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {_SCORE_MODES}, got {score_mode!r}")
    if min_children < 1:
        raise ValueError(f"min_children must be >= 1, got {min_children}")
    s = F.col(score_col).cast("double")
    combine = {"max": F.max(s), "sum": F.sum(s), "avg": F.avg(s),
               "min": F.min(s), "none": F.lit(0.0)}[score_mode]
    agg = (child_scores.groupBy(parent_col)
           .agg(F.round(combine, round_at).alias("score"),
                F.count(F.lit(1)).alias("n_children"))
           .where(F.col("n_children") >= min_children))
    if max_children is not None:
        agg = agg.where(F.col("n_children") <= max_children)
    out = (parents.join(agg, parent_col)
           .orderBy(F.desc("score"), F.asc(parent_col)))
    return out.limit(k) if k is not None else out


def has_parent_search(children: DataFrame, parent_scores: DataFrame,
                      parent_col: str = "parent_id",
                      score_col: str = "score",
                      k: int | None = 10,
                      tiebreak: str | None = None) -> DataFrame:
    """ES ``has_parent`` (``score=true``): children of matching parents,
    each inheriting its parent's score through ONE equi-join on the
    parent key (inner — children of non-matching parents drop, the ES
    semantics).  Ordered (score desc, tiebreak asc) and cut to ``k``.
    ``tiebreak`` defaults to the first child column that isn't the
    parent key."""
    if tiebreak is None:
        tiebreak = next(c for c in children.columns if c != parent_col)
    out = (children.join(parent_scores.select(parent_col, score_col),
                         parent_col)
           .orderBy(F.desc(score_col), F.asc(tiebreak)))
    return out.limit(k) if k is not None else out
