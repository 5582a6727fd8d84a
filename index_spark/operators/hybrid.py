"""Hybrid retrieval — reciprocal-rank fusion of lexical and vector
rankings (Cormack, Clarke & Buettcher, SIGIR 2009).

The modern serving pattern: run BM25 over the inverted index AND
cosine top-k over the embedding column, then fuse by RANK (not score —
BM25 and cosine live on incomparable scales):

    rrf(d) = sum over rankings r of  1 / (c + rank_r(d))

with the standard c = 60. A document absent from a ranking contributes
nothing for it.

Scale contract: fusion consumes RETRIEVER WINDOWS — each input is a
bounded top-N relation (N = the fusion window, e.g. 100), produced by
retrievers that each do the real distributed work (WAND / IVF pruning).
Ranking a bounded window uses one unpartitioned row_number, which is
exactly right for <= N rows; the fuse itself is a groupBy over
<= N x #rankings rows. Never feed an unbounded relation through
``rrf_fuse`` at scale — cut it to a window first (``window=None`` in
:func:`hybrid_search` is the validation mode that ranks every match;
it exists so small-scale oracles can check the fusion arithmetic
exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(rankings: list[DataFrame], k: int = 10, c: int = 60,
             id_col: str = "doc_id", score_col: str = "score") -> DataFrame:
    """Fuse bounded (id, score) rankings into (doc_id, rrf) top-k.

    Ranks are 1-based row_numbers over (score desc, id asc) — the
    id-ascending tiebreak makes fusion deterministic under score ties
    (pass pre-rounded scores if the oracle rounds). Ties in the fused
    score break doc_id-ascending.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    ranked = [
        r.select(F.col(id_col).cast("long").alias("doc_id"),
                 F.row_number().over(w).alias("rank"))
        for r in rankings
    ]
    allr = ranked[0]
    for r in ranked[1:]:
        allr = allr.unionByName(r)
    return (allr
            .groupBy("doc_id")
            .agg(F.round(F.sum(1.0 / (F.lit(float(c)) + F.col("rank"))),
                         6).alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc("doc_id"))
            .limit(k))


def hybrid_search(index: DataFrame, docs: DataFrame | None, stats: dict,
                  emb: DataFrame, query: str, qvec: list[float],
                  k: int = 10, window: int | None = 100, c: int = 60,
                  vec_col: str = "embedding", vec_id_col: str = "vec_id",
                  round_scores: int | None = 4, **kw) -> DataFrame:
    """BM25 (x) cosine hybrid top-k via RRF. Returns (doc_id, rrf).

    ``emb`` rows are keyed by ``vec_id_col`` == the document id (the
    embedding table is a doc-aligned projection). ``window`` bounds
    each retriever's contribution (None = rank ALL matches / vectors —
    exact, for validation at small scale). ``round_scores`` rounds both
    retrievers' scores before ranking so rank order is reproducible in
    a 4-dp oracle restatement; pass None to rank raw scores. Extra
    ``**kw`` flows to :func:`index_spark.operators.query.search`
    (mode / zone / tombstones / ...).
    """
    from index_spark.operators.query import search
    from index_spark.operators.similarity import _cos_expr

    n_lex = window if window is not None else stats["n_docs"]
    lex = search(index, docs, stats, query, k=n_lex, **kw)
    sem = emb.select(F.col(vec_id_col).cast("long").alias("doc_id"),
                     _cos_expr(vec_col, qvec).alias("score"))
    if window is not None:
        sem = sem.orderBy(F.desc("score"), F.asc("doc_id")).limit(window)
    if round_scores is not None:
        lex = lex.withColumn("score", F.round("score", round_scores))
        sem = sem.withColumn("score", F.round("score", round_scores))
    return rrf_fuse([lex, sem], k=k, c=c)


def comb_fuse(rankings: list[DataFrame], k: int = 10,
              method: str = "sum", id_col: str = "doc_id",
              score_col: str = "score",
              weights: list[float] | None = None) -> DataFrame:
    """CombSUM / CombMNZ score fusion (Fox & Shaw, TREC-2 1994) —
    the score-based alternative to :func:`rrf_fuse`. Returns
    (doc_id, fused) top-k, fused desc / doc_id asc.

    ``weights`` (one per ranking) turns CombSUM into the ES "linear
    retriever": each ranking's min-max-normalized score multiplies its
    weight before the sum (weights compose with ``method='mnz'`` too,
    where the appearance count still counts rankings, not weight).

    Each ranking's scores are min-max normalized to [0, 1] over its
    own window (a degenerate window where min == max normalizes to
    1.0); CombSUM sums the normalized scores, CombMNZ additionally
    multiplies by the number of rankings the doc appears in (rewarding
    retriever agreement). Same bounded-window scale contract as
    :func:`rrf_fuse`: inputs are top-N relations, so the unpartitioned
    min/max window and the fuse groupBy run over ≤ N × #rankings rows.
    """
    if method not in ("sum", "mnz"):
        raise ValueError(f"method must be 'sum' or 'mnz', got {method!r}")
    if not rankings:
        raise ValueError("need at least one ranking")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError("weights must match rankings 1:1")
    w = Window.partitionBy(F.lit(1))
    normed = []
    for i, r in enumerate(rankings):
        s = F.col(score_col).cast("double")
        lo, hi = F.min(s).over(w), F.max(s).over(w)
        wt = F.lit(float(weights[i]) if weights is not None else 1.0)
        normed.append(
            r.select(F.col(id_col).cast("long").alias("doc_id"),
                     (wt * F.when(hi > lo, (s - lo) / (hi - lo))
                      .otherwise(F.lit(1.0))).alias("norm")))
    allr = normed[0]
    for r in normed[1:]:
        allr = allr.unionByName(r)
    fused = F.sum("norm")
    if method == "mnz":
        fused = fused * F.count("norm")
    return (allr.groupBy("doc_id")
            .agg(F.round(fused, 6).alias("fused"))
            .orderBy(F.desc("fused"), F.asc("doc_id"))
            .limit(k))
