"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators beyond the reference's scope (the
reference only near-dups token text): approximate-nearest-neighbor over
an embedding column.

- ``cosine_topk``: brute-force exact baseline — JVM-side arithmetic only
  (``F.zip_with`` + ``F.aggregate``), no Python in the scoring path, so
  Catalyst/codegen own the hot loop. Embarrassingly parallel: score is a
  map, top-k is a partial ``takeOrdered``-style global sort of per-row
  scalars.
- ``ivf_topk``: the 100-TB path — IVF (inverted-file) bucketing: k-means-
  lite centroids from a deterministic sample, every vector assigned to
  its nearest centroid at build time (one pandas UDF pass), queries probe
  only the ``nprobe`` nearest buckets => scan cost drops by
  ``n_buckets/nprobe``. Same contract as FAISS IVF-Flat, relational
  execution: bucket pruning is a partition-pruned filter.
- ``embedding_near_dup_pairs``: embedding-cosine near-dup detection via
  the same IVF buckets (candidate pairs share a bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cos_expr(vec_col: str, qvec: list[float]) -> F.Column:
    """cosine(vec, qvec) as a pure JVM expression (codegen'd, no UDF)."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (nv * F.lit(nq))


def cosine_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos)."""
    return (
        emb.select(F.col(id_col).alias("vec_id"),
                   F.round(_cos_expr(vec_col, qvec), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def train_centroids(emb: DataFrame, n_buckets: int = 16, iters: int = 5,
                    sample: int = 4096, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """k-means-lite on a deterministic SPREAD sample.

    Rows are ranked by a hash of their id (TakeOrderedAndProject — each
    task keeps ``sample`` rows, no full sort), so the sample draws from
    the whole corpus rather than the first ids (which could all share a
    label/shard and skew every centroid). Centroid training is
    metadata-scale (n_buckets x dim floats); only the sample leaves the
    executors.
    """
    rows = (emb.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
               .limit(sample)
               .select(vec_col).toPandas()[vec_col])
    x = np.stack(rows.to_numpy())
    x = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
    cents = x[:: max(1, len(x) // n_buckets)][:n_buckets].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def assign_buckets(emb: DataFrame, centroids: np.ndarray,
                   vec_col: str = "embedding",
                   n_assign: int = 1) -> DataFrame:
    """Add ``bucket`` = nearest-centroid id(s) (one Arrow UDF pass).

    ``n_assign > 1`` is build-side multi-probe: each vector lands in its
    top-``n_assign`` buckets (row replicated), so near-dup candidate
    generation no longer misses pairs straddling a centroid boundary —
    two vectors within the near-dup threshold almost surely share one of
    their top-2 buckets. Storage cost is the replication factor;
    consumers producing pairs must de-duplicate (embedding_near_dup_pairs
    does)."""
    cents = centroids.astype(np.float64)

    if n_assign <= 1:
        @F.pandas_udf(T.IntegerType())
        def _bucket(vecs: pd.Series) -> pd.Series:
            x = np.stack(vecs.to_numpy()).astype(np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
            return pd.Series(np.argmax(x @ cents.T, axis=1).astype(np.int32))

        return emb.withColumn("bucket", _bucket(F.col(vec_col)))

    k = min(n_assign, len(cents))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        x = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
        sims = x @ cents.T
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k].astype(np.int32)
        return pd.Series(list(top))

    return emb.withColumn("bucket", F.explode(_buckets(F.col(vec_col))))


def ivf_topk(bucketed: DataFrame, centroids: np.ndarray, qvec: list[float],
             k: int = 10, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """ANN top-k probing only the nprobe nearest buckets.

    At rest the bucketed table is partitioned by ``bucket``, so the filter
    prunes partitions and the scan touches nprobe/n_buckets of the data.
    """
    q = np.asarray(qvec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ qn))
    probe = [int(b) for b in order[:nprobe]]
    return (
        bucketed.where(F.col("bucket").isin(probe))
        .select(F.col(id_col).alias("vec_id"),
                F.round(_cos_expr(vec_col, qvec), 4).alias("cos"))
        # build-side multi-probe (assign_buckets n_assign>1) replicates a
        # vector into several buckets; dedup before the top-k or the
        # replicas crowd out distinct results (cos is identical across
        # replicas, so any one row is correct)
        .dropDuplicates(["vec_id"])
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(bucketed: DataFrame, threshold: float = 0.95,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """(vec_a, vec_b, cos) for same-bucket pairs with cosine >= threshold.

    Bucket-local self-join: candidate generation never goes quadratic in
    the corpus, only within buckets (the LSH-style trade: cross-bucket
    near-dups at the boundary are missed unless nprobe-style multi-assign
    is added)."""
    l = bucketed.select(F.col(id_col).alias("vec_a"), F.col("bucket"),
                        F.col(vec_col).alias("va"))
    r = bucketed.select(F.col(id_col).alias("vec_b"), F.col("bucket"),
                        F.col(vec_col).alias("vb"))
    pairs = l.join(r, "bucket").where(F.col("vec_a") < F.col("vec_b")) \
             .dropDuplicates(["vec_a", "vec_b"])  # multi-assign overlap
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a.cast("double") * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("va", lambda a: a.cast("double") * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("vb", lambda a: a.cast("double") * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    return (
        pairs.withColumn("cos", F.round(dot / (na * nb), 4))
        .where(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )
