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
                vec_col: str = "embedding", id_col: str = "vec_id",
                restrict: DataFrame | None = None) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos).

    ``restrict``: optional (vec_id) allow-set — FILTERED vector search
    (the vector-DB "knn + metadata filter"): compute any predicate on
    the metadata side, pass its ids here. The allow-set applies as a
    SEMI join BEFORE the O(dim) scoring arithmetic, so a selective
    filter prunes the scan instead of the result — pre-filtering, not
    post-filtering, which also means the top-k is exact over the
    filtered population (a post-filter of an unfiltered top-k can
    return < k survivors). IVF composes the same way: semi-join the
    bucketed codes relation before the probe."""
    src = emb
    if restrict is not None:
        allow = restrict.select(F.col("vec_id").cast("long").alias("_rid")) \
                        .distinct()
        src = emb.join(allow,
                       emb[id_col].cast("long") == allow["_rid"],
                       "semi")
    return (
        src.select(F.col(id_col).alias("vec_id"),
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

    # outer explode: plain explode's inferred size-filter would invoke
    # the bucket-assignment pandas UDF a second (and third) time per
    # row; the probe array is never empty (k >= 1), so the null filter
    # is an exact replacement
    return (emb.withColumn("bucket",
                           F.explode_outer(_buckets(F.col(vec_col))))
            .filter(F.col("bucket").isNotNull()))


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


_KMEANS_PARTIAL_SCHEMA = T.StructType([
    T.StructField("cluster", T.IntegerType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("sums", T.ArrayType(T.DoubleType()), False),
])


def kmeans(emb: DataFrame, k: int = 8, iters: int = 3,
           vec_col: str = "embedding",
           id_col: str = "vec_id") -> tuple[DataFrame, np.ndarray]:
    """Distributed Lloyd's k-means (Lloyd 1982) over an embedding column:
    returns ((vec_id, cluster) assignments, final centroids).

    Deterministic contract (SQL-restatable, pinned by the driver oracle):
    initial centroids are the vectors of the ``k`` smallest ids;
    assignment is argmin Euclidean distance with ties to the lowest
    cluster id; the update is the float64 elementwise mean of assigned
    vectors; an empty cluster keeps its previous centroid. ``iters``
    assign/update rounds run, then the returned assignment is taken
    against the final centroids.

    Scale shape — the part that matters at 100 TB: each iteration is ONE
    map pass (vectorized numpy assignment over Arrow batches) that emits
    at most ``k`` partial rows per batch — (cluster, count, sum-vector),
    the map-side-combine form — followed by a ``k*dim``-row shuffle and a
    ``k*dim``-row collect. Nothing proportional to the corpus ever
    reaches the driver, and the assignment output is a map-only plan
    against closure-captured centroids (``k*dim`` floats). This is the
    full-corpus complement to :func:`train_centroids`'s bounded-sample
    trainer: use the sample trainer to seed IVF, this to converge
    cluster structure over everything (semantic-dedup partitioning,
    curriculum bucketing, IVF refinement)."""
    first = (emb.orderBy(F.col(id_col).asc()).limit(k)
                .select(vec_col).toPandas()[vec_col])
    cents = np.stack(first.to_numpy()).astype(np.float64)
    k = cents.shape[0]  # corpus smaller than k => fewer clusters
    dim = cents.shape[1]

    for _ in range(iters):
        c = cents

        def partials(batches, c=c):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)  # ties -> lowest cluster
                rows = [(int(ci), int((assign == ci).sum()),
                         x[assign == ci].sum(axis=0).tolist())
                        for ci in np.unique(assign)]
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        agg = (emb.select(vec_col)
               .mapInPandas(partials, schema=_KMEANS_PARTIAL_SCHEMA)
               .select("cluster", "n",
                       F.posexplode("sums").alias("pos", "v"))
               .groupBy("cluster", "pos")
               .agg(F.sum("v").alias("sv"), F.sum("n").alias("nt"))
               .collect())  # bounded: k*dim rows
        by: dict[int, dict[int, tuple[float, int]]] = {}
        for r in agg:
            by.setdefault(r.cluster, {})[r.pos] = (r.sv, r.nt)
        nxt = cents.copy()  # empty cluster keeps its centroid
        for ci, m in by.items():
            nxt[ci] = np.array([m[p][0] for p in range(dim)]) / m[0][1]
        cents = nxt

    final = cents

    @F.pandas_udf(T.IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        d2 = ((x[:, None, :] - final[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    out = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                     _assign(F.col(vec_col)).alias("cluster"))
    return out, cents


def tfidf_cosine_pairs(tf_df: DataFrame, n_docs: int,
                       threshold: float = 0.3,
                       max_df_ratio: float = 0.5) -> DataFrame:
    """All-pairs TF-IDF cosine similarity over sparse term vectors:
    (doc_a, doc_b, sim) for pairs with round(sim, 4) >= threshold.

    Vector space (documented, SQL-restatable): sklearn-style smoothed
    idf ``ln((1+n)/(1+df)) + 1``; terms with ``df > max_df_ratio * n``
    are dropped from the space (TfidfVectorizer's ``max_df`` — the
    stop-term prune that also bounds the self-join fan-out, the same
    role PPJoin's prefix filter plays in :mod:`dedup`); weights are
    L2-normalized per doc, so similarity is the dot product over shared
    terms.

    Plan — zero UDFs, every stage codegen: df stats are a
    map-combinable groupBy joined back ON TERM (never broadcast — the
    term dimension is corpus-sized); norms are a groupBy(doc) joined
    back; candidates come from the term self-equi-join (doc_a < doc_b)
    whose partial products sum map-side on (doc_a, doc_b). Both the
    stats join and the pair join shuffle on ``term``, so AQE reuses one
    exchange. Fan-out per term is df² capped by ``max_df_ratio``; for
    high thresholds at extreme scale, DIMSUM sampling (Zadeh &
    Carlsson, 2013) drops in as the candidate stage without changing
    this contract."""
    n = float(n_docs)
    dfs = (tf_df.groupBy("term").agg(F.count("*").alias("df"))
           .where(F.col("df") <= max_df_ratio * n))
    w = tf_df.join(dfs, "term").withColumn(
        "w", F.col("tf").cast("double")
        * (F.log(F.lit(1.0 + n) / (F.col("df") + 1.0)) + 1.0))
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    wn = (w.join(norms, "doc_id")
          .select("term", "doc_id", (F.col("w") / F.col("nrm")).alias("wn")))
    a = wn.select(F.col("doc_id").alias("doc_a"), "term",
                  F.col("wn").alias("wa"))
    b = wn.select(F.col("doc_id").alias("doc_b"), "term",
                  F.col("wn").alias("wb"))
    return (a.join(b, "term").where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 4).alias("sim"))
            .where(F.col("sim") >= threshold)
            .select("doc_a", "doc_b", "sim"))


def semantic_dedup(emb: DataFrame, k: int = 8, iters: int = 2,
                   threshold: float = 0.95,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and dropping near-duplicates
    WITHIN each cluster. Returns one row per input vector:
    (vec_id, cluster, keep) — ``keep`` is false iff some SMALLER id in
    the same cluster has round(cosine, 4) >= ``threshold`` (the engine's
    keep-first convention, same as MinHash/SimHash dedup).

    Composition, not new machinery: :func:`kmeans` supplies the
    candidate buckets (clusters), :func:`embedding_near_dup_pairs`
    supplies the within-bucket exact pair kernel. Scale shape: the
    all-pairs cost is cluster-local — at corpus scale ``k`` grows so
    cluster sizes stay bounded (SemDeDup's own recipe), candidate
    generation never goes quadratic in the corpus, and the keep verdict
    is a distinct + left-anti join on the pair relation's right side.
    Cross-cluster near-dups at boundaries are missed by construction —
    the documented SemDeDup trade (paper §3)."""
    assigns, _ = kmeans(emb, k=k, iters=iters, vec_col=vec_col,
                        id_col=id_col)
    bucketed = (emb.select(F.col(id_col).cast("long").alias("vec_id"),
                           vec_col)
                .join(assigns.withColumnRenamed("cluster", "bucket"),
                      "vec_id"))
    pairs = embedding_near_dup_pairs(bucketed, threshold=threshold,
                                     vec_col=vec_col, id_col="vec_id")
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct() \
                   .withColumn("dup", F.lit(True))
    return (bucketed.join(dropped, "vec_id", "left")
            .select("vec_id", F.col("bucket").alias("cluster"),
                    F.coalesce(~F.col("dup"), F.lit(True)).alias("keep")))


def _pair_cos_expr(va: str, vb: str, digits: int) -> F.Column:
    """round(cosine(va, vb), digits) as a pure JVM fold over two vector
    columns — the ONE pairwise-cosine expression every pair kernel
    (k-means-bucket, SRP-band, MMR sim matrix) shares, so a policy
    change (zero-norm guard, cast) lands everywhere at once."""
    dot = F.aggregate(F.zip_with(va, vb, lambda a, b: a.cast("double") * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(
        F.transform(va, lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(
        F.transform(vb, lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    return F.round(dot / (na * nb), digits)


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
    return (
        pairs.withColumn("cos", _pair_cos_expr("va", "vb", 4))
        .where(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def quantize_bounds(emb: DataFrame, vec_col: str = "embedding"
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global (min, max) over an embedding column — the
    training pass of int8 scalar quantization (FAISS ``SQ8`` family).

    One posexplode + map-side-combinable min/max aggregate: the shuffle
    carries at most ``partitions x dim`` partial rows and the collect is
    ``dim`` rows — metadata-scale, same bounded-collect contract as
    k-means centroids. Returns (lo, hi) float64 arrays of length dim."""
    rows = (emb.select(F.posexplode(vec_col).alias("i", "x"))
               .groupBy("i")
               .agg(F.min(F.col("x").cast("double")).alias("lo"),
                    F.max(F.col("x").cast("double")).alias("hi"))
               .orderBy("i").collect())
    lo = np.array([r["lo"] for r in rows], dtype=np.float64)
    hi = np.array([r["hi"] for r in rows], dtype=np.float64)
    return lo, hi


def scalar_quantize(emb: DataFrame, lo: np.ndarray, hi: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id"
                    ) -> DataFrame:
    """Encode vectors to int8-range codes: (vec_id, codes array<int>).

    ``code_i = clamp(floor((x_i - lo_i) / (hi_i - lo_i) * 255), 0, 255)``
    (a constant dimension — ``hi == lo`` — encodes 0). Pure JVM codegen
    (two chained ``zip_with`` against dim-bounded literal arrays, no
    UDF): at 100 TB this is the map-only pass that shrinks a float32
    corpus 4x, which is the difference between an in-memory and a
    spilled ANN scan. The arithmetic is plain IEEE-754 double ops in a
    pinned operand order, so any engine reproduces the codes bit-for-bit
    (the driver oracle restates it in DuckDB)."""
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    rng_a = F.array(*[F.lit(float(h) - float(l)) for l, h in zip(lo, hi)])
    d = F.zip_with(F.col(vec_col), lo_a, lambda x, l: x.cast("double") - l)
    codes = F.zip_with(
        d, rng_a,
        lambda dv, r: F.when(r <= 0, F.lit(0)).otherwise(
            F.least(F.lit(255), F.greatest(F.lit(0), F.floor(
                dv / r * 255).cast("int")))))
    return emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      codes.alias("codes"))


def sq_topk(codes_df: DataFrame, lo: np.ndarray, hi: np.ndarray,
            qvec: list[float], k: int = 10, rerank: int = 0,
            emb: DataFrame | None = None, vec_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """Cosine top-k over scalar-quantized codes: (vec_id, cos).

    Each code dequantizes to its cell midpoint
    ``lo_i + (code_i + 0.5) * (hi_i - lo_i) / 256`` and scores against
    the query with the same JVM ``zip_with``/``aggregate`` arithmetic as
    the exact path — a map-only scan over the 4x-smaller codes table.

    ``rerank > 0`` is the standard two-stage serve: take the top
    ``rerank`` candidates by quantized score (ordered by rounded score
    then vec_id, so the cut is deterministic), join their FULL vectors
    back from ``emb`` (a k-row-bounded equi-join), and return the exact
    cosine top-k of that pool — quantization then costs recall only if
    the true top-k falls outside the candidate pool."""
    if rerank and emb is None:
        raise ValueError("rerank > 0 needs the full-precision `emb` table")
    # zip_with is binary; fold (codes, lo, rng) as two zips: first
    # midpoint offset (code+0.5)*rng/256, then shift by lo per dimension
    rng_a = F.array(*[F.lit((float(h) - float(l)) / 256.0)
                      for l, h in zip(lo, hi)])
    lo_a = F.array(*[F.lit(float(v)) for v in lo])
    mid = F.zip_with(F.col("codes"), rng_a,
                     lambda c, r: (c.cast("double") + 0.5) * r)
    dq = F.zip_with(mid, lo_a, lambda m, l: m + l)
    q = np.asarray(qvec, dtype=np.float64)
    nq = float(np.sqrt((q * q).sum()))
    q_a = F.array(*[F.lit(float(v)) for v in q])
    dot = F.aggregate(F.zip_with(dq, q_a, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(dq, lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    scored = codes_df.select("vec_id",
                             F.round(dot / (nv * F.lit(nq)), 4).alias("cos"))
    if not rerank:
        return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    pool = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(rerank) \
                 .select("vec_id")
    exact = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                       F.round(_cos_expr(vec_col, list(map(float, qvec))),
                               4).alias("cos"))
    return (pool.join(exact, "vec_id")
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


_PQ_PARTIAL_SCHEMA = T.StructType([
    T.StructField("sub", T.IntegerType(), False),
    T.StructField("cluster", T.IntegerType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("sums", T.ArrayType(T.DoubleType()), False),
])


def pq_train(emb: DataFrame, m: int = 4, k: int = 8, iters: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id"
             ) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, FAISS ``PQ``):
    the vector space splits into ``m`` contiguous subspaces and each
    learns its own ``k``-centroid Lloyd's codebook. Returns float64
    ``(m, k, dim/m)``.

    Same deterministic contract as :func:`kmeans`, per subspace (the
    driver oracle restates it in SQL): seeds are the ``k`` smallest
    ids' subvectors, argmin ties go to the lowest cluster, updates are
    float64 means, an empty cluster keeps its centroid.

    Scale shape: ALL ``m`` subspace trainings fuse into ONE map pass
    per iteration — each Arrow batch emits at most ``m*k`` partial rows
    (sub, cluster, count, sum-vector) — followed by an ``m*k*dim/m``-row
    shuffle + collect. Nothing corpus-sized reaches the driver."""
    first = (emb.orderBy(F.col(id_col).asc()).limit(k)
                .select(vec_col).toPandas()[vec_col])
    seeds = np.stack(first.to_numpy()).astype(np.float64)
    k_eff, dim = seeds.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    cents = seeds.reshape(k_eff, m, dsub).transpose(1, 0, 2).copy()

    for _ in range(iters):
        c = cents

        def partials(batches, c=c):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                xs = x.reshape(len(x), m, dsub)
                rows = []
                for s in range(m):
                    d2 = ((xs[:, s, None, :] - c[s][None, :, :]) ** 2
                          ).sum(axis=2)
                    assign = np.argmin(d2, axis=1)  # ties -> lowest
                    rows.extend(
                        (s, int(ci), int((assign == ci).sum()),
                         xs[assign == ci, s].sum(axis=0).tolist())
                        for ci in np.unique(assign))
                yield pd.DataFrame(
                    rows, columns=["sub", "cluster", "n", "sums"])

        agg = (emb.select(vec_col)
               .mapInPandas(partials, schema=_PQ_PARTIAL_SCHEMA)
               .select("sub", "cluster", "n",
                       F.posexplode("sums").alias("pos", "v"))
               .groupBy("sub", "cluster", "pos")
               .agg(F.sum("v").alias("sv"), F.sum("n").alias("nt"))
               .collect())  # bounded: m*k*dsub rows
        by: dict = {}
        for r in agg:
            by.setdefault((r.sub, r.cluster), {})[r.pos] = (r.sv, r.nt)
        nxt = cents.copy()  # empty cluster keeps its centroid
        for (s, ci), mm in by.items():
            nxt[s, ci] = (np.array([mm[p][0] for p in range(dsub)])
                          / mm[0][1])
        cents = nxt
    return cents


def pq_encode(emb: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> DataFrame:
    """Encode vectors to PQ codes: (vec_id, codes array<int>, one code
    per subspace — ``m`` bytes of payload per vector at rest, a 32x
    shrink for float32/m=dim/8). Map-only Arrow pass; argmin ties to
    the lowest cluster (the training contract)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = cb.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        xs = x.reshape(len(x), m, dsub)
        out = np.empty((len(x), m), np.int32)
        for s in range(m):
            d2 = ((xs[:, s, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    return emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      _enc(F.col(vec_col)).alias("codes"))


def pq_topk(codes_df: DataFrame, codebooks: np.ndarray,
            qvec: list[float], k: int = 10, rerank: int = 0,
            emb: DataFrame | None = None, vec_col: str = "embedding",
            id_col: str = "vec_id") -> DataFrame:
    """Euclidean top-k over PQ codes via the asymmetric distance
    computation (ADC): (vec_id, approx_d2).

    The query is NOT quantized — a driver-side ``m x k`` lookup table
    holds the exact squared distance from each query subvector to each
    codebook centroid, and a vector's approximate distance is the sum
    of its ``m`` table cells. The scan is pure JVM codegen — the LUT
    rides as a nested array literal and ``zip_with`` pairs each code
    with its subspace's row (``element_at`` does the cell lookup), so
    scoring is map-only with no shuffle before the top-k cut. At 100 TB
    that is a full-corpus scan over ``m`` bytes per vector with zero
    Python and zero exchanges.

    ``rerank > 0``: two-stage serve — top ``rerank`` ADC candidates
    (deterministic cut: exact approx_d2 then vec_id), exact distances
    joined back from ``emb`` (candidate-bounded), exact top-k of the
    pool. Same contract as :func:`sq_topk`."""
    if rerank and emb is None:
        raise ValueError("rerank > 0 needs the full-precision `emb` table")
    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = cb.shape
    q = np.asarray(qvec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != m*dsub {m * dsub}")
    scored = codes_df.select(F.col("vec_id"),
                             _adc_d2_expr(cb, qvec).alias("_d2"))
    if not rerank:
        return (scored.orderBy(F.asc("_d2"), F.asc("vec_id")).limit(k)
                .select("vec_id", F.round("_d2", 4).alias("approx_d2")))
    pool = (scored.orderBy(F.asc("_d2"), F.asc("vec_id")).limit(rerank)
            .select("vec_id"))
    qa = F.array(*[F.lit(float(v)) for v in q])
    exact = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.aggregate(F.zip_with(F.col(vec_col), qa,
                               lambda a, b: (a.cast("double") - b)
                               * (a.cast("double") - b)),
                    F.lit(0.0), lambda acc, x: acc + x).alias("_d2"))
    return (pool.join(exact, "vec_id")
            .orderBy(F.asc("_d2"), F.asc("vec_id")).limit(k)
            .select("vec_id", F.round("_d2", 4).alias("d2")))


def _adc_d2_expr(codebooks: np.ndarray, qvec: list[float]) -> F.Column:
    """ADC squared distance over a ``codes`` column as a pure JVM
    expression: the m x k query LUT rides as a nested array literal,
    ``zip_with`` pairs each code with its subspace's row,
    ``element_at`` does the cell lookup (see :func:`pq_topk`)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = cb.shape
    q = np.asarray(qvec, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != m*dsub {m * dsub}")
    lut = ((q.reshape(m, dsub)[:, None, :] - cb) ** 2).sum(axis=2)
    lut_a = F.array(*[F.array(*[F.lit(float(lut[s, c])) for c in range(kk)])
                      for s in range(m)])
    cell = F.zip_with(F.col("codes"), lut_a,
                      lambda code, row: F.element_at(row, code + 1))
    return F.aggregate(cell, F.lit(0.0), lambda acc, x: acc + x)


def ivf_pq_index(emb: DataFrame, centroids: np.ndarray,
                 codebooks: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """The FAISS ``IVF,PQ`` at-rest table in ONE Arrow pass:
    (vec_id, bucket, codes) — coarse bucket assignment (cosine-nearest
    centroid, :func:`assign_buckets`' metric) and PQ codes computed
    together, so the 100-TB index build is a single map-only scan of
    the float corpus. Write it ``partitionBy("bucket")`` and the probe
    filter prunes partitions at serve time.

    Centroids are L2-normalized here, so the assignment is TRUE cosine
    nearest (``assign_buckets``' metric) whether the caller passes
    :func:`train_centroids` output (already unit-norm) or :func:`kmeans`
    output (raw Euclidean means — an unnormalized argmax-dot would bias
    buckets toward large-norm centroids)."""
    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True) \
        .clip(min=1e-12)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = cb.shape

    def _index(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xn = x / np.linalg.norm(x, axis=1, keepdims=True).clip(min=1e-12)
            bucket = np.argmax(xn @ cents.T, axis=1).astype(np.int32)
            xs = x.reshape(len(x), m, dsub)
            codes = np.empty((len(x), m), np.int32)
            for s in range(m):
                d2 = ((xs[:, s, None, :] - cb[s][None, :, :]) ** 2).sum(2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].astype("int64"),
                "bucket": bucket,
                "codes": list(codes)})

    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("codes", T.ArrayType(T.IntegerType()), False),
    ])
    return emb.select(id_col, vec_col).mapInPandas(_index, schema=schema)


def ivf_pq_topk(index_df: DataFrame, centroids: np.ndarray,
                codebooks: np.ndarray, qvec: list[float], k: int = 10,
                nprobe: int = 4, rerank: int = 0,
                emb: DataFrame | None = None,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """FAISS ``IVF,PQ`` serving: probe the ``nprobe`` cosine-nearest
    coarse buckets (same metric as the build assignment), then ADC over
    ONLY those buckets' codes — a bucket-pruned, map-only, JVM-codegen
    scan over m ints per vector. ``nprobe >= n_buckets`` degenerates to
    :func:`pq_topk` exactly (how the driver oracle value-checks it;
    pruned recall is measured, not oracled). ``rerank``: exact top-k of
    the deterministic top-``rerank`` ADC pool, joined from ``emb``.
    Probe selection normalizes centroids like :func:`ivf_pq_index`, so
    probe order is cosine order regardless of centroid norms; scoring
    after the bucket filter IS :func:`pq_topk`."""
    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True) \
        .clip(min=1e-12)
    q = np.asarray(qvec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(cents @ qn), kind="stable")
    probe = [int(b) for b in order[: min(nprobe, len(cents))]]
    pruned = index_df.filter(F.col("bucket").isin(probe))
    return pq_topk(pruned, codebooks, qvec, k=k, rerank=rerank, emb=emb,
                   vec_col=vec_col, id_col=id_col)


# ------------------------------------------------------------- SRP-LSH

def srp_signs(dim: int, n_planes: int, seed: str = "srp") -> np.ndarray:
    """Deterministic Rademacher (±1) hyperplanes for sign-random-
    projection LSH (Charikar, STOC 2002 — the same family as SimHash,
    here over a DENSE embedding column instead of a sparse term
    vector). Component (p, d) is +1 iff the first hex nibble of
    md5("{seed}:{p}:{d}") is < 8 — no RNG, so signatures are
    reproducible across engines/partitionings and SQL-restatable
    (DuckDB computes the identical md5)."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            out[p, d] = 1.0 if int(h[0], 16) < 8 else -1.0
    return out


def srp_signatures(emb: DataFrame, n_planes: int = 16, band_bits: int = 4,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   seed: str = "srp") -> DataFrame:
    """(vec_id, band, band_val) — banded sign-random-projection
    signature rows, the LSH bucket keys for :func:`srp_near_dup_pairs`.

    Bit p = [dot(v, plane_p) >= 0]; planes are the deterministic
    Rademacher vectors of :func:`srp_signs`; bits group into
    ``n_planes / band_bits`` bands of ``band_bits`` bits (band value =
    little-endian bit pack). Two vectors at angle θ agree on a bit
    with probability 1 − θ/π, so near-duplicates collide in ≥1 band
    with high probability while the candidate join stays bucket-local.

    Scale shape: the signature pass is MAP-ONLY JVM codegen (one
    ``aggregate``/``zip_with`` fold per plane over literal sign
    arrays — no Python, no shuffle), then a bounded ×n_bands explode.
    This is the embedding analogue of the term-MinHash banding in
    operators/dedup.py, and the scale path past the k-means-bucket
    trade of :func:`semantic_dedup` (k-means buckets miss
    cross-cluster boundary pairs; SRP bands are position-free)."""
    if n_planes % band_bits != 0:
        raise ValueError("n_planes must be a multiple of band_bits")
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding relation")
    dim = first["d"]  # bounded one-row action, like the centroid seeds
    signs = srp_signs(dim, n_planes, seed=seed)

    def dot(p: int) -> F.Column:
        lits = F.array(*[F.lit(float(s)) for s in signs[p]])
        return F.aggregate(
            F.zip_with(vec_col, lits, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)

    n_bands = n_planes // band_bits
    bits = [F.when(dot(p) >= 0, F.lit(1)).otherwise(F.lit(0))
            for p in range(n_planes)]
    bands = []
    for b in range(n_bands):
        val = F.lit(0)
        for i in range(band_bits):
            val = val + bits[b * band_bits + i] * F.lit(1 << i)
        bands.append(F.struct(F.lit(b).alias("band"),
                              val.cast("int").alias("band_val")))
    return (emb.select(F.col(id_col).cast("long").alias("vec_id"),
                       F.explode(F.array(*bands)).alias("bb"))
            .select("vec_id", F.col("bb.band").alias("band"),
                    F.col("bb.band_val").alias("band_val")))


def srp_near_dup_pairs(emb: DataFrame, n_planes: int = 16,
                       band_bits: int = 4, threshold: float = 0.9,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       seed: str = "srp") -> DataFrame:
    """(vec_a, vec_b, cos) — embedding near-duplicate pairs via banded
    SRP-LSH candidate generation + exact cosine verification.

    Candidates are pairs sharing ≥1 (band, band_val) bucket (an
    equi-join on the signature relation — never all-pairs); the exact
    cosine then filters to round(cos, 4) >= ``threshold``. Like every
    LSH family, pairs colliding in NO band are missed by construction
    (raise ``n_planes`` / lower ``band_bits`` to trade cost for
    recall)."""
    sigs = srp_signatures(emb, n_planes=n_planes, band_bits=band_bits,
                          vec_col=vec_col, id_col=id_col, seed=seed)
    vecs = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.col(vec_col).alias("_v"))
    cand = (sigs.alias("a").join(sigs.alias("b"), ["band", "band_val"])
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"))
            .dropDuplicates(["vec_a", "vec_b"]))
    pairs = (cand
             .join(vecs.withColumnRenamed("vec_id", "vec_a")
                       .withColumnRenamed("_v", "va"), "vec_a")
             .join(vecs.withColumnRenamed("vec_id", "vec_b")
                       .withColumnRenamed("_v", "vb"), "vec_b"))
    return (pairs.withColumn("cos", _pair_cos_expr("va", "vb", 4))
            .where(F.col("cos") >= threshold)
            .select("vec_a", "vec_b", "cos"))


def srp_bits_df(emb: DataFrame, n_planes: int = 16,
                vec_col: str = "embedding", id_col: str = "vec_id",
                seed: str = "srp",
                _signs: np.ndarray | None = None) -> DataFrame:
    """(vec_id, bits) — the SRP signature packed into ONE little-endian
    integer bitmask per vector (bit p = [dot(v, plane_p) >= 0]); the
    at-rest form of a binary embedding index (one signed long, so up to
    63 planes). Map-only JVM codegen, like :func:`srp_signatures`.
    ``_signs``: a precomputed plane matrix (callers that already probed
    the dimension skip the one-row probe and the md5 regeneration)."""
    if not 1 <= n_planes <= 63:
        raise ValueError("n_planes must be in 1..63 for a long bitmask")
    if _signs is not None:
        signs = _signs
    else:
        first = emb.select(F.size(vec_col).alias("d")).first()
        if first is None:
            raise ValueError("empty embedding relation")
        signs = srp_signs(first["d"], n_planes, seed=seed)

    def dot(p: int) -> F.Column:
        lits = F.array(*[F.lit(float(s)) for s in signs[p]])
        return F.aggregate(
            F.zip_with(vec_col, lits, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)

    bits = F.lit(0).cast("long")
    for p in range(n_planes):
        bits = bits + F.when(dot(p) >= 0,
                             F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long"))
    return emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      bits.alias("bits"))


def srp_hamming_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                     n_planes: int = 16, vec_col: str = "embedding",
                     id_col: str = "vec_id", seed: str = "srp",
                     rerank: int | None = None,
                     restrict: DataFrame | None = None) -> DataFrame:
    """Binary-signature ANN (FAISS ``IndexBinaryFlat`` shape): rank by
    hamming distance between each vector's SRP bitmask and the query's
    — E[hamming] = n_planes·θ/π, so hamming order approximates angular
    order at 1 bit per plane. Returns (vec_id, hamming) top-k (hamming
    asc, vec_id asc), or (vec_id, hamming, cos) when ``rerank=c``:
    exact cosine re-orders the top-c hamming candidates (the standard
    binary-prefilter + exact-rerank serving stack).

    ``restrict``: optional (vec_id) allow-set, semi-joined BEFORE the
    bitmask scan (pre-filter, same contract as :func:`cosine_topk`).

    Plan: bitmask scan is map-only codegen, the distance is one
    ``bit_count(bits ^ q)`` per row (no per-dimension arithmetic at
    query time — the point of a binary index), and the cut is
    TakeOrderedAndProject."""
    signs = srp_signs(len(qvec), n_planes, seed=seed)
    q = np.asarray(qvec, dtype=np.float64)
    qbits = 0
    for p in range(n_planes):
        if float(signs[p] @ q) >= 0:
            qbits |= 1 << p
    src = emb
    if restrict is not None:
        allow = restrict.select(F.col("vec_id").cast("long")
                                .alias("_rid")).distinct()
        src = emb.join(allow, emb[id_col].cast("long") == allow["_rid"],
                       "semi")
    scored = (srp_bits_df(src.select(F.col(id_col), F.col(vec_col)),
                          n_planes=n_planes, vec_col=vec_col,
                          id_col=id_col, seed=seed, _signs=signs)
              .select("vec_id",
                      F.bit_count(F.col("bits").bitwiseXOR(
                          F.lit(qbits).cast("long"))).cast("long")
                      .alias("hamming")))
    if rerank is None:
        return scored.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(k)
    cand = scored.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(rerank)
    # join FIRST, cosine after — same reasoning as bbq_topk: keep the
    # O(d) exact rerank on the c candidate rows, not the whole relation
    vecs = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.col(vec_col).alias("_vv"))
    return (cand.join(vecs, "vec_id")
            .select("vec_id", "hamming",
                    F.round(_cos_expr("_vv", [float(x) for x in qvec]),
                            4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def mmr_rerank(emb: DataFrame, qvec: list[float], k: int = 5,
               window: int = 20, lam: float = 0.7,
               vec_col: str = "embedding", id_col: str = "vec_id",
               restrict: DataFrame | None = None) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR 1998) — the "don't return five copies of the same
    result" rerank: greedily select k results maximizing

        mmr(c) = lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)

    where rel = cosine(query, c) and sim = cosine(c, s). Returns
    (vec_id, mmr_rank, rel, mmr_score); the first pick's score is its
    relevance (empty selected set), ties break vec_id-ascending.

    Scale contract (the Vespa/ES second-phase-rerank shape): ALL O(dim)
    arithmetic is distributed JVM codegen — the relevance window is
    :func:`cosine_topk` (round 4) and the pairwise similarity matrix is
    a window-local self-join (round 6, <= window² rows). Only the
    greedy selection — pure comparisons plus one multiply-subtract per
    candidate per step over the ROUNDED bounded matrix — runs on the
    driver, which is what makes the whole rerank SQL-restatable
    value-for-value (identical IEEE ops on identical rounded inputs).
    Never feed an unbounded relation: ``window`` bounds the collect."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    if k > window:
        raise ValueError("k must be <= window")
    rel_df = cosine_topk(emb, qvec, k=window, vec_col=vec_col,
                         id_col=id_col, restrict=restrict)
    w = (emb.select(F.col(id_col).cast("long").alias("vec_id"),
                    F.col(vec_col).alias("_v"))
         .join(rel_df.select("vec_id"), "vec_id", "semi"))
    a = w.select(F.col("vec_id").alias("_a"), F.col("_v").alias("_va"))
    b = w.select(F.col("vec_id").alias("_b"), F.col("_v").alias("_vb"))
    sims = (a.join(b, F.col("_a") != F.col("_b"))
            .select(F.col("_a"), F.col("_b"),
                    _pair_cos_expr("_va", "_vb", 6).alias("_sim")))

    rel = {r["vec_id"]: r["cos"] for r in rel_df.collect()}  # <= window
    sim = {(r["_a"], r["_b"]): r["_sim"]
           for r in sims.collect()}  # <= window^2
    remaining = sorted(rel)
    selected: list[tuple[int, float]] = []
    for _ in range(min(k, len(remaining))):
        if not selected:
            pick = max(remaining, key=lambda c: (rel[c], -c))
            score = rel[pick]
        else:
            def mmr(c):
                worst = max(sim[(c, s)] for s, _ in selected)
                return lam * rel[c] - (1.0 - lam) * worst
            pick = max(remaining, key=lambda c: (mmr(c), -c))
            score = mmr(pick)
        selected.append((pick, score))
        remaining.remove(pick)
    spark = emb.sparkSession
    rows = [(int(v), i + 1, float(rel[v]), round(float(s), 6))
            for i, (v, s) in enumerate(selected)]
    return spark.createDataFrame(
        rows, "vec_id long, mmr_rank long, rel double, mmr_score double")


# ------------------------------------------------- Matryoshka serving

def mrl_topk(emb: DataFrame, qvec: list[float], dim: int, k: int = 10,
             rerank_candidates: int = 0, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Matryoshka-style truncated-dimension serving (Kusupati et al.,
    NeurIPS 2022 — MRL embeddings nest lower-dimensional
    representations in their prefixes): rank by cosine over the FIRST
    ``dim`` dimensions only, the cheap first pass every
    adaptive-retrieval stack runs; with ``rerank_candidates = c > 0``,
    the truncated pass keeps its top-c (deterministic (cos4, id)
    cut, the sq_topk/pq_topk rerank contract) and the FULL-dimension
    exact cosine reranks those c rows to the final top-k.

    Scale shape: the truncated pass reads ``dim/full_dim`` of the
    vector bytes per row when embeddings are stored dimension-sliced
    (here: slice() inside the fold, arithmetic drops by the same
    ratio); both passes are map-only JVM folds + TakeOrderedAndProject
    — no exchange, no UDF; the rerank's O(full_dim) arithmetic runs on
    c rows, not the corpus. Returns (vec_id, cos) — cos is the
    truncated cosine without rerank, the full cosine with."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    if not qvec:
        raise ValueError("qvec must be non-empty")
    if dim > len(qvec):
        # zip_with would NULL-pad the shorter side and every cosine
        # would fold to NULL — k arbitrary rows instead of an error
        raise ValueError(f"dim {dim} exceeds query dimension "
                         f"{len(qvec)}")
    qt = [float(x) for x in qvec[:dim]]
    sliced = F.slice(F.col(vec_col), 1, dim)
    dot = F.aggregate(
        F.zip_with(sliced, F.array(*[F.lit(x) for x in qt]),
                   lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(
        F.transform(sliced, lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.sum(np.asarray(qt, dtype=np.float64) ** 2)))
    tcos = F.round(dot / (nv * F.lit(nq)), 4)
    first = (emb.select(F.col(id_col).alias("vec_id"),
                        F.col(vec_col).alias("_v"),
                        tcos.alias("cos"))
             .orderBy(F.desc("cos"), F.asc("vec_id")))
    if rerank_candidates <= 0:
        return first.select("vec_id", "cos").limit(k)
    cand = first.limit(max(rerank_candidates, k))
    full = [float(x) for x in qvec]
    return (cand.select("vec_id",
                        F.round(_cos_expr("_v", full), 4).alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id"))
            .limit(k))


_PCA_PARTIAL_SCHEMA = T.StructType([
    T.StructField("idx", T.LongType(), False),
    T.StructField("val", T.DoubleType(), False),
])


def pca_top_component(emb: DataFrame, vec_col: str = "embedding",
                      iters: int = 3, round_at: int = 4) -> DataFrame:
    """Top principal component of the embedding cloud via ONE
    distributed pass + driver-side power iteration — the corpus-level
    "dominant direction" statistic (drift monitoring, whitening,
    anisotropy checks for the ANN family).

    Distributed shape: each Arrow batch reduces to (1 + d + d²) moment
    partials — count, Σx, and the flattened Gram Σxxᵀ — emitted as
    (idx, val) rows and summed by ONE bounded groupBy (≤ batches·d²
    rows into d²+d+1 out), so the driver collects exactly d²+d+1
    doubles no matter the corpus size.  The d×d covariance
    ``(G − s·sᵀ/n)/(n−1)`` (sample semantics) then takes ``iters``
    power-iteration mat-vecs from the fixed start ``1/√d`` — all
    driver-side numpy on a tiny matrix, fully deterministic (no random
    init).  Sign convention: the component with the largest |loading|
    (lowest dim on ties) is made positive.

    Returns (dim 1-based, loading, eigval) — eigval is the Rayleigh
    quotient vᵀCv after the final iteration, the variance captured by
    the component."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    d = emb.select(F.size(vec_col).alias("d")).first()["d"]

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            vals = np.concatenate(
                [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()])
            yield pd.DataFrame({
                "idx": np.arange(vals.size, dtype=np.int64),
                "val": vals})

    moments = (emb.select(vec_col)
               .mapInPandas(partials, schema=_PCA_PARTIAL_SCHEMA)
               .groupBy("idx").agg(F.sum("val").alias("val"))
               .collect())
    flat = np.zeros(1 + d + d * d)
    for r in moments:
        flat[r.idx] = r.val
    n, s, g = flat[0], flat[1:1 + d], flat[1 + d:].reshape(d, d)
    if n < 2:
        raise ValueError("pca_top_component needs at least 2 rows")
    cov = (g - np.outer(s, s) / n) / (n - 1.0)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = cov @ v
        v = w / np.linalg.norm(w)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    eig = float(v @ cov @ v)
    spark = emb.sparkSession
    rows = [(i + 1, round(float(v[i]), round_at), round(eig, round_at))
            for i in range(d)]
    return spark.createDataFrame(
        rows, "dim int, loading double, eigval double")


def reshape_token_vectors(emb: DataFrame, n_tokens: int,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Deterministically reshape a flat ``dim``-float embedding into
    ``n_tokens`` contiguous sub-vectors of ``dim / n_tokens`` floats —
    the (vec_id, token_vecs array<array<double>>) relation a
    late-interaction (multi-vector) index stores per document.

    Pure Catalyst (``transform`` over a ``sequence`` of slice starts),
    map-only. Raises if the probed ``dim`` is not divisible by
    ``n_tokens`` — integer slice arithmetic would otherwise silently
    DROP the trailing ``dim mod n_tokens`` components of every vector.
    """
    if n_tokens < 1:
        raise ValueError("n_tokens must be >= 1")
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is not None and int(first["d"]) % n_tokens != 0:
        raise ValueError(
            f"dim {first['d']} not divisible by n_tokens {n_tokens}: "
            "the reshape would silently truncate trailing components")
    sub = (F.size(F.col(vec_col)) / n_tokens).cast("int")
    tok_vecs = F.transform(
        F.sequence(F.lit(0), F.lit(int(n_tokens)) - 1),
        lambda j: F.transform(
            F.slice(F.col(vec_col), j * sub + 1, sub),
            lambda x: x.cast("double")))
    return emb.select(F.col(id_col).alias("vec_id"),
                      tok_vecs.alias("token_vecs"))


def maxsim_topk(tokvecs: DataFrame, query_vecs: list[list[float]],
                k: int = 10, vec_col: str = "token_vecs",
                id_col: str = "vec_id", round_at: int = 4) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) top-k — the scoring rule
    behind multi-vector retrieval (Khattab & Zaharia SIGIR'20; the ES
    8.18 ``rank_vectors`` field serves the same shape):

        score(q, d) = sum over query vectors q_i of
                      max over doc token vectors t_j of  <q_i, t_j>

    Each query vector keeps only its best-matching document token
    (the "max" interaction); the query's vectors then sum.

    Plan shape: the query vectors are LITERALS riding the expression
    tree, so the whole score is one map-only whole-stage-codegen pass
    over the multi-vector relation (``transform``/``zip_with``/
    ``aggregate`` — no UDF, no explode, no shuffle) followed by a k-row
    TakeOrderedAndProject. At 100 TB the scan is embarrassingly
    parallel and the driver sees k rows. Dot products are raw inner
    products (ColBERT's convention: vectors arrive normalized if cosine
    is wanted).

    Returns (vec_id, score) with (score desc, vec_id asc) pinned ties.
    """
    if not query_vecs:
        raise ValueError("maxsim_topk needs at least one query vector")
    per_q = []
    for qv in query_vecs:
        q = F.array(*[F.lit(float(x)) for x in qv])
        dots = F.transform(
            F.col(vec_col),
            lambda tv: F.aggregate(
                F.zip_with(tv, q, lambda a, b: a.cast("double") * b),
                F.lit(0.0), lambda acc, x: acc + x))
        per_q.append(F.array_max(dots))
    score = per_q[0]
    for c in per_q[1:]:
        score = score + c
    return (tokvecs.select(F.col(id_col).alias("vec_id"),
                           F.round(score, round_at).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def bbq_encode(emb: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """1-bit-per-dimension binary quantization of an embedding relation
    — the at-rest form of a "better binary quantization" (BBQ /
    RaBitQ-style, Gao & Long, SIGMOD 2024) vector index: per vector,
    the SIGN BIT of every component packed 32 dims per long word, plus
    the two scalar correction factors the asymmetric estimator needs.

    Returns (vec_id, words: array<long>, l1: double, norm: double)
    where bit j of words[w] = [x_{32w+j} >= 0], l1 = sum |x_i|,
    norm = ||x||_2. Unlike :func:`srp_bits_df` (random hyperplanes,
    symmetric hamming), the bits live in the ORIGINAL basis so the
    float query can score them asymmetrically with no decode.

    Map-only JVM codegen — at 100 TB this is a projection, d/8 bytes +
    16 bytes per vector at rest (32x smaller than float32)."""
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding relation")
    d = int(first["d"])
    words = []
    for w in range((d + 31) // 32):
        bits = F.lit(0).cast("long")
        for j in range(min(32, d - 32 * w)):
            bits = bits + F.when(
                F.element_at(F.col(vec_col), 32 * w + j + 1) >= 0,
                F.lit(1 << j).cast("long")).otherwise(
                F.lit(0).cast("long"))
        words.append(bits)
    absum = F.aggregate(
        F.transform(F.col(vec_col), lambda a: F.abs(a.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)
    sqsum = F.aggregate(
        F.transform(F.col(vec_col), lambda a: a.cast("double") * a),
        F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.array(*words).alias("words"),
                      absum.alias("l1"),
                      F.sqrt(sqsum).alias("norm"),
                      # stored encode dimension: word count alone
                      # cannot distinguish dims within the same
                      # 32-dim word (8-dim vs 16-dim codes both pack
                      # one word) — the serve-path ragged guard
                      # checks this column
                      F.size(F.col(vec_col)).cast("int").alias("dim"))


def bbq_topk(emb: DataFrame, qvec: list[float], k: int = 10,
             oversample: int = 5, vec_col: str = "embedding",
             id_col: str = "vec_id",
             restrict: DataFrame | None = None,
             codes: DataFrame | None = None) -> DataFrame:
    """Asymmetric binary-quantized ANN (the Elasticsearch-8.16 "BBQ"
    serving shape): the float query scores each vector's 1-bit code
    directly — no symmetric hashing of the query — then the top
    ``oversample * k`` estimated candidates are rescored with exact
    cosine over the raw vectors.

    Pinned estimator (the classic 1-bit reconstruction x_hat =
    (||x||_1 / d) * sign(x), so any SQL engine restates it):

        dot_hat = (l1 / d) * sum_i q_i * (2*bit_i - 1)
        est     = round(dot_hat / (norm * ||q||), 6)

    Candidates rank by (est desc, vec_id asc) — the 6-decimal round is
    part of the contract so the cut is reproducible across engines —
    and the final answer is (vec_id, est, cos) top-k by exact cosine
    (4-decimal, vec_id tiebreak). ``restrict``: optional (vec_id)
    allow-set semi-joined BEFORE the code scan (pre-filter, the
    :func:`cosine_topk` contract). ``codes``: a precomputed
    :func:`bbq_encode` relation (the at-rest index; when absent the
    codes derive inline from ``emb``).

    Plan: code scan is map-only codegen over d/32 long words; only
    oversample*k candidate rows join back to the float vectors, so at
    100 TB the raw-vector relation is touched for a few dozen rows per
    query instead of scanned."""
    d = len(qvec)
    q = np.asarray(qvec, dtype=np.float64)
    qnorm = float(np.sqrt(q @ q))
    if qnorm == 0:
        raise ValueError("zero query vector")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    # dimension guard (the mrl_topk pattern): a mismatched query would
    # read a bit subset in the estimator and NULL-pad the exact-cosine
    # zip_with in the rerank — k arbitrary rows instead of an error.
    # The first() probes catch the whole-relation mismatch cheaply;
    # RAGGED relations (later rows at a different dim) are caught by
    # the row-level raise_error guards on the scan and rerank below.
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding relation")
    if int(first["d"]) != d:
        raise ValueError(f"query dimension {d} != embedding dimension "
                         f"{int(first['d'])}")
    if codes is not None:
        if "dim" in codes.columns:
            cw = codes.select("dim").first()
            if cw is not None and int(cw["dim"]) != d:
                raise ValueError(
                    f"codes were encoded at a different dimension: "
                    f"{int(cw['dim'])} != {d} expected")
        else:
            cw = codes.select(F.size("words").alias("nw")).first()
            if cw is not None and int(cw["nw"]) != (d + 31) // 32:
                raise ValueError(
                    f"codes were encoded at a different dimension: "
                    f"{int(cw['nw'])} words != {(d + 31) // 32} expected")
    src = emb
    if restrict is not None:
        allow = restrict.select(F.col("vec_id").cast("long")
                                .alias("_rid")).distinct()
        src = emb.join(allow, emb[id_col].cast("long") == allow["_rid"],
                       "semi")
    if codes is None:
        codes = bbq_encode(src.select(F.col(id_col), F.col(vec_col)),
                           vec_col=vec_col, id_col=id_col)
    elif restrict is not None:
        codes = codes.join(
            restrict.select(F.col("vec_id").cast("long").alias("_rid"))
                    .distinct(),
            codes["vec_id"] == F.col("_rid"), "semi")
    # sum_i q_i * (2*bit_i - 1), emitted in ascending-i literal order so
    # the oracle's identical term order reproduces the float sum
    sdot = F.lit(0.0)
    for i in range(d):
        w, j = divmod(i, 32)
        bit = F.shiftright(F.element_at("words", w + 1), j) \
               .bitwiseAND(F.lit(1).cast("long"))
        sdot = sdot + F.when(bit == 1, F.lit(float(q[i]))) \
                       .otherwise(F.lit(-float(q[i])))
    est = F.round((F.col("l1") / F.lit(float(d))) * sdot
                  / (F.col("norm") * F.lit(qnorm)), 6)
    nwords = (d + 31) // 32
    # row-level ragged guard: prefer the stored encode dim (exact);
    # codes written before that column existed fall back to the word
    # count, which only catches mismatches crossing a 32-dim boundary
    if "dim" in codes.columns:
        ragged = F.col("dim") != d
        detail = F.col("dim").cast("string")
        expect = f" dims, expected {d}"
    else:
        ragged = F.size("words") != nwords
        detail = F.size("words").cast("string")
        expect = f" words, expected {nwords}"
    ragged_code = F.when(
        ragged,
        F.raise_error(F.concat(
            F.lit("ragged codes relation: row with "), detail,
            F.lit(expect)))) \
        .otherwise(est)
    cand = (codes.select("vec_id", ragged_code.alias("est"))
            .orderBy(F.desc("est"), F.asc("vec_id"))
            .limit(int(oversample) * k))
    # join FIRST, cosine after: the O(d) exact arithmetic runs on the
    # oversample*k joined rows only, never the full relation (a
    # pre-join projection would be evaluated for every vector)
    vecs = emb.select(F.col(id_col).cast("long").alias("vec_id"),
                      F.col(vec_col).alias("_vv"))
    cosv = F.when(
        F.size("_vv") != d,
        F.raise_error(F.concat(
            F.lit("ragged embedding relation: row with "),
            F.size("_vv").cast("string"),
            F.lit(f" dims, expected {d}")))) \
        .otherwise(F.round(_cos_expr("_vv", [float(x) for x in qvec]), 4))
    return (cand.join(vecs, "vec_id")
            .select("vec_id", "est", cosv.alias("cos"))
            .orderBy(F.desc("cos"), F.asc("vec_id")).limit(k))


def rocchio_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                 r: int = 5, nr: int = 5, alpha: float = 1.0,
                 beta: float = 0.75, gamma: float = 0.15,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """Rocchio pseudo-relevance feedback over the embedding relation
    (Rocchio 1971; the vector-space analog of the RM3 lexical PRF in
    operators/query.py): run the query once, treat the top ``r`` hits
    as pseudo-relevant and the NEXT ``nr`` (ranks r+1..r+nr) as
    pseudo-non-relevant, move the query

        q' = alpha*q + beta*mean(rel) - gamma*mean(nonrel)

    and return the exact cosine top-k under q'. Classic PRF sets
    gamma=0; the rank-window negative set makes gamma>0 restatable
    without judgments.

    Pinned selection contract: the feedback window ranks by cosine
    ROUNDED to 6 decimals (vec_id tiebreak) so the rel/nonrel sets are
    reproducible across engines; q' itself is computed driver-side
    from the r+nr collected vectors (bounded rows — never the corpus)
    and re-enters the scan as literals, so the final pass is the same
    map-only codegen as :func:`cosine_topk`. Two scans total."""
    if r < 1 or nr < 0:
        raise ValueError("need r >= 1 pseudo-relevant and nr >= 0 "
                         "pseudo-non-relevant docs")
    window = (emb.select(F.col(id_col).cast("long").alias("vec_id"),
                         F.col(vec_col).alias("_v"),
                         F.round(_cos_expr(vec_col, qvec), 6)
                          .alias("_c"))
              .orderBy(F.desc("_c"), F.asc("vec_id"))
              .limit(r + nr)
              .collect())
    if len(window) < r:
        raise ValueError(f"feedback window has {len(window)} rows, "
                         f"need at least r={r}")
    q = np.asarray(qvec, dtype=np.float64)
    rel = np.asarray([row["_v"] for row in window[:r]], dtype=np.float64)
    q2 = alpha * q + beta * rel.mean(axis=0)
    non = window[r:r + nr]
    if non:
        nonrel = np.asarray([row["_v"] for row in non], dtype=np.float64)
        q2 = q2 - gamma * nonrel.mean(axis=0)
    if not np.any(q2):
        raise ValueError("feedback collapsed the query to the zero "
                         "vector; lower gamma")
    return cosine_topk(emb, [float(x) for x in q2], k=k,
                       vec_col=vec_col, id_col=id_col)
