"""Link analysis over document/similarity graphs.

PageRank (Page, Brin, Motwani, Winograd 1999) as distributed power
iteration — the centrality pass a curation pipeline runs over a
similarity or link graph (canonical-representative selection, crawl
prioritization, spam demotion).

Scale shape (100 TB): ranks and degrees are node-bounded relations; each
iteration is one shuffle join of edges against ranks on the source key
plus one map-side-combinable groupBy on the destination key.  Dangling
mass rides a one-row aggregate cross join (never collected).  Lineage is
truncated per iteration with localCheckpoint (reliable ``checkpoint()``
on a real cluster).  Fixed iteration count keeps the whole computation
deterministic and SQL-restatable by unrolling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits", "label_propagation"]


def pagerank(nodes: DataFrame, edges: DataFrame, damping: float = 0.85,
             iters: int = 3, id_col: str = "node",
             src_col: str = "src", dst_col: str = "dst",
             round_at: int = 6,
             teleport: DataFrame | None = None) -> DataFrame:
    """(node, rank) after ``iters`` synchronous power-iteration steps from
    the teleport vector.  ``edges`` is directed (symmetrize upstream for an
    undirected similarity graph); nodes with no out-edges contribute their
    mass to the teleport vector (standard dangling-node redistribution),
    so total rank sums to 1 every iteration.

    ``teleport``: optional (``id_col``) seed relation — PERSONALIZED
    PageRank (Haveliwala, WWW 2002; Page et al. 1999 §6): restarts land
    uniformly on the SEED SET instead of the whole graph, ranking every
    node by proximity to the seeds (related-document expansion,
    topic-conditioned authority, spam-neighborhood scoring).  ``None``
    keeps the classic uniform vector.  Seeds outside ``nodes`` are
    ignored; an empty intersection raises.

    Precondition: edge endpoints are drawn from ``nodes``.  An edge from
    an unknown source is ignored (it joins no rank), but it still counts
    toward its source's out-degree if that source IS a node — callers
    with dirty graphs should semi-join edges to nodes on both endpoints
    first.

    Pinned arithmetic contract (shared with the SQL oracle):
    rank' = (1-d)*p + d * (sum_in contrib + dangling*p) with
    p = 1/N (uniform) or 1/|seeds| on the seed set and 0 elsewhere,
    final ranks rounded at ``round_at``.  The teleport vector is a
    node-bounded column, never a collected set.
    """
    n = nodes.select(F.col(id_col).cast("long").alias("node")).distinct()
    e = (edges.select(F.col(src_col).cast("long").alias("u"),
                      F.col(dst_col).cast("long").alias("v"))
         .distinct())
    deg = e.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    n_nodes = n.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))

    if teleport is None:
        # classic uniform vector — keep the EXACT pinned expression
        # ((1-d)/N, dm/N: single-rounded divisions) so existing oracle
        # hashes stay bitwise-stable
        ranks = (n.crossJoin(n_nodes)
                 .select("node", (F.lit(1.0) / F.col("n_nodes"))
                         .alias("r"))
                 .localCheckpoint())
        for _ in range(iters):
            contrib = (e.join(ranks.withColumnRenamed("node", "u"), "u")
                       .join(deg, "u")
                       .groupBy(F.col("v").alias("node"))
                       .agg(F.sum(F.col("r") / F.col("deg")).alias("c")))
            dangling = (ranks.join(deg.withColumnRenamed("u", "node"),
                                   "node", "left_anti")
                        .agg(F.coalesce(F.sum("r"), F.lit(0.0))
                             .alias("dm")))
            ranks = (n.join(contrib, "node", "left")
                     .crossJoin(dangling).crossJoin(n_nodes)
                     .select("node",
                             ((1.0 - damping) / F.col("n_nodes")
                              + damping * (F.coalesce(F.col("c"),
                                                      F.lit(0.0))
                                           + F.col("dm")
                                           / F.col("n_nodes"))
                              ).alias("r"))
                     .localCheckpoint())
        return ranks.select("node", F.round("r", round_at).alias("rank"))

    # materialize the (node-bounded) seed set once: the emptiness
    # probe, the membership join, and the n_seeds aggregate would each
    # re-run the distinct + semi-join subtree otherwise
    seeds = (teleport.select(F.col(id_col).cast("long")
                             .alias("node")).distinct()
             .join(n, "node", "semi")
             .localCheckpoint())
    n_seeds = seeds.agg(F.count(F.lit(1)).cast("double")
                        .alias("n_seeds"))
    if seeds.first() is None:
        raise ValueError("teleport set shares no node with the graph")
    pvec = (n.join(seeds.withColumn("_s", F.lit(1)), "node", "left")
            .crossJoin(n_seeds)
            .select("node",
                    F.when(F.col("_s").isNotNull(),
                           F.lit(1.0) / F.col("n_seeds"))
                    .otherwise(F.lit(0.0)).alias("p"))
            .localCheckpoint())
    ranks = pvec.select("node", F.col("p").alias("r"))
    for _ in range(iters):
        contrib = (e.join(ranks.withColumnRenamed("node", "u"), "u")
                   .join(deg, "u")
                   .groupBy(F.col("v").alias("node"))
                   .agg(F.sum(F.col("r") / F.col("deg")).alias("c")))
        dangling = (ranks.join(deg.withColumnRenamed("u", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")))
        ranks = (pvec.join(contrib, "node", "left")
                 .crossJoin(dangling)
                 .select("node",
                         ((1.0 - damping) * F.col("p")
                          + damping * (F.coalesce(F.col("c"), F.lit(0.0))
                                       + F.col("dm") * F.col("p"))
                          ).alias("r"))
                 .localCheckpoint())
    return ranks.select("node", F.round("r", round_at).alias("rank"))


def hits(edges: DataFrame, iters: int = 2, src_col: str = "src",
         dst_col: str = "dst", round_at: int = 6) -> DataFrame:
    """Kleinberg HITS (hubs and authorities, JACM 1999) as synchronous
    power iteration over a directed edge relation — the link-analysis
    complement to :func:`pagerank` (PageRank ranks endorsement mass;
    HITS separates "points at good pages" from "is pointed at by good
    hubs", the right split for dependency graphs where importers and
    imported live in different populations).

    Returns (node, hub, auth) for every edge endpoint, rounded at
    ``round_at``.

    Pinned arithmetic contract (shared with the SQL oracle): start
    h = 1 on every node; each iteration computes
    ``auth(v) = sum_{u->v} hub(u)`` then L2-normalizes auth, then
    ``hub(u) = sum_{u->v} auth(v)`` then L2-normalizes hub; endpoints
    with no in-edges (resp. out-edges) carry 0.  ``edges`` must be
    non-empty (the norms are then positive).

    Scale shape: identical to :func:`pagerank` — each half-step is one
    shuffle join of edges against a node-bounded score relation plus a
    map-side-combinable groupBy; the L2 norm is a one-row aggregate
    riding a cross join (never collected); lineage truncated per
    iteration with localCheckpoint.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = (edges.select(F.col(src_col).cast("long").alias("u"),
                      F.col(dst_col).cast("long").alias("v"))
         .distinct())
    n = (e.select(F.col("u").alias("node"))
         .union(e.select(F.col("v").alias("node")))
         .distinct())
    h = n.select("node", F.lit(1.0).alias("s")).localCheckpoint()
    a = None
    for _ in range(iters):
        araw = (e.join(h.withColumnRenamed("node", "u"), "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum("s").alias("raw")))
        anorm = araw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))
                         .alias("nrm"))
        a = (n.join(araw, "node", "left").crossJoin(anorm)
             .select("node",
                     (F.coalesce(F.col("raw"), F.lit(0.0))
                      / F.col("nrm")).alias("s"))
             .localCheckpoint())
        hraw = (e.join(a.withColumnRenamed("node", "v"), "v")
                .groupBy(F.col("u").alias("node"))
                .agg(F.sum("s").alias("raw")))
        hnorm = hraw.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))
                         .alias("nrm"))
        h = (n.join(hraw, "node", "left").crossJoin(hnorm)
             .select("node",
                     (F.coalesce(F.col("raw"), F.lit(0.0))
                      / F.col("nrm")).alias("s"))
             .localCheckpoint())
    return (h.withColumnRenamed("s", "hub")
            .join(a.withColumnRenamed("s", "auth"), "node")
            .select("node", F.round("hub", round_at).alias("hub"),
                    F.round("auth", round_at).alias("auth")))


def label_propagation(nodes: DataFrame, pairs: DataFrame, iters: int = 3,
                      id_a: str = "doc_a", id_b: str = "doc_b",
                      id_col: str = "node") -> DataFrame:
    """Synchronous label propagation (Raghavan, Albert & Kumara, Phys.
    Rev. E 2007) over an undirected pair relation -> (node, label):
    community detection for duplicate/similarity graphs — the soft
    complement to :func:`index_spark.operators.dedup.connected_components`
    (components merge through ANY bridge; LP lets a weak bridge keep two
    dense groups apart).

    Pinned deterministic contract (so a SQL engine restates it by
    unrolling iterations):

        label_0(v)   = v
        label_t+1(u) = the label carried by the most neighbors of u at
                       step t (ties -> SMALLEST label); a node with no
                       neighbors keeps its label

    — synchronous updates, fixed ``iters`` (the classic async
    random-order variant is not reproducible across engines).

    Scale shape: per iteration ONE shuffle join of the edge relation
    against the node-bounded label relation plus one map-side-combinable
    groupBy on (node, label); the argmax is a ``max(struct(count,
    -label, label))`` aggregate, never a window over an unbounded key.
    Lineage truncated per iteration with localCheckpoint (reliable
    ``checkpoint()`` on a real cluster).

    Precondition: integral node ids (hash strings with xxhash64
    upstream — a silent cast-to-NULL would wipe assignments, the
    :func:`connected_components` contract).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    for c, df_ in ((id_a, pairs), (id_b, pairs), (id_col, nodes)):
        kind = dict(df_.dtypes)[c]
        if kind not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(
                f"column {c!r} must be integral, got {kind}")
    und = (pairs.select(F.col(id_a).cast("long").alias("u"),
                        F.col(id_b).cast("long").alias("v"))
           .where(F.col("u") != F.col("v")))
    nbr = (und.union(und.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
           .distinct())
    # distinct: a duplicate node id would double that node's vote in
    # every neighbor's argmax AND duplicate its output rows (pagerank's
    # node normalization, same contract)
    lab = (nodes.select(F.col(id_col).cast("long").alias("node"))
           .distinct()
           .select("node", F.col("node").alias("label")))
    for _ in range(iters):
        cnt = (nbr.join(lab.withColumnRenamed("node", "v"), "v")
               .groupBy(F.col("u"), F.col("label"))
               .agg(F.count(F.lit(1)).alias("c")))
        # argmax by (count desc, label asc) as a lexicographic struct
        # max — map-side combinable, no per-node window
        best = (cnt.groupBy(F.col("u").alias("node"))
                .agg(F.max(F.struct(F.col("c"),
                                    (-F.col("label")).alias("neg"),
                                    F.col("label"))).alias("m"))
                .select("node", F.col("m.label").alias("new_label")))
        lab = (lab.join(best, "node", "left")
               .select("node", F.coalesce("new_label", "label")
                       .alias("label"))
               .localCheckpoint())
    return lab.select("node", "label")
