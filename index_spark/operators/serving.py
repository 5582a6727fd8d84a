"""Driver/worker-resident serving replica — the sub-100ms point-lookup
path for interactive traffic.

Why this exists (round-4 finding, BENCH r04): a Spark job per query has
a ~0.1 s driver floor (job submit + task launch + Py4J round trips), so
thread-pool QPS through the DataFrame path is driver-dispatch-bounded —
it does NOT scale with executor cores (0.21 efficiency 8->32 threads).
That is an architecture property, not a kernel property: at 100 TB the
standard search deployment splits BUILD (Spark, this repo's operators)
from SERVING (a fleet of stateless replicas, each holding one shard
range of the published index in memory).  ``ServingReplica`` is that
serving node: it loads its partition's posting lists once (pre-decoded
numpy columns), then answers top-k BM25 queries in-process — no Spark
job, no scheduler, no Py4J — with scores IDENTICAL to
:func:`~index_spark.operators.query.search` (pytest-pinned, same df /
idf / saturation / tie order).

Scale shape: one replica holds ONE shard range (``shard_range``) — at
10^12 docs a fleet of replicas each loads ``index.filter(shard
BETWEEN lo AND hi)`` from the published parquet and a router fans out /
merges top-k (k-row responses).  Memory is the partition's decoded
postings (~16 B/posting); ``champion_m`` caps it harder by keeping only
each term's top-m postings by tf (champion lists, Manning IIR §7.1.2 —
approximate: a doc can only rank through terms where it is a champion;
exact again when m >= the partition's max df).  QPS scales with
PROCESSES (each replica is plain numpy; bench.py measures the 8 vs 32
process-fleet ratio), which is the north-rule scaling story for the
serving half.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import index_spark.functions.varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import DOC_MARKER

K1, B = 1.2, 0.75


class ServingReplica:
    """In-memory top-k BM25 over one shard range of a built index."""

    def __init__(self, terms: dict[str, tuple[np.ndarray, np.ndarray]],
                 dfs: dict[str, int], n_docs: int, avgdl: float,
                 stem: bool = True, camel: bool = True,
                 positions: dict[str, tuple[np.ndarray, np.ndarray]]
                 | None = None):
        self._terms = terms          # term -> (doc_ids, precomputed sat)
        self._dfs = dfs              # term -> GLOBAL df (idf input)
        self._pos = positions        # term -> (per-occurrence doc, pos)
        self._pos_cap = (max((int(p.max()) for _, p in positions.values()
                              if p.size), default=0) + 34
                         if positions else 0)
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.stem = stem
        self.camel = camel
        self.nbytes = sum(d.nbytes + s.nbytes
                          for d, s in terms.values())
        if positions:
            self.nbytes += sum(d.nbytes + p.nbytes
                               for d, p in positions.values())

    # -- construction ----------------------------------------------------

    @classmethod
    def from_index(cls, index: DataFrame, stats: dict,
                   shard_range: tuple[int, int] | None = None,
                   champion_m: int | None = None,
                   stem: bool = True, camel: bool = True,
                   positions: bool = False,
                   zone: str | None = None) -> "ServingReplica":
        """Load (and pre-decode) one shard range of the index.

        The load is ONE bounded collect of this replica's partition —
        the deployment move a serving node makes once at startup, not a
        per-query driver hop.  ``stats`` must be the build's stats
        (n_docs / avgdl are CORPUS-global even when the replica holds a
        slice).  ``champion_m``: keep only the top-m postings of each
        term by (tf desc, doc_id asc) — bounded-memory approximate mode.
        ``positions=True`` (requires a positions build; incompatible
        with champion_m) additionally loads per-occurrence ordinals so
        :meth:`phrase` answers exact-phrase point queries in-memory."""
        if positions and champion_m is not None:
            raise ValueError("positions replicas cannot truncate lists "
                             "(champion_m) — phrase matches need every "
                             "occurrence")
        if "zone" in index.columns:
            # a zoned index holds one row set PER zone; loading rows
            # across zones would silently merge their postings — pin
            # one zone (and pass that zone's stats)
            from index_spark.operators.query import pin_zone

            index = pin_zone(index, zone)
        part = index
        gdfs: dict[str, int] | None = None
        if shard_range is not None:
            lo, hi = shard_range
            part = part.filter(F.col("shard").between(lo, hi))
            # idf needs the CORPUS-global df, not this partition's
            # share: one metadata-only aggregate over the full index,
            # semi-pruned to the partition's terms (in deployment the
            # replica reads these from the published term dictionary)
            gdfs = {r["term"]: int(r["df_g"]) for r in
                    index.filter(F.col("term") != DOC_MARKER)
                    .join(part.select("term").distinct(), "term", "semi")
                    .groupBy("term").agg(F.sum("df").alias("df_g"))
                    .collect()}
        cols = ["term", "df", "doc_blob", "tf_blob", "dl_blob"]
        if positions:
            cols.append("pos_blob")
        rows = part.select(*cols).collect()
        n_docs = float(stats.get("n_docs") or 0)
        avgdl = float(stats.get("avgdl") or 0)
        if n_docs <= 0 or avgdl <= 0:
            raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                             "positive")
        by_term: dict[str, list] = {}
        for r in rows:
            if r["term"] == DOC_MARKER:
                continue
            docs = np.cumsum(vb.decode(r["doc_blob"])).astype(np.int64)
            tfs = vb.decode(r["tf_blob"]).astype(np.float64)
            dls = vb.decode(r["dl_blob"]).astype(np.float64)
            occ = None
            if positions:
                from index_spark.operators.phrase import decode_positions

                if r["pos_blob"] is None or len(r["pos_blob"]) == 0:
                    raise ValueError(
                        "positions=True needs a positions build "
                        f"(term {r['term']!r} has no pos_blob)")
                pos = decode_positions(bytes(r["tf_blob"]),
                                       bytes(r["pos_blob"]))
                occ = (np.repeat(docs, tfs.astype(np.int64)), pos)
            by_term.setdefault(r["term"], []).append((docs, tfs, dls,
                                                     int(r["df"]), occ))
        terms: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        poss: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        dfs: dict[str, int] = {}
        for term, parts in by_term.items():
            docs = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            order = np.argsort(docs, kind="stable")
            docs, tfs, dls = docs[order], tfs[order], dls[order]
            dfs[term] = (gdfs[term] if gdfs is not None
                         else sum(p[3] for p in parts))   # global df
            if champion_m is not None and docs.size > champion_m:
                # top-m by (tf desc, doc_id asc): lexsort on (-tf, doc)
                sel = np.lexsort((docs, -tfs))[:champion_m]
                sel.sort()
                docs, tfs, dls = docs[sel], tfs[sel], dls[sel]
            # tf saturation is query-independent: precompute it once at
            # load so a query is one weighted segment-sum
            sat = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))
            terms[term] = (docs, sat)
            if positions:
                od = np.concatenate([p[4][0] for p in parts])
                op = np.concatenate([p[4][1] for p in parts])
                oo = np.lexsort((op, od))
                poss[term] = (od[oo], op[oo])
        return cls(terms, dfs, n_docs, avgdl, stem=stem, camel=camel,
                   positions=poss if positions else None)

    # -- snapshot --------------------------------------------------------

    def save(self, path: str) -> dict:
        """Publish the replica as one ``.npz`` snapshot (+ its scalar
        stats): the build side writes this once; serving nodes then
        boot with :meth:`load` and NO Spark dependency at all.  Arrays
        are concatenated per kind with a term offset table, so the file
        holds a handful of large arrays instead of 2x|vocab| tiny
        ones."""
        import json as _json

        terms = sorted(self._terms)
        offs = np.zeros(len(terms) + 1, np.int64)
        for i, t in enumerate(terms):
            offs[i + 1] = offs[i] + self._terms[t][0].size
        docs = (np.concatenate([self._terms[t][0] for t in terms])
                if terms else np.empty(0, np.int64))
        sat = (np.concatenate([self._terms[t][1] for t in terms])
               if terms else np.empty(0))
        np.savez_compressed(
            path, docs=docs, sat=sat, offsets=offs,
            dfs=np.array([self._dfs[t] for t in terms], np.int64))
        meta = {"terms": terms, "n_docs": self.n_docs,
                "avgdl": self.avgdl, "stem": self.stem,
                "camel": self.camel}
        with open(path + ".meta.json", "w") as f:
            _json.dump(meta, f)
        return {"terms": len(terms), "postings": int(offs[-1])}

    @classmethod
    def load(cls, path: str) -> "ServingReplica":
        """Boot a replica from a :meth:`save` snapshot — pure
        numpy/json, no SparkSession (the serving-node startup path)."""
        import json as _json

        with open(path + ".meta.json") as f:
            meta = _json.load(f)
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        docs, sat, offs, dfa = (z["docs"], z["sat"], z["offsets"],
                                z["dfs"])
        terms = {}
        dfs = {}
        for i, t in enumerate(meta["terms"]):
            lo, hi = int(offs[i]), int(offs[i + 1])
            terms[t] = (docs[lo:hi], sat[lo:hi])
            dfs[t] = int(dfa[i])
        return cls(terms, dfs, meta["n_docs"], meta["avgdl"],
                   stem=meta["stem"], camel=meta["camel"])

    # -- serving ---------------------------------------------------------

    def _weight(self, term: str) -> float:
        df = self._dfs.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10,
               qterms: list[str] | None = None, mode: str = "or"
               ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), identical contract to the DataFrame
        :func:`search`: dedup-sorted query terms, BM25 with global df,
        ties broken (score desc, doc_id asc).  ``mode='and'``: only
        docs containing EVERY query term score (a term absent from the
        replica's partition empties the result, the engine's
        short-circuit); the candidate intersection starts from the
        rarest list, the conjunctive-kernel cost shape."""
        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        terms = sorted(set(qterms if qterms is not None
                           else tokenize(query, stem=self.stem,
                                         camel=self.camel)))
        if mode == "and" and terms and not all(t in self._terms
                                               for t in terms):
            return []
        lists = [(t, self._terms[t]) for t in terms if t in self._terms]
        if not lists:
            return []
        docs = np.concatenate([d for _, (d, _) in lists])
        contrib = np.concatenate(
            [self._weight(t) * s for t, (_, s) in lists])
        uniq, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(uniq.size)
        np.add.at(scores, inv, contrib)
        if mode == "and" and len(lists) > 1:
            cand = lists[np.argmin([d.size for _, (d, _) in lists])][1][0]
            for _, (d, _) in lists:
                cand = cand[np.isin(cand, d, assume_unique=True)]
                if cand.size == 0:
                    return []
            keep = np.isin(uniq, cand, assume_unique=True)
            uniq, scores = uniq[keep], scores[keep]
        if k >= uniq.size:
            top = np.lexsort((uniq, -scores))
        else:
            part = np.argpartition(-scores, k - 1)[:k]
            top = part[np.lexsort((uniq[part], -scores[part]))]
        return [(int(uniq[i]), float(scores[i])) for i in top[:k]]

    def search_batch(self, queries: dict, k: int = 10
                     ) -> dict[object, list[tuple[int, float]]]:
        return {qid: self.search(q, k=k) for qid, q in queries.items()}

    def phrase(self, phrase: str, k: int = 10) -> list[tuple[int, int]]:
        """Top-k exact-phrase matches (doc_id, n_matches) — the same
        contract as :func:`~index_spark.operators.phrase.phrase_search`
        (pure occurrence-count ranking, ties (n desc, doc asc)) and the
        same composite-key m-way intersection, run in-process over the
        replica's pre-decoded occurrence arrays."""
        if self._pos is None:
            raise ValueError("replica loaded without positions=True")
        qterms = tokenize(phrase, stem=self.stem, camel=self.camel)
        if not qterms:
            return []
        if len(qterms) > 32:
            raise ValueError("phrase longer than 32 tokens")
        if any(t not in self._pos for t in qterms):
            return []
        cap = self._pos_cap
        keys: np.ndarray | None = None
        for i, t in enumerate(qterms):
            docs, pos = self._pos[t]
            adj = pos - i
            ok = adj >= 0
            kk = docs[ok] * cap + adj[ok]
            keys = kk if keys is None else np.intersect1d(
                keys, kk, assume_unique=True)
            if keys.size == 0:
                return []
        ud, cnt = np.unique(keys // cap, return_counts=True)
        top = np.lexsort((ud, -cnt))[:k]
        return [(int(ud[i]), int(cnt[i])) for i in top]


def merge_topk(partials: list[list[tuple[int, float]]], k: int = 10
               ) -> list[tuple[int, float]]:
    """Router-side merge of per-replica top-ks (k rows per replica —
    the bounded fan-in of a sharded serving fleet)."""
    allrows = [r for p in partials for r in p]
    return heapq.nsmallest(k, allrows, key=lambda r: (-r[1], r[0]))
