"""Query engine: top-k BM25, document-at-a-time with block-max WAND.

The reference snapshot has no ranker (SURVEY.md §3.4); the pinned spec is
Robertson/Zaragoza BM25 (k1=1.2, b=0.75) + Ding & Suel block-max WAND
(SIGIR'11), scores summed in ascending term order so results are
bit-comparable to the single-threaded oracle (tests/oracle.py).

(The exhaustive, conjunctive and restricted kernels share the pinned
ascending-(term, zone) sum order bit-for-bit; the MaxScore/WAND kernel
is deterministic but may differ in the final ulp — see its docstring.)

Distributed shape: the sharded index aligns every term's postings on the
same global doc_id ranges (build.py), so each shard holds *all* query
terms' postings for its doc range — document-at-a-time scoring
parallelizes per shard with no cross-shard traffic, and doc lengths ride
in the index itself (dl_blob), so the query plan is:

  index.filter(term IN qterms)        # term-pruned columnar scan
    -> groupBy('shard').applyInPandas(DAAT WAND -> local top-k)
    -> orderBy(score desc, doc_id asc).limit(k)   # tiny global merge

Exactly ONE shuffle of a few small rows per query; no join against the
docs dimension. At 10^12 docs each task scores one bounded doc range and
the global merge moves only num_shards_with_hits * k rows.

Block upper bounds are derived query-side from the stored (max_tf,
min_dl): ub = idf * max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)), valid
because the BM25 term contribution is increasing in tf and decreasing in
dl. idf uses the exact global df = sum of shard dfs of the term.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import B, K1

TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])

def pin_zone(index: DataFrame, zone: str | None) -> DataFrame:
    """Pin a zoned index to ONE zone for single-zone query paths.

    A zoned index carries independent per-zone posting lists for the
    same term; summing them under global stats silently inflates scores
    (use :func:`zone_search` for weighted multi-zone scoring). The
    pinned zone is validated with a pushed-filter limit-1 probe — cheap
    at any scale — so a typo'd/absent zone fails loudly instead of
    returning empty results or zeroed statistics."""
    if "zone" not in index.columns:
        return index
    z = zone or "body"
    pinned = index.filter(F.col("zone") == z)
    if pinned.isEmpty() and not index.isEmpty():
        zones = sorted(r["zone"] for r in index.select("zone")
                       .distinct().collect())
        raise ValueError(
            f"zone {z!r} not present in this zoned index (zones: {zones}); "
            "pass zone=... or use zone_search for weighted multi-zone")
    return pinned


def _ub(tf, dl, idf: float, avgdl: float):
    """BM25 upper bound for a (max_tf, min_dl) pair (scalar or ndarray)."""
    return idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _decode_lists(pdf: pd.DataFrame, avgdl: float):
    """Decode a shard's rows -> per-term (docs, tfs, dls, block arrays).

    Rows may carry a per-row ``avgdl`` column (zoned indexes: each zone
    has its own doc-length distribution); absent that, the global scalar
    applies. The sum order is pinned by (term, zone) so zoned scoring
    stays deterministic."""
    lists = []
    has_avgdl = "avgdl" in pdf.columns
    has_zone = "zone" in pdf.columns
    for row in pdf.itertuples(index=False):
        docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
        tfs = vb.decode(row.tf_blob).astype(np.int64)
        dls = vb.decode(row.dl_blob).astype(np.float64)
        idf = float(row.idf)
        l_avgdl = float(row.avgdl) if has_avgdl else avgdl
        blk_last = np.fromiter((b["last_doc"] for b in row.blocks), np.int64)
        blk_ub = _ub(
            np.fromiter((b["max_tf"] for b in row.blocks), np.float64),
            np.fromiter((b["min_dl"] for b in row.blocks), np.float64),
            idf, l_avgdl)
        sort_key = (row.term, row.zone if has_zone else "")
        lists.append((sort_key, docs, tfs, dls, idf, blk_last, blk_ub,
                      l_avgdl))
    lists.sort(key=lambda x: x[0])  # ascending (term, zone) = pinned order
    return lists


def _score_shard_exhaustive(pdf: pd.DataFrame, avgdl: float, k: int,
                            excl: list[dict] | None = None,
                            banned: np.ndarray | None = None,
                            allowed: np.ndarray | None = None,
                            boost: tuple[np.ndarray, np.ndarray] | None = None,
                            after: tuple[float, int] | None = None,
                            min_match: int | None = None,
                            req: tuple[np.ndarray, np.ndarray] | None = None
                            ) -> pd.DataFrame:
    """Vectorized exhaustive DAAT over one shard (numpy scatter-add).

    ``excl``: optional exclusion-list metadata (:func:`_lists_meta`
    rows); docs present in ANY exclusion list are dropped BEFORE the
    top-k cut, probed block-targeted at the scored docs only.
    ``banned``: optional sorted doc_id array (tombstoned deletes),
    likewise dropped before the cut.
    ``allowed``: optional sorted doc_id allow-set (restricted search) —
    candidates outside it drop before the cut; a doc's score is
    unchanged by the restriction (same full-query BM25 sum).
    ``min_match``: minimum number of DISTINCT query terms a doc must
    contain to rank (Lucene/ES minimum_should_match); a doc's score
    stays the full sum over its present terms. A term split across
    merged doc-range segment rows counts once (rows of one term cover
    disjoint doc ranges, so a doc hits at most one of them).
    ``req``: per-doc thresholds (ES ``terms_set`` with
    ``minimum_should_match_field``) as (sorted doc_ids, required) —
    a doc ranks only if listed AND its distinct-term count >= its own
    required value; exclusive with ``min_match``."""
    lists = _decode_lists(pdf, avgdl)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    lo = min(int(l[1][0]) for l in lists)
    hi = max(int(l[1][-1]) for l in lists)
    acc = np.zeros(hi - lo + 1, dtype=np.float64)
    nmatch = (np.zeros(hi - lo + 1, dtype=np.int32)
              if min_match is not None or req is not None else None)
    for _, docs, tfs, dls, idf, _, _, l_avgdl in lists:
        acc[docs - lo] += idf * tfs / (tfs + K1 * (1.0 - B + B * dls / l_avgdl))
        if nmatch is not None:
            nmatch[docs - lo] += 1
    nz = np.flatnonzero(acc)
    if nz.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    docs_out, scores_out = nz + lo, acc[nz]
    if min_match is not None:
        keep = nmatch[nz] >= min_match
        docs_out, scores_out = docs_out[keep], scores_out[keep]
        if docs_out.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
    elif req is not None:
        r_ids, r_vals = req
        nm_out = nmatch[nz]
        if r_ids.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        pos = np.minimum(np.searchsorted(r_ids, docs_out), r_ids.size - 1)
        keep = (r_ids[pos] == docs_out) & (nm_out >= r_vals[pos])
        docs_out, scores_out = docs_out[keep], scores_out[keep]
        if docs_out.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
    if allowed is not None:
        if allowed.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        pos = np.minimum(np.searchsorted(allowed, docs_out),
                         allowed.size - 1)
        keep = allowed[pos] == docs_out
        docs_out, scores_out = docs_out[keep], scores_out[keep]
        if docs_out.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
    if excl or (banned is not None and banned.size):
        docs_out, scores_out = _apply_exclusions(
            docs_out, scores_out, excl, banned)
        if docs_out.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
    if boost is not None:
        scores_out = _apply_boost(docs_out, scores_out, boost)
    if after is not None:
        docs_out, scores_out = _apply_cursor(docs_out, scores_out, after)
    return _topk_frame(docs_out, scores_out, k)


def _apply_boost(cand: np.ndarray, scores: np.ndarray,
                 boost: tuple[np.ndarray, np.ndarray]) -> np.ndarray:
    """Multiply each candidate's score by its boost weight (docs absent
    from the boost relation keep weight 1.0). ``boost`` = (sorted
    doc_id array, aligned weights) — applied BEFORE the top-k cut, so a
    boosted doc outside the unboosted top-k can still enter."""
    b_ids, b_w = boost
    if b_ids.size == 0:
        return scores
    pos = np.minimum(np.searchsorted(b_ids, cand), b_ids.size - 1)
    sel = b_ids[pos] == cand
    out = scores.copy()
    out[sel] *= b_w[pos[sel]]
    return out


def _apply_cursor(cand: np.ndarray, scores: np.ndarray,
                  after: tuple[float, int]
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Deep-pagination cursor: keep only docs STRICTLY after
    ``(score, doc_id)`` in (score desc, doc_id asc) rank order. Scores
    are bitwise-reproducible (pinned ascending-term summation), so the
    equality arm is exact — no epsilon."""
    s, d = after
    keep = (scores < s) | ((scores == s) & (cand > d))
    return cand[keep], scores[keep]


def _apply_exclusions(cand: np.ndarray, scores: np.ndarray,
                      excl: list[dict] | None,
                      banned: np.ndarray | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Drop candidates present in any exclusion list (term-level NOT) or
    in the sorted ``banned`` doc_id array (tombstoned deletes). Exclusion
    lists are probed block-targeted at the candidate docs only (the same
    byte-offset machinery as scoring probes) — an exclusion term's full
    postings are never decoded, no matter how common the term."""
    order = np.argsort(cand, kind="stable")  # _probe needs sorted docs
    cand_s = cand[order]
    keep_s = np.ones(cand_s.size, dtype=bool)
    for mt in (excl or []):
        hit, _ = _probe(mt, cand_s, _ListCache(mt))
        keep_s &= ~hit
    if banned is not None and banned.size:
        idx = np.searchsorted(banned, cand_s)
        hit = idx < banned.size
        hit[hit] = banned[idx[hit]] == cand_s[hit]
        keep_s &= ~hit
    keep = np.empty_like(keep_s)
    keep[order] = keep_s
    return cand[keep], scores[keep]


def _topk_frame(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    """(doc_id, score) top-k by (score desc, doc_id asc) — partition-based
    candidate cut (O(n)) before the small lexsort, instead of sorting the
    whole score array."""
    if docs.size > k:
        kth = np.partition(scores, scores.size - k)[scores.size - k]
        keep = scores >= kth  # ties kept; resolved by the lexsort below
        docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))[:k]
    return pd.DataFrame({"doc_id": docs[order].astype(np.int64),
                         "score": scores[order]})


def _lists_meta(pdf: pd.DataFrame, avgdl: float) -> list[dict]:
    """Per-row block metadata + raw blob references — NO posting decode.

    The WAND kernel works from this alone until it knows which blocks
    survive; only those blocks' byte ranges are ever decoded."""
    metas = []
    has_avgdl = "avgdl" in pdf.columns
    for row in pdf.itertuples(index=False):
        blk = row.blocks
        nb = len(blk)
        idf = float(row.idf)
        l_avgdl = float(row.avgdl) if has_avgdl else avgdl
        blk_last = np.fromiter((b["last_doc"] for b in blk), np.int64, nb)
        blk_ub = _ub(
            np.fromiter((b["max_tf"] for b in blk), np.float64, nb),
            np.fromiter((b["min_dl"] for b in blk), np.float64, nb),
            idf, l_avgdl)
        starts = np.fromiter((b["start"] for b in blk), np.int64, nb)
        metas.append({
            "term": row.term,
            "idf": idf, "avgdl": l_avgdl, "df": int(row.df),
            "doc_blob": bytes(row.doc_blob), "tf_blob": bytes(row.tf_blob),
            "dl_blob": bytes(row.dl_blob),
            "blk_last": blk_last, "blk_ub": blk_ub,
            "counts": np.diff(np.concatenate((starts, [int(row.df)]))),
            "doc_off": np.fromiter((b["doc_off"] for b in blk), np.int64, nb),
            "tf_off": np.fromiter((b["tf_off"] for b in blk), np.int64, nb),
            "dl_off": np.fromiter((b["dl_off"] for b in blk), np.int64, nb),
        })
    return metas


def _gather_ranges(blob: bytes, off: np.ndarray, end: np.ndarray,
                   bsel: np.ndarray) -> bytes:
    buf = np.frombuffer(blob, np.uint8)
    return np.concatenate([buf[off[b]: end[b]] for b in bsel]).tobytes()


def _decode_blocks(meta: dict, bsel: np.ndarray):
    """Decode ONLY the selected blocks of one list -> (docs, tfs, dls).

    Block b's first delta is relative to blocks[b-1].last_doc (0 for the
    first block), so each selected block decodes independently: one
    varbyte decode over the concatenated byte ranges, then a per-block
    base-reset cumsum."""
    nb = meta["blk_last"].size
    d_end = np.concatenate((meta["doc_off"][1:], [len(meta["doc_blob"])]))
    t_end = np.concatenate((meta["tf_off"][1:], [len(meta["tf_blob"])]))
    l_end = np.concatenate((meta["dl_off"][1:], [len(meta["dl_blob"])]))
    deltas = vb.decode(_gather_ranges(meta["doc_blob"], meta["doc_off"],
                                      d_end, bsel)).astype(np.int64)
    tfs = vb.decode(_gather_ranges(meta["tf_blob"], meta["tf_off"],
                                   t_end, bsel)).astype(np.int64)
    dls = vb.decode(_gather_ranges(meta["dl_blob"], meta["dl_off"],
                                   l_end, bsel)).astype(np.float64)
    cnts = meta["counts"][bsel]
    seg = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    base = np.where(bsel > 0, meta["blk_last"][np.maximum(bsel - 1, 0)], 0)
    c = np.cumsum(deltas)
    docs = c - np.repeat(c[seg] - deltas[seg] - base, cnts)
    return docs, tfs, dls


def _contrib(meta: dict, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
    tf = tfs.astype(np.float64)
    return meta["idf"] * tf / (tf + K1 * (1.0 - B + B * dls / meta["avgdl"]))


class _ListCache:
    """Incremental block-decode cache for one list: any block decodes at
    most ONCE per query, no matter how many probe phases touch it."""

    __slots__ = ("meta", "bsel", "docs", "tfs", "dls")

    def __init__(self, meta: dict):
        self.meta = meta
        self.bsel = np.empty(0, np.int64)
        self.docs = np.empty(0, np.int64)
        self.tfs = np.empty(0, np.int64)
        self.dls = np.empty(0, np.float64)

    def ensure(self, need: np.ndarray):
        """Decode the blocks in ``need`` not yet cached; keep arrays in
        block (== doc) order."""
        missing = np.setdiff1d(need, self.bsel, assume_unique=False)
        if missing.size == 0:
            return
        d, t, l = _decode_blocks(self.meta, missing)
        if self.bsel.size == 0:
            self.bsel, self.docs, self.tfs, self.dls = missing, d, t, l
            return
        cnts = self.meta["counts"]
        old_b = np.repeat(self.bsel, cnts[self.bsel])
        new_b = np.repeat(missing, cnts[missing])
        order = np.argsort(np.concatenate([old_b, new_b]), kind="stable")
        self.docs = np.concatenate([self.docs, d])[order]
        self.tfs = np.concatenate([self.tfs, t])[order]
        self.dls = np.concatenate([self.dls, l])[order]
        self.bsel = np.union1d(self.bsel, missing)

    def full(self):
        self.ensure(np.arange(self.meta["blk_last"].size))
        return self.docs, self.tfs, self.dls


def _probe(meta: dict, qdocs: np.ndarray, lc: "_ListCache"):
    """Contributions of list ``lc`` at exactly the (sorted) ``qdocs``:
    returns (mask over qdocs, contributions for the masked docs).

    Decodes ONLY the blocks whose doc range covers a probed doc (byte
    ranges from the stored per-block offsets) — a pinpoint gather, never
    a full-list decode; already-decoded blocks are free."""
    nb = meta["blk_last"].size
    cov = np.searchsorted(meta["blk_last"], qdocs, side="left")
    need = np.unique(cov[cov < nb])
    if need.size == 0 and lc.docs.size == 0:
        return np.zeros(qdocs.size, dtype=bool), np.empty(0, np.float64)
    lc.ensure(need)
    docs, tfs, dls = lc.docs, lc.tfs, lc.dls
    idx = np.searchsorted(docs, qdocs)
    hit = (idx < docs.size)
    hit[hit] = docs[idx[hit]] == qdocs[hit]
    sel = idx[hit]
    return hit, _contrib(meta, tfs[sel], dls[sel])


# a probe costs ~1 block decode (amortized to ~0 by the per-list cache
# once probes cluster); the probe-driven restricted kernel wins clearly
# below ~2% candidate:posting ratio and loses past ~50%
# (BENCH/restrict_crossover.json) — gate at allowed * 12 < total df
RESTRICT_PROBE_RATIO = 12


def _score_shard_restricted(pdf: pd.DataFrame, avgdl: float, k: int,
                            allowed: np.ndarray,
                            excl: list[dict] | None = None,
                            banned: np.ndarray | None = None
                            ) -> pd.DataFrame:
    """Candidate-driven scorer for restricted search: the (sorted)
    allow-set IS the candidate list; every query list is block-probed at
    exactly those docs (:func:`_probe` — pruned blocks never decode), so
    per-shard cost is O(|allowed| · terms) probes instead of the full
    posting mass. Score-exact vs the exhaustive kernel: contributions
    add in the same ascending-(term, zone) list order, so floats are
    bit-identical; docs matching NO query term drop (OR semantics)."""
    if allowed.size == 0 or not len(pdf):
        return pd.DataFrame({"doc_id": [], "score": []})
    has_zone = "zone" in pdf.columns
    order = sorted(
        range(len(pdf)),
        key=lambda i: (pdf["term"].iat[i],
                       pdf["zone"].iat[i] if has_zone else ""))
    metas = _lists_meta(pdf.iloc[order], avgdl)
    scores = np.zeros(allowed.size, dtype=np.float64)
    for mt in metas:
        hit, c = _probe(mt, allowed, _ListCache(mt))
        scores[hit] += c
    keep = scores > 0.0
    cand, sc = allowed[keep], scores[keep]
    if cand.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    if excl or (banned is not None and banned.size):
        cand, sc = _apply_exclusions(cand, sc, excl, banned)
        if cand.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
    return _topk_frame(cand, sc, k)


def _score_shard_wand(pdf: pd.DataFrame, avgdl: float, k: int) -> pd.DataFrame:
    """Vectorized MaxScore (Turtle & Flood) with block-targeted decode —
    the round-3 rewrite of the per-pivot DAAT pointer loop, whose
    Python-level constant factor lost to the exhaustive numpy kernel
    below ~200k postings.

    1. **Seed θ**: fully decode only the single highest-upper-bound
       (≈ highest-idf) list, probe every other list at exactly its docs
       (block-targeted decode via the stored per-block byte offsets),
       and take the k-th best exact score.
    2. **Essential split**: order lists by whole-list ub ascending; the
       longest prefix whose ub-sum stays < θ is NON-ESSENTIAL — a doc
       appearing only there can never reach θ.
    3. **Candidates** = the union of the essential lists' docs (bincount
       scatter-add of their contributions); non-essential lists are
       probed at candidate positions only, decoding just the blocks a
       candidate touches.

    Exact: every candidate's score is complete (essential scatter-add +
    non-essential probes); every non-candidate scores ≤ Σ non-essential
    ubs < θ ≤ true k-th score (strict — doc_id tiebreaks unaffected).
    Accumulation is deterministic (term-ordered within each phase) but
    the essential/probe split can differ from the exhaustive kernel's
    global ascending-term sum by the last ulp — this kernel's contract
    is rank identity at 1e-9, not bit equality.
    All steps are searchsorted / bincount over whole arrays; pruned
    lists and blocks cost zero decode. Degenerates gracefully: when θ
    prunes nothing every list is essential and the cost ≈ the exhaustive
    kernel plus one probe pass.
    """
    metas = _lists_meta(pdf, avgdl)
    if not metas:
        return pd.DataFrame({"doc_id": [], "score": []})
    n = len(metas)
    max_ub = np.array([float(mt["blk_ub"].max()) for mt in metas])
    caches = [_ListCache(mt) for mt in metas]

    # 1. seed θ from the highest-ub list's docs, scored exactly. A large
    # seed list is sampled down to its highest-block-ub blocks — probing
    # every other list at a huge doc set would cost more than it prunes
    seed_i = int(np.argmax(max_ub))
    seed_cap = max(32 * k, 512)
    seed_full = metas[seed_i]["df"] <= seed_cap
    mt = metas[seed_i]
    if seed_full:
        sdocs, stfs, sdls = caches[seed_i].full()
    else:
        border = np.argsort(-mt["blk_ub"], kind="stable")
        take = int(np.searchsorted(np.cumsum(mt["counts"][border]),
                                   seed_cap)) + 1
        caches[seed_i].ensure(np.sort(border[:take]))
        sdocs, stfs, sdls = (caches[seed_i].docs, caches[seed_i].tfs,
                             caches[seed_i].dls)
    seed_scores = _contrib(metas[seed_i], stfs, sdls).copy()
    for j in range(n):
        if j != seed_i:
            hit, c = _probe(metas[j], sdocs, caches[j])
            seed_scores[hit] += c
    if seed_scores.size >= k:
        theta = float(np.partition(seed_scores, seed_scores.size - k)[
            seed_scores.size - k])
        order = np.argsort(max_ub, kind="stable")
        cum = np.cumsum(max_ub[order])
        n_ness = int(np.searchsorted(cum, theta, side="left"))
        essential = order[n_ness:].tolist()
        if not essential:  # float edge: θ == Σ ub — keep one list
            essential = [seed_i]
    else:
        essential = list(range(n))
    # deterministic float accumulation: lists add in ascending
    # (term, row) order within each of the two phases. (Exact ascending
    # interleave of pruned and unpruned lists — the exhaustive kernel's
    # order — would forfeit the scatter-add/probe split; the phases can
    # differ from exhaustive in the last ulp, which is why the WAND
    # contract is rank identity at 1e-9, not bit equality.)
    key = lambda i: (metas[i]["term"], i)  # noqa: E731
    essential = sorted(essential, key=key)
    ness = sorted((i for i in range(n) if i not in set(essential)),
                  key=key)
    if essential == [seed_i] and seed_full:
        # the candidates ARE the fully-scored seed docs — done
        return _topk_frame(sdocs, seed_scores, k)

    # 2. candidates = union of essential docs, with essential scores
    all_d, all_s = [], []
    for i in essential:
        docs, tfs, dls = caches[i].full()
        all_d.append(docs)
        all_s.append(_contrib(metas[i], tfs, dls))
    d = np.concatenate(all_d)
    s = np.concatenate(all_s)
    lo = int(d.min())
    acc = np.bincount(d - lo, weights=s)
    nz = np.flatnonzero(acc)
    cand = nz + lo
    scores = acc[nz]

    # 3. complete candidate scores with non-essential probes (block
    # decodes shared with the seed phase via the per-list caches)
    for j in ness:
        hit, c = _probe(metas[j], cand, caches[j])
        scores[hit] += c
    return _topk_frame(cand, scores, k)


def _score_shard_conjunctive(pdf: pd.DataFrame, avgdl: float, k: int,
                             n_required: int,
                             excl: list[dict] | None = None,
                             banned: np.ndarray | None = None,
                             required: set[str] | None = None,
                             allowed: np.ndarray | None = None,
                             groups: dict[str, tuple[int, ...]] | None = None,
                             boost: tuple[np.ndarray, np.ndarray] | None = None,
                             after: tuple[float, int] | None = None
                             ) -> pd.DataFrame:
    """Conjunctive (AND) top-k BM25 over one shard: only docs satisfying
    ALL ``n_required`` gates score.

    The gating unit is a GROUP of terms — a group is satisfied when a
    doc contains ANY of its terms (disjunction within, conjunction
    across). Pure AND is the degenerate case of one singleton group per
    required term; fuzzy-AND passes each original query term's expansion
    set as one group (``groups``: term -> gate ids; a variant within
    edit distance of several originals gates all of them).

    ``required`` (mixed mode, mutually exclusive with ``groups``): when
    given, only THOSE terms gate the candidate set — the remaining
    (optional) terms are probed at the candidates for score
    contributions without shrinking the match set. ``required=None`` and
    ``groups=None`` means every term is required (pure AND).

    ``allowed``: optional sorted doc_id array (e.g. quoted-phrase
    positional matches) — candidates outside it drop IMMEDIATELY after
    seeding, so every subsequent block-targeted probe works on the
    already-narrowed set.

    Intersection-driven, not scan-driven: the rarest gate's lists decode
    fully (they ARE the candidate set — conjunctive results can only
    shrink from there), every other term is probed block-targeted at
    exactly the surviving candidates via the stored per-block byte
    offsets (:func:`_probe`), and candidates are compacted after each
    gate — so per-shard cost is O(rarest gate df) probes, and blocks no
    candidate touches are never decoded. The classic conjunctive-DAAT
    shape (Turtle & Flood '95), re-expressed as whole-array searchsorted.

    A term may span several rows in one logical shard (merged doc-range
    segments); rows of one term cover disjoint doc ranges, so per-term
    presence is the OR of its rows' probe hits and per-term contribution
    the sum. BM25 contributions accumulate in ascending term order
    (same pinned order as the other kernels) for cross-kernel float
    identity.
    """
    empty = pd.DataFrame({"doc_id": [], "score": []})
    metas = _lists_meta(pdf, avgdl)
    by_term: dict[str, list[dict]] = {}
    for mt in metas:
        by_term.setdefault(mt["term"], []).append(mt)
    terms = sorted(by_term)
    # normalize gating to groups (gate ids ascend with term order in the
    # pure-AND case, so gate iteration == the pinned ascending-term walk)
    if groups is None:
        gid_of: dict[str, tuple[int, ...]] = {
            t: (i,) for i, t in enumerate(
                sorted(t for t in terms
                       if required is None or t in required))}
    else:
        gid_of = {t: tuple(groups[t]) for t in terms if t in groups}
    gates = sorted({g for gs in gid_of.values() for g in gs})
    if len(gates) < n_required:
        return empty
    by_gid = {g: sorted(t for t, gs in gid_of.items() if g in gs)
              for g in gates}
    caches = {id(mt): _ListCache(mt) for mt in metas}

    def _tdf(t: str) -> int:
        return sum(m["df"] for m in by_term[t])

    # seed: the rarest GATE's docs (sum of its terms' dfs), fully
    # decoded (cheapest full decode; conjunctive candidates can only
    # shrink from there)
    g0 = min(gates, key=lambda g: (sum(_tdf(t) for t in by_gid[g]),
                                   by_gid[g][0]))
    seed: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in by_gid[g0]:
        ds, cs = [], []
        for mt in by_term[t]:
            d, tf, dl = caches[id(mt)].full()
            ds.append(d)
            cs.append(_contrib(mt, tf, dl))
        seed[t] = (np.concatenate(ds), np.concatenate(cs))
    cand = np.unique(np.concatenate([d for d, _ in seed.values()]))
    contribs: dict[str, np.ndarray] = {}
    hits_of: dict[str, np.ndarray] = {}
    for t, (d, c) in seed.items():
        arr = np.zeros(cand.size, dtype=np.float64)
        hit = np.zeros(cand.size, dtype=bool)
        idx = np.searchsorted(cand, d)  # d's docs unique, all in cand
        arr[idx] = c
        hit[idx] = True
        contribs[t] = arr
        hits_of[t] = hit

    def _compact(keep: np.ndarray) -> None:
        nonlocal cand
        cand = cand[keep]
        for key in contribs:
            contribs[key] = contribs[key][keep]
        for key in hits_of:
            hits_of[key] = hits_of[key][keep]

    if allowed is not None:
        # narrow to the positional-gate survivors before any probing:
        # cand and allowed are both sorted, membership by searchsorted
        if allowed.size == 0:
            return empty
        pos = np.minimum(np.searchsorted(allowed, cand),
                         allowed.size - 1)
        _compact(allowed[pos] == cand)
        if cand.size == 0:
            return empty

    for g in gates:
        if g == g0:
            continue
        hit_group = np.zeros(cand.size, dtype=bool)
        for t in by_gid[g]:
            if t not in contribs:  # a term may gate several groups —
                hit_any = np.zeros(cand.size, dtype=bool)  # probe once
                c_arr = np.zeros(cand.size, dtype=np.float64)
                for mt in by_term[t]:
                    hit, c = _probe(mt, cand, caches[id(mt)])
                    c_arr[hit] += c
                    hit_any |= hit
                contribs[t] = c_arr
                hits_of[t] = hit_any
            hit_group |= hits_of[t]
        if not hit_group.all():
            # compact: shrink every aligned array (gates only — optional
            # terms never shrink the match set)
            _compact(hit_group)
        if cand.size == 0:
            return empty

    for t in terms:  # optional terms: score contributions, no gating
        if t in contribs:
            continue
        c_arr = np.zeros(cand.size, dtype=np.float64)
        for mt in by_term[t]:
            hit, c = _probe(mt, cand, caches[id(mt)])
            c_arr[hit] += c
        contribs[t] = c_arr

    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms:  # pinned ascending-term sum order
        scores += contribs[t]
    if excl or (banned is not None and banned.size):
        cand, scores = _apply_exclusions(cand, scores, excl, banned)
        if cand.size == 0:
            return empty
    if boost is not None:
        scores = _apply_boost(cand, scores, boost)
    if after is not None:
        cand, scores = _apply_cursor(cand, scores, after)
    return _topk_frame(cand, scores, k)


# below this many postings in a shard, the numpy scatter-add exhaustive
# scan beats the MaxScore machinery (both are score-exact); re-measured
# round 3 against the vectorized kernel (see BENCH/wand_crossover)
AUTO_WAND_MIN_POSTINGS = 100_000
# pruning pays only when one list's upper bound dominates the sum (a
# rare/high-idf term next to commons — the classic WAND regime); with a
# flat ub profile nothing can be skipped and exhaustive wins on constant
# factor, so "auto" also gates on this concentration statistic
AUTO_WAND_UB_CONCENTRATION = 0.45


def _pick_scorer(pdf: pd.DataFrame, use_wand: bool | str):
    """Kernel choice for one shard. "auto" = exhaustive below the size
    threshold, else WAND iff the per-term upper-bound mass is
    concentrated enough for pruning to pay. The proxy ub
    idf*max_tf/(max_tf+k1) needs only row metadata — no decode."""
    if use_wand != "auto":
        return _score_shard_wand if bool(use_wand) else _score_shard_exhaustive
    if int(pdf["df"].sum()) < AUTO_WAND_MIN_POSTINGS:
        return _score_shard_exhaustive
    ub = pdf["idf"].to_numpy() * pdf["max_tf"].to_numpy() \
        / (pdf["max_tf"].to_numpy() + K1)
    t_ub = pd.Series(ub).groupby(pdf["term"].to_numpy()).max()
    conc = float(t_ub.max() / t_ub.sum()) if t_ub.size else 0.0
    return (_score_shard_wand if conc >= AUTO_WAND_UB_CONCENTRATION
            else _score_shard_exhaustive)


def search(index: DataFrame, docs: DataFrame | None, stats: dict, query: str,
           k: int = 10, stem: bool = True, use_wand: bool | str = "auto",
           shard_size: int = 4096, camel: bool = True,
           zone: str | None = None, mode: str = "or",
           exclude: str | None = None,
           tombstones: DataFrame | None = None,
           restrict: DataFrame | None = None,
           groups: dict[str, tuple[int, ...]] | None = None,
           boosts: DataFrame | None = None,
           after: tuple[float, int] | None = None,
           min_match: int | None = None,
           min_match_df: DataFrame | None = None,
           term_weights: dict[str, float] | None = None,
           qterms: list[str] | None = None) -> DataFrame:
    """Top-k BM25 over the sharded index. Returns (doc_id, score).

    ``qterms``: pre-tokenized query terms — the custom-analyzer hook
    (e.g. :func:`cjk_query_terms` for a mixed latin+CJK-bigram index,
    whose terms a whitespace re-tokenization would drop). When given,
    ``query``/``stem``/``camel`` are ignored for the positive terms;
    ``exclude`` still tokenizes as a string.

    ``use_wand``: True (always WAND), False (always exhaustive), or
    "auto" — per shard, exhaustive below AUTO_WAND_MIN_POSTINGS postings,
    WAND above. All modes are score-exact; auto just picks the faster
    kernel for the density.

    ``mode``: "or" (default — any query term matches, disjunctive BM25)
    or "and" (conjunctive: only docs containing EVERY query term score;
    a term absent from the whole index makes the result empty). AND uses
    the intersection-driven kernel (:func:`_score_shard_conjunctive`) —
    per-shard cost bounded by the rarest term's postings. A doc's
    postings for all its terms live in its own doc-range shard, so the
    shard-local term count IS the doc's global count: no cross-shard
    coordination is needed for the conjunction.

    A ZONED index is pinned to one zone (default ``body``, validated —
    see :func:`pin_zone`); the caller's ``stats`` must be that zone's.
    Weighted multi-zone scoring is :func:`zone_search`.

    ``exclude``: optional NOT clause — docs containing ANY of its terms
    (tokenized like the query) are removed before the top-k cut.
    Exclusion lists are probed block-targeted at the scored candidates
    only, so a common exclusion term never fully decodes; with an
    exclusion present the OR path uses the exhaustive kernel (a WAND θ
    seeded on to-be-excluded docs could over-prune — folding exclusion
    probes into the seed phase is the scale refinement).

    ``tombstones``: optional (doc_id) DataFrame of logically-deleted
    docs — dropped from results before the top-k cut, while corpus
    statistics stay those of the caller's ``stats`` (the standard
    delete-then-compact contract; :func:`vacuum_index` is the physical
    purge that also refreshes stats). Distribution is a shard-cogroup:
    tombstones shuffle BY SHARD next to the hit rows (``shard_size``
    must match the build), so no tombstone set is ever collected or
    broadcast whole — deletes scale with the corpus.

    ``restrict``: optional (doc_id) allow-set — metadata-filtered
    retrieval ("only docs where lang='python'"): compute the filter on
    the doc dimension (any predicate, any join), pass its doc_ids here.
    Only allowed docs may rank; their scores are the unrestricted BM25
    (global idf/avgdl — the filter narrows the candidates, not the
    corpus statistics). Same shard-cogroup distribution as tombstones,
    so filter results of any size scale. Composes with ``mode``,
    ``exclude`` and ``tombstones`` (a doc both allowed and tombstoned
    stays deleted).

    ``groups`` (mode="and" only): maps query terms to gate ids for
    group-conjunctive matching — a doc must satisfy EVERY gate via >=1
    of that gate's terms (fuzzy-AND expansion groups; see
    :func:`search_fuzzy`). Keys must be tokenized query terms.

    ``boosts``: optional (doc_id, boost) relation — function scoring
    (recency / authority / pagerank-style multipliers): each listed
    doc's BM25 score is multiplied by its weight before any top-k cut;
    docs absent from the relation keep 1.0. One row per doc_id.
    Distribution is the tombstones/restrict shard-cogroup (the boost
    relation is never collected or broadcast); boosting forces the
    exhaustive OR kernel since WAND's unboosted bounds could over-prune
    docs a weight > 1 promotes.

    ``after``: deep-pagination cursor — pass the previous page's last
    (score, doc_id) and only docs strictly after it in rank order
    return (Elasticsearch search_after). Exact at any depth: scores are
    bitwise-reproducible (pinned summation order), so the cursor's
    equality arm needs no epsilon, and the page-N query does the same
    one-exchange work as page 1 — no offset materialization. Applies
    after ``boosts``; forces the exhaustive OR kernel.

    ``min_match`` (mode="or" only): minimum number of DISTINCT query
    terms a doc must contain to rank (Lucene/ES minimum_should_match —
    the middle ground between OR and AND). A doc's score stays the
    full BM25 sum over its present terms; ``min_match=1`` is plain OR,
    ``min_match=len(terms)`` matches AND's result set, a value above
    the term count returns empty (the count gate is unsatisfiable).
    Counting is shard-local-exact: a doc's postings for all its terms
    live in its own doc-range shard, so the shard-local distinct-term
    count IS the doc's global count. Forces the exhaustive kernel
    (WAND's score-bound pruning could skip a term list whose presence
    was exactly what satisfied the count gate); composes with
    ``exclude``/``tombstones``/``restrict``/``boosts``/``after``.

    ``min_match_df`` (mode="or" only, exclusive with ``min_match``):
    per-doc thresholds — a (doc_id, required) relation giving each
    doc its OWN minimum distinct-term count (the Elasticsearch
    ``terms_set`` query with ``minimum_should_match_field``: "match
    this skill-list doc if >= its required_matches of the query skills
    are present"). Docs absent from the relation never rank (the
    relation IS the eligible population — pass required=0 rows to make
    a doc unconditionally eligible); listed docs rank iff their
    distinct matched-term count >= their required value, scored by the
    full BM25 sum over present terms. Distribution is the tombstones/
    restrict shard-cogroup side-channel (kind 3 carries the
    threshold) — the relation is never collected or broadcast, and the
    count gate is shard-local-exact for the same doc-range reason as
    ``min_match``. Forces the exhaustive kernel.

    ``term_weights``: optional per-term score multipliers (weighted
    query / RM3 expansion weights): term t's whole BM25 contribution is
    scaled by ``term_weights[t]`` (absent terms keep 1.0). Applied by
    scaling the term's idf BEFORE the kernels, so every kernel —
    including WAND, whose upper bounds derive from the same scaled
    idf — stays score-exact. Keys must be tokenized query terms;
    weights must be positive finite.

    ``docs`` is accepted for API symmetry but unused — doc lengths live in
    the index (dl_blob); ``shard_size`` is only used to route
    ``tombstones`` (shard ids themselves are stored in the index).
    """
    import math

    spark = index.sparkSession
    qterms = sorted(set(qterms if qterms is not None
                        else tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if term_weights:
        extra = set(term_weights) - set(qterms)
        if extra:
            raise ValueError(f"term_weights keys not in the tokenized "
                             f"query: {sorted(extra)}")
        bad = {t: w for t, w in term_weights.items()
               if not (isinstance(w, (int, float)) and math.isfinite(w)
                       and w > 0)}
        if bad:
            raise ValueError(f"term_weights must be positive finite: {bad}")
    if groups is not None:
        if mode != "and":
            raise ValueError("groups requires mode='and'")
        extra = set(groups) - set(qterms)
        if extra:
            raise ValueError(f"groups keys not in the tokenized query: "
                             f"{sorted(extra)}")
    xterms = sorted(set(tokenize(exclude, stem=stem, camel=camel))
                    ) if exclude else []
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    index = pin_zone(index, zone)
    merged_form = "shard" not in index.columns
    if merged_form:
        # a merged global index (merge_shards output) is one doc-range
        # row per term — score it as a single logical shard
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(
        F.col("term").isin(sorted(set(qterms) | set(xterms))))
    # exact global df per term = sum of its shard dfs (ranges disjoint).
    # A map-side-combined aggregate + BROADCAST join-back (the stats
    # relation is <= |query terms| rows): the hit rows never shuffle by
    # term. A window over term would funnel a hot term's every shard row
    # into one task at 10^12-doc shard counts.
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5) / (F.col("df_g") + 0.5) + 1.0),
    )
    if term_weights:
        wmap = F.create_map(*[F.lit(x) for t_w in sorted(term_weights.items())
                              for x in (t_w[0], float(t_w[1]))])
        hits = hits.withColumn(
            "idf", F.col("idf") * F.coalesce(wmap[F.col("term")],
                                             F.lit(1.0)))

    local = _modal_local_topk(hits, qterms, xterms, mode, avgdl, k,
                              lambda pdf: _pick_scorer(pdf, use_wand),
                              tombstones, shard_size, merged_form,
                              restrict=restrict, groups=groups,
                              boosts=boosts, after=after,
                              min_match=min_match, req_counts=min_match_df)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _modal_local_topk(hits: DataFrame, qterms: list[str], xterms: list[str],
                      mode: str, avgdl: float, k: int, pick,
                      tombstones: DataFrame | None, shard_size: int,
                      merged_form: bool,
                      required: set[str] | None = None,
                      phrases: list[list[str]] | None = None,
                      neg_phrases: list[list[str]] | None = None,
                      restrict: DataFrame | None = None,
                      groups: dict[str, tuple[int, ...]] | None = None,
                      boosts: DataFrame | None = None,
                      after: tuple[float, int] | None = None,
                      min_match: int | None = None,
                      req_counts: DataFrame | None = None
                      ) -> DataFrame:
    """Per-shard local top-k under OR/AND mode, term exclusions, and
    shard-cogrouped tombstones — shared by ``search``, ``search_dsl``
    and ``QueryEngine``. ``pick(pdf)`` returns the OR-mode scorer
    kernel. ``required`` (with mode="and") marks the subset of
    ``qterms`` that gates matches; the rest contribute score only.
    ``groups`` (with mode="and", exclusive with ``required``) maps
    terms to gate ids for group-conjunctive matching — every gate must
    be satisfied by >=1 of its terms (fuzzy-AND expansion groups).

    ``phrases``/``neg_phrases``: exact-position phrase gates, resolved
    SHARD-LOCALLY (a doc's positions for every term live in its own
    doc-range shard, so the positional intersection needs no cross-shard
    traffic). Positive phrases narrow the conjunctive candidate set via
    the kernel's ``allowed`` fast path; negative phrases' match docs
    merge into the tombstone-style ``banned`` array, which both kernels
    already honor. Phrase terms must be in ``qterms`` (positive) /
    the hits relation (negative) so their pos_blobs reach the shard.

    ``restrict``: optional (doc_id) allow-set — only docs IN the set may
    appear in the top-k; a surviving doc's score is its unrestricted
    full-query BM25 (the restriction filters, never rescales).
    Distribution mirrors tombstones: the set shuffles BY SHARD next to
    the hit rows through one shared cogroup side-channel (kind 0 =
    tombstone, kind 1 = allowed), so a billion-doc filter result is
    never collected or broadcast. A shard with hit rows but no allowed
    rows contributes nothing.

    ``boosts``: optional (doc_id, boost) relation — each listed doc's
    final score is multiplied by its weight BEFORE the per-shard top-k
    cut (absent docs keep 1.0), so function-scored ranking is exact.
    Rides the same shard-cogroup side-channel as tombstones/restrict
    (kind 2 carries the weight) — never collected or broadcast. With
    boosts present the OR path scores exhaustively (a WAND θ computed
    from unboosted upper bounds could prune a doc a weight > 1 would
    have promoted); the conjunctive kernel is intersection-driven, not
    score-pruned, so AND keeps its kernel.

    ``after``: deep-pagination cursor — the (score, doc_id) of the last
    row of the previous page; only docs strictly after it in
    (score desc, doc_id asc) order can rank. Applied in-kernel AFTER
    boosting and before the local cut; like boosts it forces the
    exhaustive OR kernel (WAND would return the global top-k and prune
    exactly the page being asked for)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if phrases and mode != "and":
        raise ValueError("positive phrases imply mode='and' (their terms "
                         "gate the match set)")
    if groups is not None and required is not None:
        raise ValueError("groups and required are mutually exclusive")
    if min_match is not None:
        if mode != "or":
            raise ValueError("min_match applies to mode='or' (mode='and' "
                             "already requires every term)")
        if min_match < 1:
            raise ValueError(f"min_match must be >= 1, got {min_match}")
    if req_counts is not None:
        if mode != "or":
            raise ValueError("req_counts (terms_set) applies to mode='or'")
        if min_match is not None:
            raise ValueError("req_counts and min_match are mutually "
                             "exclusive (per-doc vs global threshold)")
    if groups is not None:
        n_req = len({g for gs in groups.values() for g in gs})
    else:
        n_req = len(required) if required is not None else len(qterms)
    qset, xset = set(qterms), set(xterms)
    # neg-phrase terms ride in pdf only for the positional gate — they
    # must never reach the scorers
    negp_terms = {t for ph in (neg_phrases or []) for t in ph}

    def score(pdf: pd.DataFrame, banned: np.ndarray | None,
              allowed_r: np.ndarray | None = None,
              boost: tuple[np.ndarray, np.ndarray] | None = None,
              req: tuple[np.ndarray, np.ndarray] | None = None
              ) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "score": []})
        if allowed_r is not None and allowed_r.size == 0:
            return empty
        allowed = allowed_r
        if phrases or neg_phrases:
            from index_spark.operators.phrase import _phrase_shard
            for ph in (phrases or []):
                m = _phrase_shard(pdf[pdf["term"].isin(set(ph))], ph)
                hit = m["doc_id"].to_numpy(np.int64)  # sorted (np.unique)
                allowed = hit if allowed is None else np.intersect1d(
                    allowed, hit, assume_unique=True)
                if allowed.size == 0:
                    return empty
            neg_hits = [
                _phrase_shard(pdf[pdf["term"].isin(set(ph))], ph)
                ["doc_id"].to_numpy(np.int64)
                for ph in (neg_phrases or [])
            ]
            neg_hits = [h for h in neg_hits if h.size]
            if neg_hits:
                extra = neg_hits[0] if len(neg_hits) == 1 \
                    else np.unique(np.concatenate(neg_hits))
                banned = extra if banned is None or not banned.size \
                    else np.union1d(banned, extra)
        if xset or negp_terms:
            xpdf = pdf[pdf["term"].isin(xset)] if xset else pdf.iloc[:0]
            spdf = pdf[pdf["term"].isin(qset)]
            excl = _lists_meta(xpdf, avgdl) if len(xpdf) else None
        else:
            spdf, excl = pdf, None
        if mode == "and":
            return _score_shard_conjunctive(spdf, avgdl, k, n_req, excl,
                                            banned, required, allowed,
                                            groups, boost, after)
        if min_match is not None:
            # m-of-n gating needs per-doc term counts — the exhaustive
            # scatter-add tracks them for free; WAND's score-bound
            # pruning could drop a doc whose pruned terms were exactly
            # the ones satisfying the count gate
            return _score_shard_exhaustive(spdf, avgdl, k, excl, banned,
                                           allowed, boost, after,
                                           min_match)
        if req is not None:
            # per-doc m-of-n (terms_set): same exhaustive-count rationale
            # as min_match — WAND could prune a term whose presence
            # satisfied a doc's own threshold
            return _score_shard_exhaustive(spdf, avgdl, k, excl, banned,
                                           allowed, boost, after, req=req)
        if boost is not None or after is not None:
            # exhaustive whenever boosting or paginating (see
            # docstring); the allowed set folds in as the kernel's
            # candidate filter
            return _score_shard_exhaustive(spdf, avgdl, k, excl, banned,
                                           allowed, boost, after)
        if allowed is not None:
            # small allow-set vs big posting mass: probe-driven kernel
            # (block-targeted, score-exact); else exhaustive + filter.
            # Either way no WAND (a θ over to-be-filtered docs could
            # over-prune).
            total_df = int(spdf["df"].sum()) if len(spdf) else 0
            if allowed.size * RESTRICT_PROBE_RATIO < total_df:
                return _score_shard_restricted(spdf, avgdl, k, allowed,
                                               excl, banned)
            return _score_shard_exhaustive(spdf, avgdl, k, excl, banned,
                                           allowed)
        if excl is not None or (banned is not None and banned.size):
            return _score_shard_exhaustive(spdf, avgdl, k, excl, banned)
        return pick(spdf)(spdf, avgdl, k)

    has_restrict = restrict is not None
    has_boosts = boosts is not None
    has_req = req_counts is not None
    if tombstones is not None or has_restrict or has_boosts or has_req:
        shard_expr = (F.lit(0).cast("long") if merged_form
                      else F.floor(F.col("doc_id") / shard_size).cast("long"))
        sides = []
        if tombstones is not None:
            sides.append(tombstones.select(
                shard_expr.alias("shard"), F.col("doc_id").cast("long"),
                F.lit(0).alias("kind"), F.lit(1.0).alias("w")))
        if has_restrict:
            sides.append(restrict.select(
                shard_expr.alias("shard"), F.col("doc_id").cast("long"),
                F.lit(1).alias("kind"), F.lit(1.0).alias("w")))
        if has_boosts:
            sides.append(boosts.select(
                shard_expr.alias("shard"), F.col("doc_id").cast("long"),
                F.lit(2).alias("kind"),
                F.col("boost").cast("double").alias("w")))
        if has_req:
            sides.append(req_counts.select(
                shard_expr.alias("shard"), F.col("doc_id").cast("long"),
                F.lit(3).alias("kind"),
                F.col("required").cast("double").alias("w")))
        side = sides[0]
        for s in sides[1:]:
            side = side.unionByName(s)

        def fn2(key_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
            ids = s_pdf["doc_id"].to_numpy(np.int64)
            kinds = s_pdf["kind"].to_numpy()
            banned = np.sort(ids[kinds == 0])
            allowed_r = (np.unique(ids[kinds == 1]) if has_restrict
                         else None)
            boost = None
            if has_boosts:
                sel = kinds == 2
                b_ids = ids[sel]
                b_w = s_pdf["w"].to_numpy(np.float64)[sel]
                order = np.argsort(b_ids, kind="stable")
                boost = (b_ids[order], b_w[order])
            req = None
            if has_req:
                sel = kinds == 3
                r_ids = ids[sel]
                r_w = s_pdf["w"].to_numpy(np.float64)[sel].astype(np.int64)
                order = np.argsort(r_ids, kind="stable")
                req = (r_ids[order], r_w[order])
            return score(key_pdf, banned if banned.size else None,
                         allowed_r, boost, req)

        return hits.groupby("shard").cogroup(side.groupby("shard")) \
            .applyInPandas(fn2, schema=TOPK_SCHEMA)
    return hits.groupBy("shard").applyInPandas(
        lambda pdf: score(pdf, None), schema=TOPK_SCHEMA)


class QueryEngine:
    """Low-latency repeated-query interface over a built index.

    ``search()`` above is the one-shot DataFrame API (used by the oracle
    parity tests); it derives global term dfs with a map-side-combined
    aggregate + broadcast join-back every call — an extra stats job per
    query. A real serving path amortizes index statistics across
    queries, so this engine:

      * caches global per-term df (one tiny filtered aggregate per batch
        of unseen terms — the merged index's term catalog at 10^12 scale),
      * injects idf JVM-side via a literal ``create_map`` (no window, no
        Python in the plan until the scorer),
      * runs the per-shard DAAT scorer, then merges per-shard top-ks with
        the ``orderBy().limit(k)`` tail — Spark compiles it to
        ``TakeOrderedAndProject`` (each task keeps its own top-k heap; the
        driver merges k rows per TASK, never per shard), so the merge
        stays bounded at 10^12-doc shard counts where a collect of
        shards-with-hits x k rows would OOM the driver.

    Per query: scan(term-pruned) -> exchange(shard, a few KB) -> scorer
    -> TakeOrderedAndProject. One exchange total.
    """

    def __init__(self, index: DataFrame, stats: dict, stem: bool = True,
                 use_wand: bool | str = "auto", camel: bool = True,
                 zone: str | None = None,
                 shard_size: int = 4096,
                 tombstones: DataFrame | None = None):
        self.index = pin_zone(index, zone)
        self.stats = stats
        self.stem = stem
        self.camel = camel
        self.use_wand = use_wand
        self.shard_size = shard_size  # doc_id -> shard routing (deletes)
        self._tombstones = tombstones
        # LRU-bounded df cache: a long-lived serving process seeing an
        # unbounded query-term stream must not grow without bound
        from collections import OrderedDict
        self._df_cache: OrderedDict[str, int] = OrderedDict()
        self._df_cache_max = 262_144
        # same LRU policy for global cf (the LM-Dirichlet stats)
        self._cf_cache: OrderedDict[str, int] = OrderedDict()
        self._prepared = False

    def prepare(self, num_partitions: int | None = None) -> "QueryEngine":
        """Serving-mode warm-up: cache the index HASH-PARTITIONED BY
        SHARD. Every query's ``groupBy('shard')`` then finds its required
        distribution already satisfied by the cached relation — the
        per-query exchange disappears and the scorer reads in-memory
        columnar batches (measured ~10x lower per-query latency at
        sandbox scale). The at-rest analog is writing the serving copy
        bucketed by shard. Call once; ``release()`` to unpin."""
        if not self._prepared:
            spark = self.index.sparkSession
            if num_partitions is None:
                num_partitions = max(spark.sparkContext.defaultParallelism, 2)
            self.index = self.index.repartition(num_partitions, "shard") \
                                   .persist()
            self.index.count()
            self._prepared = True
        return self

    def release(self) -> None:
        if self._prepared:
            self.index.unpersist()
            self._prepared = False

    def _ensure_stats(self, terms: list[str]) -> None:
        missing = []
        for t in terms:
            if t in self._df_cache:
                self._df_cache.move_to_end(t)  # LRU touch
            else:
                missing.append(t)
        if not missing:
            return
        rows = (self.index.filter(F.col("term").isin(missing))
                .groupBy("term").agg(F.sum("df").alias("df")).collect())
        for r in rows:
            self._df_cache[r["term"]] = int(r["df"])
        for t in missing:
            self._df_cache.setdefault(t, 0)
        while len(self._df_cache) > self._df_cache_max:
            self._df_cache.popitem(last=False)

    def warm(self, queries: list[str]) -> None:
        """Prefetch stats for a query set in one job."""
        terms: set[str] = set()
        for q in queries:
            terms.update(tokenize(q, stem=self.stem, camel=self.camel))
        self._ensure_stats(sorted(terms))

    def delete(self, doc_ids) -> None:
        """Register logical deletes: subsequent queries drop these docs
        (shard-cogrouped, never collected back). Stats stay as built —
        run :func:`~index_spark.operators.maintenance.vacuum_index` and
        rebuild the engine for a physical purge."""
        spark = self.index.sparkSession
        df = spark.createDataFrame([(int(d),) for d in doc_ids],
                                   "doc_id long")
        self._tombstones = (df if self._tombstones is None
                            else self._tombstones.unionByName(df).distinct())

    def search(self, query: str, k: int = 10, mode: str = "or",
               exclude: str | None = None,
               restrict: DataFrame | None = None,
               boosts: DataFrame | None = None,
               after: tuple[float, int] | None = None,
               min_match: int | None = None
               ) -> list[tuple[int, float]]:
        df = self.topk_df(query, k, mode=mode, exclude=exclude,
                          restrict=restrict, boosts=boosts, after=after,
                          min_match=min_match)
        if df is None:
            return []
        return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]

    def _ensure_cf(self, terms: list[str]) -> None:
        missing = []
        for t in terms:
            if t in self._cf_cache:
                self._cf_cache.move_to_end(t)
            else:
                missing.append(t)
        if not missing:
            return
        rows = (self.index.filter(F.col("term").isin(missing))
                .groupBy("term").agg(F.sum("cf").alias("cf")).collect())
        for r in rows:
            self._cf_cache[r["term"]] = int(r["cf"])
        for t in missing:
            self._cf_cache.setdefault(t, 0)
        while len(self._cf_cache) > self._df_cache_max:
            self._cf_cache.popitem(last=False)

    def lmd_topk_df(self, query: str, k: int = 10,
                    mu: float = 2000.0) -> DataFrame:
        """LM-Dirichlet ranking over the prepared index — the
        alternative similarity module as a serving-path method
        (:func:`lm_dirichlet_search`; OR-mode, registered tombstones
        apply). Global cfs come from the engine's LRU (one tiny
        aggregate per batch of UNSEEN terms, like the BM25 df cache —
        no per-query stats job), and the prepared shard partitioning
        satisfies the kernel's ``groupBy('shard')`` just like the BM25
        scorers, so the per-query exchange disappears here too."""
        qterms = sorted(set(tokenize(query, stem=self.stem,
                                     camel=self.camel)))
        if qterms:
            self._ensure_cf(qterms)
        cf = {t: self._cf_cache[t] for t in qterms}
        return lm_dirichlet_search(self.index, self.stats, query, mu=mu,
                                   k=k, stem=self.stem, camel=self.camel,
                                   tombstones=self._tombstones, cf=cf)

    def topk_df(self, query: str, k: int = 10, mode: str = "or",
                exclude: str | None = None,
                restrict: DataFrame | None = None,
                boosts: DataFrame | None = None,
                after: tuple[float, int] | None = None,
                min_match: int | None = None
                ) -> DataFrame | None:
        """The query's top-k plan as a DataFrame (None for empty/unknown
        queries) — collect() yields exactly k rows via the distributed
        TakeOrderedAndProject merge. ``mode="and"`` scores only docs
        containing every query term (see :func:`search`); a term with
        zero global df short-circuits to None driver-side — no job runs.
        ``exclude`` is the boolean NOT clause; registered ``delete()``
        tombstones apply to every query. ``restrict`` is the (doc_id)
        allow-set of :func:`search` — metadata-filtered serving, same
        shard-cogroup distribution. ``boosts`` / ``after`` are the
        function-scoring relation and deep-pagination cursor of
        :func:`search` (both force the exhaustive OR kernel);
        ``min_match`` the m-of-n count gate (likewise exhaustive).
        """
        if mode not in ("or", "and"):
            raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
        qterms = sorted(set(tokenize(query, stem=self.stem,
                                     camel=self.camel)))
        if not qterms:
            return None
        xterms = sorted(set(tokenize(exclude, stem=self.stem,
                                     camel=self.camel))) if exclude else []
        self._ensure_stats(qterms)
        n_docs, avgdl = self.stats["n_docs"], self.stats["avgdl"]
        idf = {
            t: math.log((n_docs - self._df_cache[t] + 0.5)
                        / (self._df_cache[t] + 0.5) + 1.0)
            for t in qterms if self._df_cache[t] > 0
        }
        if not idf:
            return None
        if mode == "and" and len(idf) < len(qterms):
            return None  # a required term is absent from the index
        use_wand = self.use_wand
        mapping = F.create_map(
            *[F.lit(x) for kv in idf.items() for x in kv])
        hits = (self.index.filter(
                    F.col("term").isin(sorted(set(idf) | set(xterms))))
                .withColumn("idf",
                            F.coalesce(mapping[F.col("term")], F.lit(0.0))))

        def pick(pdf: pd.DataFrame):
            if use_wand == "auto":
                wand = int(pdf["df"].sum()) >= AUTO_WAND_MIN_POSTINGS
            else:
                wand = bool(use_wand)
            return _score_shard_wand if wand else _score_shard_exhaustive

        local = _modal_local_topk(hits, sorted(idf), xterms, mode, avgdl,
                                  k, pick, self._tombstones,
                                  self.shard_size, merged_form=False,
                                  restrict=restrict, boosts=boosts,
                                  after=after, min_match=min_match)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def zone_search(index: DataFrame, zone_stats: dict, query: str,
                zone_weights: dict[str, float], k: int = 10,
                stem: bool = True, use_wand: bool | str = "auto",
                camel: bool = True) -> DataFrame:
    """Top-k zone-weighted BM25 over a zoned index (build_zoned_index).

    score(d) = sum over zones z of  w_z * BM25_z(q, d), where BM25_z uses
    the zone's own df / N / avgdl (zones are independent sub-indexes; the
    reference's analog is querying '@'-prefixed title keys next to bare
    body keys, index.h:320-326, with caller-side weighting).

    Plan shape is identical to ``search``: term+zone-pruned scan -> one
    shard exchange -> per-shard DAAT (the zone's weight is folded into
    the row's idf; each row carries its zone's avgdl) -> distributed
    top-k. Zone lists of the same doc range land in the same shard group,
    so the weighted sum needs no extra join or shuffle.
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)

    hits = index.filter(F.col("term").isin(qterms)
                        & F.col("zone").isin(zones))
    # per-(zone, term) global df via aggregate + broadcast join-back
    # (skew-safe; see ``search``)
    dfs = hits.groupBy("zone", "term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), ["zone", "term"])
    n_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["n_docs"]))])
    w_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_weights[z]))])
    a_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["avgdl"]))])
    hits = (hits
            .withColumn("idf", w_map[F.col("zone")] * F.log(
                (n_map[F.col("zone")] - F.col("df_g") + 0.5)
                / (F.col("df_g") + 0.5) + 1.0))
            .withColumn("avgdl", a_map[F.col("zone")]))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-row avgdl overrides the scalar
        return _pick_scorer(pdf, use_wand)(pdf, 0.0, k)

    local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def dismax_search(index: DataFrame, zone_stats: dict, query: str,
                  zone_weights: dict[str, float], k: int = 10,
                  tie: float = 0.0, stem: bool = True,
                  camel: bool = True) -> DataFrame:
    """Top-k disjunction-max over zones (Lucene DisjunctionMaxQuery /
    dis_max): per term the BEST zone's BM25 contribution wins, other
    zones add only ``tie`` times theirs —

        score(d) = sum_t [ max_z c_z(t,d) + tie * (sum_z c_z - max_z c_z) ]
        c_z(t,d) = w_z * idf_z(t) * tf saturation with zone z's dl/avgdl

    — the "best matching field" semantics between :func:`zone_search`
    (weighted SUM of per-zone BM25s; this scorer reduces to it at
    tie=1.0, rank- and score-equal, pinned by test) and
    :func:`bm25f_search` (tf-level combination). Use it when zones
    duplicate content (title repeated in body) and summing would
    double-count. Per-term zone accumulation runs in pinned ascending
    (term, zone) order, so scores are reproducible across reruns.

    Plan shape is ``search``'s: term+zone-pruned scan -> ONE shard
    exchange (all zones of a doc range share a shard) -> per-shard
    kernel combining zone rows per (term, doc) -> tiny top-k merge.
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)

    hits = index.filter(F.col("term").isin(qterms)
                        & F.col("zone").isin(zones))
    dfs = hits.groupBy("zone", "term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), ["zone", "term"])
    n_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["n_docs"]))])
    w_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_weights[z]))])
    a_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["avgdl"]))])
    hits = (hits
            .withColumn("idf", w_map[F.col("zone")] * F.log(
                (n_map[F.col("zone")] - F.col("df_g") + 0.5)
                / (F.col("df_g") + 0.5) + 1.0))
            .withColumn("avgdl", a_map[F.col("zone")]))
    tie_f = float(tie)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows_by_term: dict[str, list] = {}
        lo, hi = None, None
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            c = row.idf * tfs / (tfs + K1 * (1.0 - B + B * dls / row.avgdl))
            rows_by_term.setdefault(row.term, []).append((row.zone, docs, c))
            lo = int(docs[0]) if lo is None else min(lo, int(docs[0]))
            hi = int(docs[-1]) if hi is None else max(hi, int(docs[-1]))
        if lo is None:
            return pd.DataFrame({"doc_id": [], "score": []})
        size = hi - lo + 1
        acc = np.zeros(size, dtype=np.float64)
        for term in sorted(rows_by_term):  # pinned (term, zone) order
            mx = np.zeros(size, dtype=np.float64)
            sm = np.zeros(size, dtype=np.float64)
            for _, docs, c in sorted(rows_by_term[term],
                                     key=lambda r: r[0]):
                tmp = np.zeros(size, dtype=np.float64)
                tmp[docs - lo] = c
                sm += tmp
                np.maximum(mx, tmp, out=mx)
            acc += mx + tie_f * (sm - mx)
        nzi = np.flatnonzero(acc)
        if nzi.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        return _topk_frame(nzi + lo, acc[nzi], k)

    local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


_UNION_DF_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("dfd", T.LongType(), False),
])


def bm25f_search(index: DataFrame, zone_stats: dict, query: str,
                 zone_weights: dict[str, float], k: int = 10,
                 stem: bool = True, camel: bool = True,
                 k1: float = K1, b: float = B) -> DataFrame:
    """Top-k BM25F (Robertson & Zaragoza 2004, simple weighted variant)
    over a zoned index — the principled multi-field scorer next to
    :func:`zone_search`'s per-zone-BM25 weighted SUM.

    Per term t and doc d, zone tfs combine BEFORE saturation:

        wtf(t,d) = sum_z  w_z * tf_z / ((1-b) + b * dl_z/avgdl_z)
        score(d) = sum_t  idf_doc(t) * wtf / (k1 + wtf)

    with DOC-level idf: df_doc(t) = |docs containing t in ANY zone| and
    N = |docs present in any zone| (so a title-only hit and a body-only
    hit share one df). That early combination is what distinguishes
    BM25F from summing independent per-zone BM25s: a term spread across
    fields saturates ONCE, weighted, instead of earning each zone's full
    k1 ramp.

    Two jobs, mirroring one-shot ``search``'s stats-then-score shape:
      1. doc-level df: per shard, union each term's doc ids across its
         zone rows (doc ranges are shard-disjoint, so per-shard union
         counts SUM to the global df_doc); the '%' doc-table rows union
         the same way into N. Only (term, count) rows leave the tasks.
      2. scoring: one shard exchange; the kernel accumulates wtf per
         (term, doc) across zone rows, then saturates once per term in
         ascending-term order (the pinned float sum order), local top-k,
         TakeOrderedAndProject global merge.
    """
    from index_spark.operators.build import DOC_MARKER

    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)

    zsel = index.filter(F.col("zone").isin(zones))
    hits = zsel.filter(F.col("term").isin(qterms))
    pool = zsel.filter(F.col("term").isin(qterms + [DOC_MARKER])) \
               .select("shard", "term", "doc_blob")

    def union_df(pdf: pd.DataFrame) -> pd.DataFrame:
        terms, counts = [], []
        for term, grp in pdf.groupby("term", sort=False):
            docs = [np.cumsum(vb.decode(blob).astype(np.int64))
                    for blob in grp["doc_blob"]]
            terms.append(term)
            counts.append(np.unique(np.concatenate(docs)).size)
        return pd.DataFrame({"term": terms,
                             "dfd": np.asarray(counts, np.int64)})

    agg = (pool.groupBy("shard").applyInPandas(union_df, _UNION_DF_SCHEMA)
           .groupBy("term").agg(F.sum("dfd").alias("dfd")).collect())
    dfd = {r["term"]: int(r["dfd"]) for r in agg}
    n_docs = dfd.pop(DOC_MARKER, 0)
    if not dfd or n_docs == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    idf_map = {t: math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               for t, df in dfd.items()}
    zw = {z: float(zone_weights[z]) for z in zones}
    zavg = {z: float(zone_stats[z]["avgdl"]) for z in zones}

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        lo, hi = None, None
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            az = zavg[row.zone]
            contrib = zw[row.zone] * tfs / ((1.0 - b) + b * dls / az)
            by_term.setdefault(row.term, []).append((docs, contrib))
            lo = int(docs[0]) if lo is None else min(lo, int(docs[0]))
            hi = int(docs[-1]) if hi is None else max(hi, int(docs[-1]))
        if lo is None:
            return pd.DataFrame({"doc_id": [], "score": []})
        acc = np.zeros(hi - lo + 1, dtype=np.float64)
        for term in sorted(by_term):  # pinned ascending-term sum order
            idf = idf_map.get(term)
            if idf is None:
                continue
            wtf = np.zeros(hi - lo + 1, dtype=np.float64)
            for docs, contrib in by_term[term]:
                wtf[docs - lo] += contrib
            nz = wtf > 0.0
            acc[nz] += idf * wtf[nz] / (k1 + wtf[nz])
        nzi = np.flatnonzero(acc)
        if nzi.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        return _topk_frame(nzi + lo, acc[nzi], k)

    local = hits.groupBy("shard").applyInPandas(score, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def parse_query(q: str, stem: bool = True, camel: bool = True
                ) -> tuple[list[str], list[str], list[str],
                           list[list[str]], list[list[str]]]:
    """Web-search query syntax -> ``(required, optional, excluded,
    phrases, excluded_phrases)``.

    ``+word`` requires, ``-word`` excludes, bare words are optional
    (score-contributing). ``"some words"`` is a required exact phrase
    (its terms also gate + score like ``+`` terms); ``-"some words"``
    excludes documents containing the exact phrase (its terms neither
    gate nor score). Each token runs through the build tokenizer, so a
    marker applies to every term it expands to (e.g. ``+getNode``
    requires both ``get`` and ``node`` under camel splitting; a quoted
    ``"getNode tree"`` matches the consecutive positions the build
    tokenizer emitted: get, node, tree). Single-term phrases fold into
    plain required/excluded terms — positions add nothing there."""
    import re

    req: set[str] = set()
    opt: set[str] = set()
    exc: set[str] = set()
    phrases: list[list[str]] = []
    neg_phrases: list[list[str]] = []

    def grab(m: "re.Match[str]") -> str:
        terms = tokenize(m.group(2), stem=stem, camel=camel)
        if not terms:
            return " "
        neg = m.group(1) == "-"
        if len(terms) == 1:  # presence == phrase match for one term
            (exc if neg else req).add(terms[0])
        else:
            (neg_phrases if neg else phrases).append(terms)
        return " "

    rest = re.sub(r'([+-]?)"([^"]*)"', grab, q)
    for raw in rest.split():
        if raw.startswith("+"):
            dst, body = req, raw[1:]
        elif raw.startswith("-"):
            dst, body = exc, raw[1:]
        else:
            dst, body = opt, raw
        dst.update(tokenize(body, stem=stem, camel=camel))
    req.update(t for ph in phrases for t in ph)  # phrase terms gate+score
    opt -= req  # a term both required and bare is just required
    # dedupe phrases (list-of-list, tiny)
    phrases = [list(p) for p in dict.fromkeys(map(tuple, phrases))]
    neg_phrases = [list(p) for p in
                   dict.fromkeys(map(tuple, neg_phrases))]
    return sorted(req), sorted(opt), sorted(exc), phrases, neg_phrases


def search_dsl(index: DataFrame, docs: DataFrame | None, stats: dict,
               q: str, k: int = 10, stem: bool = True,
               use_wand: bool | str = "auto", camel: bool = True,
               zone: str | None = None,
               tombstones: DataFrame | None = None,
               shard_size: int = 4096,
               restrict: DataFrame | None = None) -> DataFrame:
    """Top-k BM25 under web-search syntax: ``+required bare -excluded
    "exact phrase" -"excluded phrase"``.

    ``restrict``/``tombstones`` compose exactly as in :func:`search`
    (shard-cogrouped allow/deny sets).

    Semantics: a doc matches iff it contains EVERY ``+term``, EVERY
    quoted phrase at consecutive positions, NO ``-term`` and NO
    ``-"quoted phrase"``; bare terms add BM25 score without gating the
    match (with no ``+terms``/phrases at all, bare terms form a plain
    disjunctive query). A positive phrase's terms also gate and score
    like ``+`` terms; a negative phrase's terms neither gate nor score
    — only the exact consecutive occurrence excludes.

    Kernel shape: candidates come from the rarest required term, the
    shard-local positional phrase intersection (``allowed``) narrows
    them before any probing, the other required terms compact them,
    optional terms are probed at the survivors for contributions,
    exclusions and negative-phrase matches drop before the top-k — all
    block-targeted decodes (:func:`_score_shard_conjunctive`). Phrase
    gates need a positions build (``build_index(positions=True)``).
    """
    spark = index.sparkSession
    req, opt, exc, phrases, neg_phrases = parse_query(
        q, stem=stem, camel=camel)
    qterms = sorted(set(req) | set(opt))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if (phrases or neg_phrases) and "pos_blob" not in index.columns:
        raise ValueError(
            "quoted phrases need a positional index — rebuild with "
            "build_index(..., positions=True)")
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    index = pin_zone(index, zone)
    merged_form = "shard" not in index.columns
    if merged_form:
        index = index.withColumn("shard", F.lit(0))
    negp_terms = {t for ph in neg_phrases for t in ph}
    hits = index.filter(
        F.col("term").isin(sorted(set(qterms) | set(exc) | negp_terms)))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
              / (F.col("df_g") + 0.5) + 1.0))

    mode = "and" if req else "or"
    local = _modal_local_topk(hits, qterms, exc, mode, avgdl, k,
                              lambda pdf: _pick_scorer(pdf, use_wand),
                              tombstones, shard_size, merged_form,
                              required=set(req) if req else None,
                              phrases=phrases, neg_phrases=neg_phrases,
                              restrict=restrict)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def term_prefix_stats(index: DataFrame | None, prefix: str, limit: int = 20,
                      zone: str | None = None,
                      dictionary: DataFrame | None = None) -> DataFrame:
    """Dictionary prefix scan: terms starting with ``prefix`` with their
    global df/cf, ascending by term, first ``limit`` rows.

    The reference's analog is walking the term dictionary from a seek
    point (its chunks serialize keys in sorted order, index.cpp:51-52).

    ``dictionary`` (preferred at scale): the compact term catalog
    published by compaction (plans/dictionary.py) — already one row per
    term with global sums, sorted-by-term at rest, so this is a pruned
    scan of millions of rows with no aggregate and the sharded index is
    never touched (``index`` may be None).

    Fallback (no compaction yet): derive from the index. The scan leans
    on sorted-at-rest — both build kernels emit term-string-sorted rows
    per shard batch, so every parquet row group carries tight term
    min/max statistics and ``StartsWith`` prunes row groups before
    decode. The aggregate is map-side combinable; only (term, df, cf)
    rows — never blobs — reach the reducer, and ``limit`` bounds the
    driver result."""
    from index_spark.operators.build import DOC_MARKER

    if dictionary is not None:
        cat = pin_zone(dictionary, zone)
        return (cat.filter(F.col("term").startswith(prefix))
                .select("term", "df", "cf")
                .orderBy(F.asc("term")).limit(limit))
    index = pin_zone(index, zone)
    return (index
            .filter(F.col("term").startswith(prefix)
                    & (F.col("term") != DOC_MARKER))
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .orderBy(F.asc("term")).limit(limit))


def damerau_distance(a: str, b: str) -> int:
    """Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner): the
    Levenshtein edits plus adjacent transposition at cost 1, with NO
    edited-substring restriction — the metric DuckDB's
    ``damerau_levenshtein`` computes, so oracles restate it exactly.
    (Lucene's fuzzy automaton uses the restricted OSA variant; the two
    coincide everywhere at distance ≤ 1 and differ only when an edited
    substring is edited again.)"""
    la, lb = len(a), len(b)
    maxd = la + lb
    h = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        h[i + 1][1] = i
    for j in range(lb + 1):
        h[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            k = last_row.get(b[j - 1], 0)
            cost = 0 if a[i - 1] == b[j - 1] else 1
            h[i + 1][j + 1] = min(
                h[i][j] + cost,          # substitute / match
                h[i + 1][j] + 1,         # insert
                h[i][j + 1] + 1,         # delete
                h[k][last_col] + (i - k - 1) + 1 + (j - last_col - 1))
            if cost == 0:
                last_col = j
        last_row[a[i - 1]] = i
    return h[la + 1][lb + 1]


@F.pandas_udf(T.IntegerType())
def _damerau_udf(t: pd.Series, q: pd.Series) -> pd.Series:
    return pd.Series([damerau_distance(a, b) for a, b in zip(t, q)],
                     dtype="int32")


def fuzzy_expand(index: DataFrame | None, qterms: list[str],
                 max_dist: int = 1, max_expansions: int = 8,
                 zone: str | None = None,
                 dictionary: DataFrame | None = None,
                 trigram: DataFrame | None = None,
                 transpositions: bool = False,
                 prefix_length: int = 0
                 ) -> dict[str, list[str]]:
    """Expand query terms to dictionary terms within Levenshtein
    distance ``max_dist``, at most ``max_expansions`` per query term
    (highest global df first, term-ascending tiebreak — the pinned
    deterministic order).

    ``dictionary`` (preferred at scale): the compact term catalog from
    compaction (plans/dictionary.py). ``levenshtein`` cannot row-group-
    prune, so the fallback index path reads the whole term column of
    every shard per query; against the catalog the same predicates scan
    millions of rows, not billions, the length-band prune hits the
    STORED ``length`` column's row-group min/max (the catalog is also
    sorted by term, clustering lengths weakly), and no aggregate runs
    at query time — the sharded index is never touched (``index`` may
    be None).

    ``trigram`` (the 10^9-vocabulary scale path): the gram-posting
    artifact from :mod:`index_spark.plans.trigram`. The catalog paths
    above still evaluate ``levenshtein`` against EVERY term row (the
    predicate cannot row-group-prune); the trigram path instead
    broadcasts the query's ~|q|+2 grams, equi-joins the gram postings
    (sorted-by-gram at rest, so the scan prunes to the probed grams),
    applies the q-gram count filter (a proven necessary condition for
    ``edit_distance <= d``), and runs ``levenshtein`` only on that
    bounded candidate set — same neighborhood, pinned by test.

    Plan (catalog sources): the catalog is filtered by the exact
    length-band necessary condition (|len(t)-len(q)| <= dist) and the
    JVM ``levenshtein`` predicate, so only the edit-distance
    neighborhood — a bounded set per query term — ever shuffles; the
    query-term relation is broadcast into a nested-loop join (it is
    |query| rows). The per-query-term rank is a window over that bounded
    candidate set, and only qterms x max_expansions rows reach the
    driver.

    ``prefix_length`` (Lucene ``FuzzyQuery`` prefix_length): the first
    N characters must match EXACTLY — candidates outside the prefix are
    never edit-distance-tested, and because the catalog and the sharded
    term metadata are both sorted by term at rest, the StartsWith
    predicate ROW-GROUP-PRUNES the scan (with prefix_length=0 the
    ``levenshtein`` predicate must read every term row — the reason ES
    recommends 1–2 at scale).  A query term shorter than
    prefix_length cannot fuzz (exact-only), same as Lucene.

    ``transpositions=True`` matches by unrestricted Damerau–Levenshtein
    (:func:`damerau_distance` — Lucene's default fuzziness treats an
    adjacent swap as ONE edit): the cheap JVM prefilters widen to the
    provable bound (a transposition costs 2 plain-Levenshtein edits, so
    DL ≤ d ⇒ lev ≤ 2d; the length band is unchanged), then the exact DL
    gate runs as an Arrow-batched UDF over only that bounded candidate
    set."""
    from pyspark.sql import Window

    from index_spark.operators.build import DOC_MARKER

    if not qterms:
        return {}
    if prefix_length < 0:
        raise ValueError(
            f"prefix_length must be >= 0, got {prefix_length}")
    lev_bound = 2 * max_dist if transpositions else max_dist

    def _prefix_pair_ok():
        # per candidate pair: first prefix_length chars equal; a query
        # term shorter than the prefix matches exactly only
        return F.when(F.length("qterm") < prefix_length,
                      F.col("term") == F.col("qterm")) \
            .otherwise(F.col("term").substr(1, prefix_length)
                       == F.col("qterm").substr(1, prefix_length))

    def _exact_gate(pairs_df):
        if prefix_length:
            pairs_df = pairs_df.filter(_prefix_pair_ok())
        if not transpositions:
            return pairs_df
        return pairs_df.filter(
            _damerau_udf(F.col("term"), F.col("qterm")) <= max_dist)
    if trigram is not None:
        from index_spark.plans.trigram import count_filter_bound, qgrams

        spark = trigram.sparkSession
        qg = [(t, len(t), g, occ) for t in qterms for g, occ in qgrams(t)]
        qdf_g = spark.createDataFrame(
            qg, "qterm string, qlen int, gram string, occ int")
        # the gram set is driver-known and tiny (~|q|+2 per term), so a
        # literal IN predicate pushes to the parquet scan and row-group-
        # prunes the sorted-by-gram artifact BEFORE the join runs
        gram_lits = sorted({g for _, _, g, _ in qg})
        pairs = (trigram.filter(F.col("gram").isin(gram_lits))
                 .join(F.broadcast(qdf_g), ["gram", "occ"])
                 .groupBy("qterm", "term")
                 .agg(F.count("*").alias("n_common"),
                      F.first("length").alias("length"),
                      F.first("qlen").alias("qlen"),
                      F.first("df").alias("df_g"))
                 .filter(F.col("n_common") >=
                         count_filter_bound(F.col("qlen"), F.col("length"),
                                            lev_bound))
                 .filter(F.levenshtein(F.col("term"), F.col("qterm"))
                         <= lev_bound))
        pairs = _exact_gate(pairs)
        w = Window.partitionBy("qterm").orderBy(F.desc("df_g"),
                                                F.asc("term"))
        rows = (pairs.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= max_expansions)
                .select("qterm", "term").collect())
        out: dict[str, list[str]] = {t: [] for t in qterms}
        for r in rows:
            out[r["qterm"]].append(r["term"])
        return out
    lens = [len(t) for t in qterms]
    near_any = None
    for t in qterms:
        c = F.levenshtein(F.col("term"), F.lit(t)) <= lev_bound
        if prefix_length:
            # sorted-at-rest term columns: StartsWith row-group-prunes
            # the scan before any levenshtein evaluates
            c = c & (F.col("term").startswith(t[:prefix_length])
                     if len(t) >= prefix_length
                     else (F.col("term") == t))
        near_any = c if near_any is None else (near_any | c)
    if dictionary is not None:
        spark = dictionary.sparkSession
        cat = pin_zone(dictionary, zone)
        band = F.col("length").between(min(lens) - max_dist,
                                       max(lens) + max_dist)
        cand = (cat.filter(band & near_any)
                .select("term", F.col("df").alias("df_g")))
    else:
        spark = index.sparkSession
        index = pin_zone(index, zone)
        band = F.length("term").between(min(lens) - max_dist,
                                        max(lens) + max_dist)
        cand = (index.filter((F.col("term") != DOC_MARKER) & band & near_any)
                .groupBy("term").agg(F.sum("df").alias("df_g")))
    qdf = spark.createDataFrame([(t,) for t in qterms], "qterm string")
    pairs = _exact_gate(cand.join(
        F.broadcast(qdf),
        F.levenshtein(F.col("term"), F.col("qterm")) <= lev_bound))
    w = Window.partitionBy("qterm").orderBy(F.desc("df_g"), F.asc("term"))
    rows = (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_expansions)
            .select("qterm", "term").collect())
    out: dict[str, list[str]] = {t: [] for t in qterms}
    for r in rows:
        out[r["qterm"]].append(r["term"])
    return out


_SUGGEST_SCHEMA = T.StructType([
    T.StructField("qterm", T.StringType(), False),
    T.StructField("suggestion", T.StringType(), False),
    T.StructField("df", T.LongType(), False),
])


def suggest_corrections(index: DataFrame | None, query: str,
                        max_dist: int = 1,
                        stem: bool = True, camel: bool = True,
                        zone: str | None = None,
                        dictionary: DataFrame | None = None,
                        trigram: DataFrame | None = None) -> DataFrame:
    """"Did you mean": for each query term ABSENT from the dictionary,
    the most popular dictionary term within edit distance ``max_dist``
    (df desc, term asc — the same pinned order as
    :func:`fuzzy_expand`). Terms the index knows produce no row; absent
    terms with no neighbor produce no row either.

    ``dictionary``: the compact term catalog from compaction
    (plans/dictionary.py) — the presence probe and df lookup become
    point-pruned catalog scans and the sharded index is never touched
    (``index`` may be None).

    Two bounded jobs: a term-pruned presence/df probe (<= |query| rows),
    then the fuzzy-expansion lookup capped at one candidate per absent
    term."""
    cat = dictionary if dictionary is not None else index
    spark = cat.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], _SUGGEST_SCHEMA)
    zcat = pin_zone(cat, zone)
    present = {r["term"] for r in
               zcat.filter(F.col("term").isin(qterms))
               .select("term").distinct().collect()}
    missing = [t for t in qterms if t not in present]
    if not missing:
        return spark.createDataFrame([], _SUGGEST_SCHEMA)
    exp = fuzzy_expand(index, missing, max_dist=max_dist,
                       max_expansions=1, zone=zone, dictionary=dictionary,
                       trigram=trigram)
    best = sorted({s for v in exp.values() for s in v})
    if not best:
        dfs: dict[str, int] = {}
    elif dictionary is not None:
        dfs = {r["term"]: int(r["df"]) for r in
               zcat.filter(F.col("term").isin(best))
               .select("term", "df").collect()}
    else:
        dfs = {r["term"]: int(r["df_g"]) for r in
               zcat.filter(F.col("term").isin(best))
               .groupBy("term").agg(F.sum("df").alias("df_g")).collect()}
    rows = [(t, exp[t][0], dfs[exp[t][0]])
            for t in missing if exp.get(t)]
    return spark.createDataFrame(rows, _SUGGEST_SCHEMA)


_WORDBREAK_SCHEMA = T.StructType([
    T.StructField("qterm", T.StringType(), False),
    T.StructField("suggestion", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("score", T.LongType(), False),
])


def suggest_word_breaks(index: DataFrame | None, query: str,
                        min_part_len: int = 2, top: int = 3,
                        stem: bool = True, camel: bool = True,
                        zone: str | None = None,
                        dictionary: DataFrame | None = None) -> DataFrame:
    """Word-break spell checking (Lucene ``WordBreakSpellChecker``):
    for each raw query token ABSENT from the dictionary, SPLIT
    suggestions — every split position whose two halves both resolve
    to dictionary terms, ranked by summed global df (ties -> earliest
    split); and for each ADJACENT raw token pair, a COMBINE suggestion
    when their concatenation resolves to a dictionary term (score =
    its df).  "datatable" -> "data table"; "win dow" -> "window".

    Returns (qterm, suggestion, kind, score): kind ``split`` has the
    space-joined halves as the suggestion, kind ``combine`` has the
    concatenation and the space-joined pair as ``qterm``; at most
    ``top`` split rows per token.  Halves/concatenations probe the
    catalog THROUGH the caller's stem/camel tokenizer (a stemmed index
    stores stemmed halves).

    Scale shape: candidates are query-bounded (|tokens| x token
    length); ONE ``isin``-pruned catalog scan resolves every probe's
    df, then ranking is driver-side over the bounded candidate set —
    the same two-bounded-jobs contract as :func:`suggest_corrections`.
    """
    if min_part_len < 1:
        raise ValueError(f"min_part_len must be >= 1, got {min_part_len}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    cat = dictionary if dictionary is not None else index
    spark = cat.sparkSession
    raw = [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]
    if not raw:
        return spark.createDataFrame([], _WORDBREAK_SCHEMA)

    def probe(text: str) -> str | None:
        toks = tokenize(text, stem=stem, camel=camel)
        return toks[0] if len(toks) == 1 else None

    splits: list[tuple[str, int, str, str, str, str]] = []
    for t in dict.fromkeys(raw):
        for i in range(min_part_len, len(t) - min_part_len + 1):
            left, right = t[:i], t[i:]
            lp, rp = probe(left), probe(right)
            if lp and rp:
                splits.append((t, i, left, right, lp, rp))
    combines: list[tuple[str, str, str]] = []
    for a, b in zip(raw, raw[1:]):
        cp = probe(a + b)
        if cp:
            combines.append((a, b, cp))
    probes = ({p for s in splits for p in (s[4], s[5])}
              | {c[2] for c in combines}
              | {probe(t) for t in raw if probe(t)})
    if not probes:
        return spark.createDataFrame([], _WORDBREAK_SCHEMA)
    zcat = pin_zone(cat, zone)
    if dictionary is not None:
        dfs = {r["term"]: int(r["df"]) for r in
               zcat.filter(F.col("term").isin(sorted(probes)))
               .select("term", "df").collect()}
    else:
        from index_spark.operators.build import DOC_MARKER

        dfs = {r["term"]: int(r["df_g"]) for r in
               zcat.filter(F.col("term") != DOC_MARKER)
               .filter(F.col("term").isin(sorted(probes)))
               .groupBy("term").agg(F.sum("df").alias("df_g")).collect()}
    rows: list[tuple[str, str, str, int]] = []
    per_term: dict[str, list[tuple[int, int, str]]] = {}
    for t, i, left, right, lp, rp in splits:
        if dfs.get(probe(t)) is not None:
            continue            # token is known: no split suggestions
        if lp in dfs and rp in dfs:
            per_term.setdefault(t, []).append(
                (dfs[lp] + dfs[rp], i, f"{left} {right}"))
    for t, cands in per_term.items():
        cands.sort(key=lambda c: (-c[0], c[1]))
        rows.extend((t, sug, "split", score)
                    for score, _, sug in cands[:top])
    for a, b, cp in combines:
        # Lucene WordBreakSpellChecker's SUGGEST_WHEN_NOT_IN_INDEX
        # default, mirrored from the split path: only suggest a combine
        # when at least one constituent is absent from the catalog (two
        # valid dictionary words side by side are not a typo)
        if cp in dfs and (dfs.get(probe(a)) is None
                          or dfs.get(probe(b)) is None):
            rows.append((f"{a} {b}", cp, "combine", dfs[cp]))
    return spark.createDataFrame(rows, _WORDBREAK_SCHEMA)


def auto_fuzziness(term: str, low: int = 3, high: int = 6) -> int:
    """ES ``fuzziness: AUTO[:low,high]`` (the ES default): terms
    shorter than ``low`` must match exactly, terms shorter than
    ``high`` allow one edit, longer terms allow two — short strings
    are mostly distinct words, not typos."""
    n = len(term)
    return 0 if n < low else (1 if n < high else 2)


def search_fuzzy(index: DataFrame, docs: DataFrame | None, stats: dict,
                 query: str, k: int = 10, max_dist: int | str = 1,
                 max_expansions: int = 8, stem: bool = True,
                 camel: bool = True, shard_size: int = 4096,
                 zone: str | None = None, mode: str = "or",
                 exclude: str | None = None,
                 dictionary: DataFrame | None = None,
                 trigram: DataFrame | None = None,
                 transpositions: bool = False,
                 prefix_length: int = 0, **kw) -> DataFrame:
    """Typo-tolerant top-k BM25: each query term expands to its
    edit-distance neighborhood in the index dictionary
    (:func:`fuzzy_expand`; pass ``dictionary`` — the compacted term
    catalog — so the expansion reads millions of catalog rows instead
    of scanning every sharded-index term row), then one search runs
    over the distinct expanded terms — every variant scored with its OWN global idf (a
    rare misspelling contributes high-idf hits next to the common
    form), the standard disjunctive fuzzy semantic.

    ``mode="and"`` is group-conjunctive: AND across the ORIGINAL query
    terms, OR within each term's expansion set — a doc must contain at
    least one variant of EVERY original term (never "every variant of
    every term", which would be almost always empty). An original term
    with no dictionary neighborhood cannot be satisfied, so the result
    is empty — the same contract as a missing term in plain AND.

    ``exclude`` is tokenized HERE with the caller's stem/camel flags
    (the inner search runs stem=False because expanded terms are already
    dictionary tokens — exclusions must not skip stemming with it).

    ``transpositions=True`` expands by Damerau–Levenshtein (an adjacent
    swap = ONE edit, Lucene's default fuzziness) — see
    :func:`fuzzy_expand`.

    ``max_dist="auto"`` applies ES's default length-banded fuzziness
    (:func:`auto_fuzziness`): terms group by their AUTO distance and
    expand per group — at most three bounded catalog lookups (d=0 is
    an exact-presence probe), then still ONE scoring search.

    Two jobs total: the bounded dictionary-expansion lookup, then the
    one-exchange scoring plan of :func:`search`."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if max_dist == "auto":
        byd: dict[int, list[str]] = {}
        for t in qterms:
            byd.setdefault(auto_fuzziness(t), []).append(t)
        exp = {}
        for d, ts in sorted(byd.items()):
            exp.update(fuzzy_expand(index, ts, max_dist=d,
                                    max_expansions=max_expansions,
                                    zone=zone, dictionary=dictionary,
                                    trigram=trigram,
                                    transpositions=transpositions,
                                    prefix_length=prefix_length))
    else:
        exp = fuzzy_expand(index, qterms, max_dist=max_dist,
                           max_expansions=max_expansions, zone=zone,
                           dictionary=dictionary, trigram=trigram,
                           transpositions=transpositions,
                           prefix_length=prefix_length)
    terms = sorted({t for v in exp.values() for t in v})
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if exclude is not None:
        exclude = " ".join(
            sorted(set(tokenize(exclude, stem=stem, camel=camel)))) or None
    groups = None
    if mode == "and":
        if any(not exp.get(t) for t in qterms):
            return spark.createDataFrame([], TOPK_SCHEMA)
        gids: dict[str, list[int]] = {}
        for i, t in enumerate(qterms):
            for v in exp[t]:  # a variant near several originals gates all
                gids.setdefault(v, []).append(i)
        groups = {v: tuple(g) for v, g in gids.items()}
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, zone=zone,
                  mode=mode, exclude=exclude, groups=groups, **kw)


def search_synonyms(index: DataFrame, docs: DataFrame | None, stats: dict,
                    query: str, synonyms: dict[str, list[str]], k: int = 10,
                    stem: bool = True, camel: bool = True,
                    shard_size: int = 4096, zone: str | None = None,
                    mode: str = "or", exclude: str | None = None,
                    **kw) -> DataFrame:
    """Query-time synonym/alias expansion: each ORIGINAL query term
    expands to itself plus its synonym set (keys and values both pass
    through the caller's tokenizer flags, so a stemmed index gets
    stemmed variants; a multi-word synonym contributes each token).

    Scoring mirrors :func:`search_fuzzy`'s expansion contract: every
    variant scores with its OWN global idf (Lucene's SynonymQuery
    instead blends df across the group — an own-idf variant is what
    keeps the semantics exactly SQL-restatable). ``mode="and"`` is
    group-conjunctive: a doc must contain >= 1 variant of EVERY
    original query term (OR within each synonym group). Synonyms for
    terms not in the query are ignored; a variant shared by several
    originals gates all of them.

    Same plan as :func:`search` — the expansion is a driver-side dict
    lookup (no extra job), then one one-exchange scoring pass."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    exp: dict[str, set[str]] = {t: {t} for t in qterms}
    for key, vals in synonyms.items():
        kt = tokenize(key, stem=stem, camel=camel)
        if len(kt) != 1:
            raise ValueError(f"synonym key must tokenize to one term: "
                             f"{key!r} -> {kt}")
        if kt[0] not in exp:
            continue
        for v in vals:
            exp[kt[0]].update(tokenize(v, stem=stem, camel=camel))
    terms = sorted({t for v in exp.values() for t in v})
    if exclude is not None:
        exclude = " ".join(
            sorted(set(tokenize(exclude, stem=stem, camel=camel)))) or None
    groups = None
    if mode == "and":
        gids: dict[str, list[int]] = {}
        for i, t in enumerate(qterms):
            for v in exp[t]:
                gids.setdefault(v, []).append(i)
        groups = {v: tuple(g) for v, g in gids.items()}
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, zone=zone,
                  mode=mode, exclude=exclude, groups=groups, **kw)


def wildcard_expand(index: DataFrame | None, patterns: list[str],
                    max_expansions: int = 32, zone: str | None = None,
                    dictionary: DataFrame | None = None,
                    rdictionary: DataFrame | None = None
                    ) -> dict[str, list[str]]:
    """Expand wildcard patterns (``*`` = any run, ``?`` = one char —
    Lucene WildcardQuery glob syntax) to matching dictionary terms, at
    most ``max_expansions`` per pattern (highest global df first,
    term-ascending tiebreak — same pinned order as fuzzy expansion).

    ``dictionary`` (preferred at scale): the compact term catalog.
    Either source additionally pushes a ``StartsWith`` on the pattern's
    literal prefix (everything before the first wildcard) — against the
    term-sorted catalog that row-group-prunes, so ``tab*`` touches one
    term range.  A LEADING-wildcard pattern has no prefix: without
    ``rdictionary`` it scans the catalog's term column (millions of
    rows, never the sharded index's billions — the classic documented
    cost of leading wildcards); WITH ``rdictionary`` (the rterm-sorted
    companion projection compaction publishes,
    :func:`~index_spark.plans.dictionary.load_reversed_dictionary` —
    the Solr ReversedWildcardFilter trade) a pattern with a literal
    SUFFIX (``*ing``) pushes ``StartsWith`` on the stored ``rterm``
    column instead and row-group-prunes symmetrically.  Terms are
    [a-z0-9]+ so the LIKE translation needs no escaping. Only
    patterns x max_expansions rows reach the driver."""
    from pyspark.sql import Window

    from index_spark.operators.build import DOC_MARKER

    if not patterns:
        return {}
    if dictionary is not None:
        cat = pin_zone(dictionary, zone).select(
            "term", F.col("df").alias("df_g"))
    else:
        cat = (pin_zone(index, zone)
               .filter(F.col("term") != DOC_MARKER)
               .groupBy("term").agg(F.sum("df").alias("df_g")))
    rcat = None
    if rdictionary is not None:
        rcat = pin_zone(rdictionary, zone).select(
            "term", F.col("df").alias("df_g"), "rterm")
    out: dict[str, list[str]] = {}
    for p in patterns:
        like = p.lower().replace("*", "%").replace("?", "_")
        cond = F.col("term").like(like)
        prefix = re.split(r"[*?]", p.lower(), maxsplit=1)[0]
        src = cat
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        else:
            suffix = re.split(r"[*?]", p.lower())[-1]
            if suffix and rcat is not None:
                src = rcat
                cond = F.col("rterm").startswith(suffix[::-1]) & cond
        w = Window.orderBy(F.desc("df_g"), F.asc("term"))
        rows = (src.filter(cond)
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= max_expansions)
                .select("term").collect())
        out[p] = sorted(r["term"] for r in rows)
    return out


def search_wildcard(index: DataFrame, docs: DataFrame | None, stats: dict,
                    query: str, k: int = 10, max_expansions: int = 32,
                    stem: bool = True, camel: bool = True,
                    shard_size: int = 4096, zone: str | None = None,
                    mode: str = "or", exclude: str | None = None,
                    dictionary: DataFrame | None = None,
                    rdictionary: DataFrame | None = None,
                    **kw) -> DataFrame:
    """Wildcard-aware top-k BM25: whitespace tokens containing ``*`` or
    ``?`` expand against the term catalog (:func:`wildcard_expand`;
    ``rdictionary`` accelerates leading-wildcard suffix patterns);
    plain tokens pass through the caller's stem/camel tokenizer. Every
    expanded variant scores with its own global idf; ``mode="and"`` is
    group-conjunctive (>= 1 match of EVERY original token — same
    contract as fuzzy/synonym expansion). A pattern matching nothing
    empties an AND result, mirroring a missing literal term."""
    spark = index.sparkSession
    raw = [w for w in query.split() if w]
    pats = sorted({w.lower() for w in raw if "*" in w or "?" in w})
    lit_q = " ".join(w for w in raw if "*" not in w and "?" not in w)
    lits = sorted(set(tokenize(lit_q, stem=stem, camel=camel)))
    exp: dict[str, set[str]] = {t: {t} for t in lits}
    for p, terms in wildcard_expand(index, pats, max_expansions, zone,
                                    dictionary, rdictionary).items():
        exp[p] = set(terms)
    originals = sorted(exp)
    terms = sorted({t for v in exp.values() for t in v})
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if exclude is not None:
        exclude = " ".join(
            sorted(set(tokenize(exclude, stem=stem, camel=camel)))) or None
    groups = None
    if mode == "and":
        if any(not exp[t] for t in originals):
            return spark.createDataFrame([], TOPK_SCHEMA)
        gids: dict[str, list[int]] = {}
        for i, t in enumerate(originals):
            for v in exp[t]:
                gids.setdefault(v, []).append(i)
        groups = {v: tuple(g) for v, g in gids.items()}
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, zone=zone,
                  mode=mode, exclude=exclude, groups=groups, **kw)


def complete_terms(index: DataFrame | None, prefix: str, limit: int = 10,
                   zone: str | None = None,
                   dictionary: DataFrame | None = None) -> DataFrame:
    """Query autocompletion: dictionary terms under ``prefix`` ranked by
    global df (desc; term-ascending tiebreak). Same pushed-StartsWith,
    pruned scan as :func:`term_prefix_stats` — against the compacted
    term catalog when ``dictionary`` is given (no aggregate, sharded
    index untouched), else the blob-pruned index fallback. The
    popularity cut is a TakeOrderedAndProject tail, so only ``limit``
    rows reach the driver no matter how wide the prefix."""
    from index_spark.operators.build import DOC_MARKER

    if dictionary is not None:
        cat = pin_zone(dictionary, zone)
        return (cat.filter(F.col("term").startswith(prefix))
                .select("term", "df")
                .orderBy(F.desc("df"), F.asc("term")).limit(limit))
    index = pin_zone(index, zone)
    return (index
            .filter(F.col("term").startswith(prefix)
                    & (F.col("term") != DOC_MARKER))
            .groupBy("term").agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term")).limit(limit))


def resolve_topk(topk: DataFrame, docs: DataFrame) -> DataFrame:
    """Serving response assembly: attach the document keys (repo, path)
    to a top-k relation. The k-row top-k side broadcasts into the docs
    dimension scan (a pushdown semi-join — touches k dimension rows at
    any corpus scale); row order re-pinned to (score desc, doc_id)."""
    return (docs.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "repo", "path")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def snippets(topk: DataFrame, corpus_with_ids: DataFrame, query: str,
             stem: bool = True, camel: bool = True, before: int = 20,
             width: int = 80) -> DataFrame:
    """Attach a deterministic context snippet to each top-k hit.

    For each (doc_id, score) row, the snippet is the ``width``-char
    substring of the original content starting ``before`` chars before
    the first case-insensitive occurrence of any query term (the
    earliest position across terms; docs where no term occurs literally
    — e.g. only via stemming — fall back to the document head).

    Plan shape: the top-k relation (k rows) broadcasts into the corpus
    scan, so snippet extraction touches exactly k documents' content at
    any corpus scale — a pushdown semi-join, then pure JVM string
    expressions (lower/instr/substring); no Python, no extra shuffle.
    Returns (doc_id, score, pos, snippet); ``pos`` is the 1-based match
    position (1 when falling back).
    """
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:  # empty query: empty relation, like every entry point
        return (corpus_with_ids.join(F.broadcast(topk), "doc_id")
                .select("doc_id", "score", F.lit(1).cast("long").alias("pos"),
                        F.lit("").alias("snippet")).limit(0))
    hay = F.lower(F.col("content"))
    pos_cols = [
        F.when(F.instr(hay, t) > 0, F.instr(hay, t)) for t in qterms
    ]
    pos = F.least(*pos_cols) if len(pos_cols) > 1 else pos_cols[0]
    joined = corpus_with_ids.join(F.broadcast(topk), "doc_id")
    return (joined
            .withColumn("pos", F.coalesce(pos, F.lit(1)).cast("long"))
            .withColumn("start",
                        F.greatest(F.lit(1), F.col("pos") - before))
            .select("doc_id", "score", "pos",
                    F.expr(f"substring(content, start, {int(width)})")
                    .alias("snippet")))


EXPLAIN_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.LongType(), False),
    T.StructField("doc_len", T.LongType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("idf", T.DoubleType(), False),
    T.StructField("contribution", T.DoubleType(), False),
])


def style_weighted_search(index: DataFrame, docs: DataFrame | None,
                          stats: dict, query: str, k: int = 10,
                          style_weights: tuple = (1.0, 1.1, 1.25, 1.5),
                          stem: bool = True, camel: bool = True,
                          zone: str | None = None,
                          style_shift: int = 2) -> DataFrame:
    """Top-k BM25 over a STYLED positional index where each occurrence
    contributes its style's weight instead of 1 — the ranking signal the
    reference's 2-bit channel exists for (Heading/Bold hits weigh more,
    /root/reference/index.h:44-60). ``style_weights[code]`` maps the
    packed style code (functions/style.py: Normal/Italic/Bold/Heading)
    to an occurrence weight; all-ones reproduces :func:`search` scores.

    Per term, the weighted tf replaces tf inside the same saturation:
    score = idf * wtf / (wtf + k1 * (1 - b + b * dl/avgdl)), idf and dl
    unchanged (document frequency and length are style-independent).

    Plan shape = the one-exchange scoring plan of :func:`search`
    (term-pruned scan, map-side df aggregate + broadcast join-back,
    per-shard vectorized kernel, TakeOrderedAndProject): the only
    addition is decoding pos_blob's low bits and one
    ``np.add.reduceat`` per posting run — no per-occurrence Python.

    ``docs`` accepted for API symmetry (unused — lengths live in
    dl_blob). Requires a ``style_spans`` build; on a plain positional
    index every occurrence decodes as style 0 (weights[0], a uniform
    scale).
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if len(style_weights) < (1 << style_shift):
        raise ValueError(f"need {1 << style_shift} style weights")
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    w_arr = np.asarray(style_weights, dtype=np.float64)
    mask = (1 << style_shift) - 1

    hits = pin_zone(index, zone)
    if "shard" not in hits.columns:
        hits = hits.withColumn("shard", F.lit(0))
    hits = hits.filter(F.col("term").isin(qterms))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
              / (F.col("df_g") + 0.5) + 1.0))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame({"doc_id": [], "score": []})
        all_d, all_s = [], []
        # pinned ascending (term, first_doc) iteration for deterministic
        # float accumulation across runs
        pdf = pdf.sort_values(["term", "first_doc"])
        for row in pdf.itertuples(index=False):
            docs_a = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.int64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            codes = (vb.decode(row.pos_blob).astype(np.int64) & mask)
            if codes.size != int(tfs.sum()):
                raise ValueError(
                    "pos_blob length mismatch — style_weighted_search "
                    "needs a positional (style_spans) build")
            occ_w = w_arr[codes]
            seg = np.concatenate(([0], np.cumsum(tfs)[:-1]))
            wtf = np.add.reduceat(occ_w, seg) if occ_w.size \
                else np.zeros(0, np.float64)
            c = float(row.idf) * wtf / (
                wtf + K1 * (1.0 - B + B * dls / avgdl))
            all_d.append(docs_a)
            all_s.append(c)
        d = np.concatenate(all_d)
        s = np.concatenate(all_s)
        if d.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        lo = int(d.min())
        acc = np.bincount(d - lo, weights=s)
        nz = np.flatnonzero(acc)
        out = pd.DataFrame({"doc_id": (nz + lo).astype(np.int64),
                            "score": acc[nz]})
        if len(out) > k:
            out = out.sort_values(["score", "doc_id"],
                                  ascending=[False, True]).head(k)
        return out

    local = hits.groupBy("shard").applyInPandas(kernel, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def explain_score(index: DataFrame, stats: dict, query: str,
                  doc_ids: list[int], stem: bool = True,
                  camel: bool = True, zone: str | None = None
                  ) -> DataFrame:
    """Per-term BM25 contribution breakdown for specific documents —
    the scoring-transparency/debug surface (Lucene ``explain`` analog).

    Returns one row per (doc, query term) the doc actually contains:
    (doc_id, term, tf, doc_len, df, idf, contribution) with
    contribution = idf * tf / (tf + k1*(1-b+b*doc_len/avgdl)); summing
    a doc's contributions reproduces its ``search`` score exactly (same
    formula, same stats).

    Plan: the usual term-pruned scan + global-df broadcast join-back,
    then each shard block-probes ONLY the target docs (the explain set
    is k docs — it rides the task closure; probes decode no block a
    target doc doesn't touch). Cost O(|doc_ids| x terms) probes total.
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    targets = np.unique(np.asarray(sorted(doc_ids), dtype=np.int64))
    if not qterms or targets.size == 0:
        return spark.createDataFrame([], EXPLAIN_SCHEMA)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(F.col("term").isin(qterms))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf", F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
                     / (F.col("df_g") + 0.5) + 1.0))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [] for k in ("doc_id", "term", "tf", "doc_len",
                               "df", "idf", "contribution")}
        for mt, df_g in zip(_lists_meta(pdf, avgdl),
                            pdf["df_g"].astype("int64")):
            lc = _ListCache(mt)
            nb = mt["blk_last"].size
            cov = np.searchsorted(mt["blk_last"], targets, side="left")
            lc.ensure(np.unique(cov[cov < nb]))
            docs, tfs, dls = lc.docs, lc.tfs, lc.dls
            idx = np.searchsorted(docs, targets)
            hit = idx < docs.size
            hit[hit] = docs[idx[hit]] == targets[hit]
            sel = idx[hit]
            if not sel.size:
                continue
            contrib = _contrib(mt, tfs[sel], dls[sel])
            out["doc_id"].extend(targets[hit].tolist())
            out["term"].extend([mt["term"]] * int(sel.size))
            out["tf"].extend(tfs[sel].astype(np.int64).tolist())
            out["doc_len"].extend(dls[sel].astype(np.int64).tolist())
            out["df"].extend([int(df_g)] * int(sel.size))
            out["idf"].extend([mt["idf"]] * int(sel.size))
            out["contribution"].extend(contrib.tolist())
        return pd.DataFrame(out)

    return (hits.groupBy("shard").applyInPandas(fn, schema=EXPLAIN_SCHEMA)
            .orderBy("doc_id", "term"))


def more_like_this(index: DataFrame, docs: DataFrame | None, stats: dict,
                   corpus_with_ids: DataFrame, doc_id: int, k: int = 10,
                   top_terms: int = 10, stem: bool = True,
                   camel: bool = True, shard_size: int = 4096,
                   exclude_self: bool = True, **kw) -> DataFrame:
    """Find documents similar to a given document (classic
    more-like-this): the source doc's distinct terms rank by tf*idf,
    the ``top_terms`` best (tfidf desc, term asc — pinned order) form
    one OR query, and the source doc itself is tombstoned out of the
    result (``exclude_self``).

    Plan: one pushdown point-read of the source row (doc_id predicate
    into the corpus scan), driver-side tokenize of that single document
    (the forward-index step — bounded by ONE doc's length at any corpus
    scale), one bounded term-pruned df aggregate (<= the doc's
    vocabulary, small rows only), then the standard one-exchange scoring
    plan of :func:`search`. idf uses the same global-stats formula as
    scoring, so term selection and ranking agree."""
    spark = index.sparkSession
    rows = (corpus_with_ids.filter(F.col("doc_id") == int(doc_id))
            .select("content").collect())
    if not rows:
        return spark.createDataFrame([], TOPK_SCHEMA)
    from collections import Counter

    tf = Counter(tokenize(rows[0]["content"], stem=stem, camel=camel))
    if not tf:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs = stats["n_docs"]
    dfs = (index.filter(F.col("term").isin(sorted(tf)))
           .groupBy("term").agg(F.sum("df").alias("df_g")).collect())
    scored = []
    for r in dfs:
        t, df_g = r["term"], int(r["df_g"])
        idf = math.log((n_docs - df_g + 0.5) / (df_g + 0.5) + 1.0)
        scored.append((-tf[t] * idf, t))
    scored.sort()
    terms = sorted(t for _, t in scored[:top_terms])
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    tomb = (spark.createDataFrame([(int(doc_id),)], "doc_id long")
            if exclude_self else None)
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, tombstones=tomb,
                  **kw)


def rescore_search(index: DataFrame, docs: DataFrame | None, stats: dict,
                   query: str, term_a: str, term_b: str, k: int = 10,
                   rescore_window: int = 50, weight: float = 1.0,
                   proximity_window: int = 5, stem: bool = True,
                   camel: bool = True, shard_size: int = 4096,
                   **kw) -> DataFrame:
    """Two-stage retrieval with a proximity rescore window (the
    Elasticsearch ``rescore`` API shape): stage 1 takes the top
    ``rescore_window`` docs by plain BM25; stage 2 recomputes only
    those candidates with a positional pair-proximity signal and
    returns the top-k of ``bm25 + weight * ln(1 + n_matches)``, where
    ``n_matches`` counts ordered (term_a, term_b) position pairs within
    ``proximity_window`` (:func:`~index_spark.operators.phrase.
    proximity_search` semantics; requires a positional index).

    Scale contract: the expensive positional pass never touches the
    whole corpus — stage-1 candidates are a k-bounded collect (the ES
    contract: the window is small, same order as k), their doc-range
    shards prune the positional scan to <= ``rescore_window`` shards,
    and the rescore join is window-bounded. The log1p saturation keeps
    a pathological candidate with thousands of pair hits from drowning
    the relevance score (the standard rescore-combine shape)."""
    from index_spark.operators.phrase import proximity_search

    spark = index.sparkSession
    top = search(index, docs, stats, query, k=rescore_window, stem=stem,
                 camel=camel, shard_size=shard_size, **kw)
    cand = top.collect()  # bounded by rescore_window
    if not cand:
        return spark.createDataFrame([], TOPK_SCHEMA)
    ids = sorted(int(r["doc_id"]) for r in cand)
    pruned = index
    n_shards = 1
    if "shard" in index.columns:
        shards = sorted({d // shard_size for d in ids})
        n_shards = len(shards)
        pruned = index.filter(F.col("shard").isin(shards))
    # the positional top-k must cover every doc in the pruned shards so
    # no candidate's count is crowded out before the join-back
    prox = proximity_search(pruned, None, term_a, term_b,
                            window=proximity_window,
                            k=n_shards * shard_size, stem=stem,
                            camel=camel, shard_size=shard_size)
    cand_df = spark.createDataFrame(
        [(int(r["doc_id"]), float(r["score"])) for r in cand],
        "doc_id long, score double")
    # ln(1 + n) over an exact integer n (not log1p: the oracle restates
    # ln(1 + n) and the two can differ in the last ulp)
    rescored = (cand_df.join(prox, "doc_id", "left")
                .select("doc_id",
                        (F.col("score") + F.lit(float(weight))
                         * F.log(F.coalesce(F.col("n_matches"), F.lit(0))
                                 .cast("double") + F.lit(1.0)))
                        .alias("score")))
    return rescored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


MULTI_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _score_shard_multi(pdf: pd.DataFrame, avgdl: float,
                       qmap: dict[int, list[str]], k: int,
                       mode: str = "or") -> pd.DataFrame:
    """Multi-query exhaustive DAAT over one shard: every term's posting
    list decodes ONCE and its per-posting BM25 contributions are shared
    across all queries containing the term; per query a numpy scatter-add
    + local top-k. Sum order stays pinned (ascending term).

    ``mode="and"``: per query, only docs containing EVERY query term
    survive — a parallel presence scatter-add masks docs whose distinct
    term count misses ``len(qmap[qid])`` (a doc's postings all live in
    its own doc-range shard, so the shard-local count is global)."""
    lists = _decode_lists(pdf, avgdl)
    contrib: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for key, docs, tfs, dls, idf, _, _, l_avgdl in lists:
        s = idf * tfs / (tfs + K1 * (1.0 - B + B * dls / l_avgdl))
        t = key[0]
        if t in contrib:
            d0, s0 = contrib[t]
            contrib[t] = (np.concatenate([d0, docs]),
                          np.concatenate([s0, s]))
        else:
            contrib[t] = (docs, s)
    out_q, out_d, out_s = [], [], []
    for qid, terms in qmap.items():
        terms_in = sorted(t for t in terms if t in contrib)
        if not terms_in or (mode == "and" and len(terms_in) < len(terms)):
            continue
        lo = min(int(contrib[t][0].min()) for t in terms_in)
        hi = max(int(contrib[t][0].max()) for t in terms_in)
        acc = np.zeros(hi - lo + 1, dtype=np.float64)
        cnt = np.zeros(hi - lo + 1, dtype=np.int32) if mode == "and" else None
        for t in terms_in:
            d, s = contrib[t]
            acc[d - lo] += s
            if cnt is not None:
                cnt[d - lo] += 1
        if cnt is not None:
            acc[cnt < len(terms)] = 0.0
        nz = np.flatnonzero(acc)
        if nz.size == 0:
            continue
        scores = acc[nz]
        order = np.lexsort((nz, -scores))[:k]
        out_q.append(np.full(order.size, qid, dtype=np.int64))
        out_d.append((nz + lo).astype(np.int64)[order])
        out_s.append(scores[order])
    if not out_q:
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "doc_id": np.empty(0, np.int64),
                             "score": np.empty(0, np.float64)})
    return pd.DataFrame({"query_id": np.concatenate(out_q),
                         "doc_id": np.concatenate(out_d),
                         "score": np.concatenate(out_s)})


def search_many(index: DataFrame, stats: dict, queries: dict[int, str],
                k: int = 10, stem: bool = True,
                camel: bool = True, zone: str | None = None,
                mode: str = "or") -> DataFrame:
    """Batch top-k BM25: the WHOLE query set in ONE Spark job.

    ``mode="and"`` applies conjunctive matching to every query in the
    batch (per-query presence mask in the shared-decode kernel).

    A zoned index is pinned to one validated zone (default ``body``),
    like :func:`search` — see :func:`pin_zone`.

    Returns (query_id, doc_id, score, rank), rank 1..k per query by
    (score desc, doc_id asc). All queries' terms prune one scan; each
    shard kernel decodes every hit list once and shares the per-posting
    contributions across queries — the throughput surface for eval-set /
    mining workloads where per-query job latency would dominate. The
    final per-query rank window sees at most shards-with-hits x k rows
    per query (pre-pruned by the shard kernel's local top-k).
    """
    from pyspark.sql import Window as W

    spark = index.sparkSession
    qmap = {int(qid): sorted(set(tokenize(q, stem=stem, camel=camel)))
            for qid, q in queries.items()}
    all_terms = sorted(set().union(*qmap.values())) if qmap else []
    if not all_terms:
        return spark.createDataFrame(
            [], T.StructType(MULTI_TOPK_SCHEMA.fields
                             + [T.StructField("rank", T.LongType(), False)]))
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(F.col("term").isin(all_terms))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
              / (F.col("df_g") + 0.5) + 1.0))

    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_shard_multi(pdf, avgdl, qmap, k, mode)

    local = hits.groupBy("shard").applyInPandas(fn, schema=MULTI_TOPK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (local.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k))


def _complete_match_scores(index: DataFrame, stats: dict,
                           qterms: list[str], exclude: str | None = None,
                           stem: bool = True, camel: bool = True,
                           use_wand: bool | str = "auto",
                           shard_size: int = 4096,
                           zone: str | None = None, mode: str = "or",
                           tombstones: DataFrame | None = None,
                           restrict: DataFrame | None = None) -> DataFrame:
    """Per-shard COMPLETE match scores (doc_id, score) — no global
    top-k cut: each doc-range shard emits all its matches (a shard
    holds <= shard_size docs, so k=shard capacity is "no cut"). The
    grouping consumers (collapse / has_child / per-bucket top hits)
    aggregate these rows map-side before the single exchange."""
    xterms = sorted(set(tokenize(exclude, stem=stem, camel=camel))
                    ) if exclude else []
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    index = pin_zone(index, zone)
    merged_form = "shard" not in index.columns
    if merged_form:
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(
        F.col("term").isin(sorted(set(qterms) | set(xterms))))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
              / (F.col("df_g") + 0.5) + 1.0))
    k_inner = int(n_docs) if merged_form else int(shard_size)
    return _modal_local_topk(hits, qterms, xterms, mode, avgdl, k_inner,
                             lambda pdf: _pick_scorer(pdf, use_wand),
                             tombstones, shard_size, merged_form,
                             restrict=restrict)


def collapse_search(index: DataFrame, docs: DataFrame, stats: dict,
                    query: str, collapse: str = "source", k: int = 10,
                    stem: bool = True, use_wand: bool | str = "auto",
                    shard_size: int = 4096, camel: bool = True,
                    zone: str | None = None, mode: str = "or",
                    exclude: str | None = None,
                    tombstones: DataFrame | None = None,
                    restrict: DataFrame | None = None) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse``): rank documents by
    BM25, keep each collapse-group's single best-scoring document, and
    return the top-k GROUPS as (group_key, doc_id, score).

    Exact at any k: group winners are computed from per-shard COMPLETE
    match scores, not from a global top-k cut (a group's best doc may
    rank arbitrarily deep overall). The plan stays the one-exchange
    query shape: each doc-range shard emits all its matches (bounded by
    ``shard_size`` docs per task — no kernel change, just k=shard
    capacity), the k-row-per-group reduction is a map-side-combinable
    ``max_by`` keyed on the collapse column joined from the docs
    dimension, and only group winners reach the final tiny top-k sort.
    At 10^12 docs the shuffled volume is (matched docs) rows of
    (doc_id, score) into a groupBy whose partial aggregation collapses
    each partition to <= |groups| rows before the exchange.

    Ties: within a group, higher score wins, then LOWER doc_id; across
    groups the top-k orders by (score desc, doc_id asc).
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame(
            [], T.StructType([T.StructField("group_key", T.StringType(), True)]
                             + list(TOPK_SCHEMA.fields)))
    local = _complete_match_scores(
        index, stats, qterms, exclude, stem=stem, camel=camel,
        use_wand=use_wand, shard_size=shard_size, zone=zone, mode=mode,
        tombstones=tombstones, restrict=restrict)
    keyed = local.join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col(collapse).alias("group_key")),
        "doc_id")
    best = keyed.groupBy("group_key").agg(
        F.max_by(F.struct(F.col("doc_id"), F.col("score")),
                 F.struct(F.col("score"), (-F.col("doc_id")).alias("nid"))
                 ).alias("_b"))
    return (best.select("group_key",
                        F.col("_b.doc_id").alias("doc_id"),
                        F.col("_b.score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def has_child_search(index: DataFrame, child_parents: DataFrame,
                     stats: dict, query: str, k: int = 10,
                     score_mode: str = "max", min_children: int = 1,
                     stem: bool = True, camel: bool = True,
                     use_wand: bool | str = "auto", shard_size: int = 4096,
                     zone: str | None = None, mode: str = "or",
                     exclude: str | None = None,
                     tombstones: DataFrame | None = None,
                     restrict: DataFrame | None = None) -> DataFrame:
    """Parent-child retrieval (Elasticsearch ``has_child`` / Lucene
    block join): rank PARENT entities by their children's BM25 scores
    against a query over the CHILD index — e.g. rank documents by their
    best-matching chunk, or repositories by their best-matching file.

    ``child_parents``: relation (doc_id, parent_id) mapping each child
    doc of the index to its parent. ``score_mode``: how child scores
    roll up — ``max`` (ES default, deterministic), ``sum``/``avg``
    (float-sum over the group; round before cross-engine comparison),
    ``none`` (score 0, pure existence). ``min_children``: parents with
    fewer matching children are dropped (ES ``min_children``).

    Exact at any k, same argument as :func:`collapse_search`: rollups
    are computed from per-shard COMPLETE child match scores, so a
    parent whose best child ranks arbitrarily deep still surfaces. The
    plan is the one-exchange query shape plus one shuffle join to the
    parent mapping and a map-side-combinable groupBy(parent) — at
    10^12 children the exchange carries (matched children) rows
    pre-collapsed to <= |parents| rows per partition.

    Returns (parent_id, score, n_children) ordered by
    (score desc, parent_id asc), first k rows.
    """
    if score_mode not in ("max", "sum", "avg", "none"):
        raise ValueError(f"score_mode must be max|sum|avg|none, "
                         f"got {score_mode!r}")
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    out_schema = ("parent_id long, score double, n_children long")
    if not qterms:
        return spark.createDataFrame([], out_schema)
    local = _complete_match_scores(
        index, stats, qterms, exclude, stem=stem, camel=camel,
        use_wand=use_wand, shard_size=shard_size, zone=zone, mode=mode,
        tombstones=tombstones, restrict=restrict)
    keyed = local.join(
        child_parents.select(F.col("doc_id").cast("long").alias("doc_id"),
                             F.col("parent_id")),
        "doc_id")
    agg_score = {"max": F.max("score"), "sum": F.sum("score"),
                 "avg": F.avg("score"),
                 "none": F.lit(0.0)}[score_mode]
    rolled = (keyed.groupBy("parent_id")
              .agg(agg_score.alias("score"),
                   F.count("*").alias("n_children")))
    if min_children > 1:
        rolled = rolled.filter(F.col("n_children") >= min_children)
    return (rolled.select("parent_id", "score",
                          F.col("n_children").cast("long"))
            .orderBy(F.desc("score"), F.asc("parent_id"))
            .limit(k))


def top_hits_by_group(index: DataFrame, docs: DataFrame, stats: dict,
                      query: str, by: str = "source", per_group: int = 3,
                      stem: bool = True, camel: bool = True,
                      use_wand: bool | str = "auto",
                      shard_size: int = 4096, zone: str | None = None,
                      mode: str = "or", exclude: str | None = None,
                      tombstones: DataFrame | None = None,
                      restrict: DataFrame | None = None) -> DataFrame:
    """ES ``top_hits`` aggregation: for every value of the doc
    attribute ``by``, the group's top ``per_group`` hits by BM25 —
    "best 3 results per language / per repo" in one pass.

    Generalizes :func:`collapse_search` (per_group=1) to a per-group
    window rank over the complete per-shard match scores. The window
    partitions by the group key — group cardinality is the attribute's
    (bounded) domain, and each partition holds only that group's
    MATCHES, not its corpus. Returns
    (group_key, rnk, doc_id, score) ordered by
    (group_key asc, rnk asc)."""
    from pyspark.sql import Window

    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame(
            [], "group_key string, rnk long, doc_id long, score double")
    local = _complete_match_scores(
        index, stats, qterms, exclude, stem=stem, camel=camel,
        use_wand=use_wand, shard_size=shard_size, zone=zone, mode=mode,
        tombstones=tombstones, restrict=restrict)
    keyed = local.join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col(by).alias("group_key")),
        "doc_id")
    w = Window.partitionBy("group_key").orderBy(F.desc("score"),
                                                F.asc("doc_id"))
    return (keyed.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= per_group)
            .select("group_key", "rnk", "doc_id", "score")
            .orderBy(F.asc("group_key"), F.asc("rnk")))


def decay_sql(field: str, origin: float, scale: float,
              decay: float = 0.5, offset: float = 0.0,
              kind: str = "gauss") -> str:
    """SQL expression for an Elasticsearch ``function_score`` decay
    multiplier over a numeric doc attribute — shared verbatim by
    :func:`decay_boosts` (Spark ``F.expr``) and the DuckDB oracle.

    ``gauss``:  decay ** ((d / scale)^2)
    ``exp``:    decay ** (d / scale)
    ``linear``: max(0, 1 - (1 - decay) * d / scale)
    with d = max(0, |x - origin| - offset). All literals are cast to
    DOUBLE explicitly (bare decimal literals parse as DECIMAL in both
    dialects and switch the arithmetic engine-specific)."""
    if kind not in ("gauss", "exp", "linear"):
        raise ValueError(f"kind must be gauss|exp|linear, got {kind!r}")
    if not scale > 0:
        raise ValueError(f"scale must be positive, got {scale}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    o, s, dc, of = (f"CAST({float(origin)!r} AS DOUBLE)",
                    f"CAST({float(scale)!r} AS DOUBLE)",
                    f"CAST({float(decay)!r} AS DOUBLE)",
                    f"CAST({float(offset)!r} AS DOUBLE)")
    d = f"greatest(abs(CAST({field} AS DOUBLE) - {o}) - {of}, 0.0e0)"
    if kind == "gauss":
        return f"power({dc}, (({d}) / {s}) * (({d}) / {s}))"
    if kind == "exp":
        return f"power({dc}, ({d}) / {s})"
    return f"greatest(0.0e0, 1.0e0 - (1.0e0 - {dc}) * ({d}) / {s})"


def decay_boosts(meta: DataFrame, field: str, origin: float, scale: float,
                 decay: float = 0.5, offset: float = 0.0,
                 kind: str = "gauss", id_col: str = "doc_id") -> DataFrame:
    """Distance-decay function scoring (ES ``gauss``/``exp``/``linear``
    decay): build the (doc_id, boost) relation for :func:`search`'s
    ``boosts=`` from a numeric doc attribute — recency, geo distance
    proxy, authority. Docs at ``origin`` (within ``offset``) keep boost
    1.0; at ``origin +- scale`` the boost is exactly ``decay``.

    Map-only projection over the doc dimension; the result rides the
    shard-cogroup boost side-channel, so a 10^12-row attribute table
    never collects or broadcasts."""
    return meta.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(decay_sql(field, origin, scale, decay, offset, kind))
        .alias("boost"))


def rm3_search(index: DataFrame, docs: DataFrame | None, stats: dict,
               query: str, k: int = 10, fb_docs: int = 10,
               fb_terms: int = 10, orig_weight: float = 0.5,
               stem: bool = True, camel: bool = True,
               use_wand: bool | str = "auto", shard_size: int = 4096,
               zone: str | None = None,
               tombstones: DataFrame | None = None,
               restrict: DataFrame | None = None) -> DataFrame:
    """Pseudo-relevance feedback (RM3, Lavrenko & Croft SIGIR 2001 /
    Abdul-Jaleel et al. TREC 2004): run the query, harvest expansion
    terms from the top ``fb_docs`` results, and re-search with an
    interpolated weighted query — no user interaction, recall improves
    on vocabulary-mismatch queries.

    Deterministic restatable contract:

      1. feedback set = BM25 top ``fb_docs`` (score desc, doc_id asc);
      2. candidate weight w_t = sum over feedback docs of
         (tf_{t,d} / len_d) * score_d — the relevance-model estimate
         with the doc prior taken as the BM25 score;
      3. expansion set = top ``fb_terms`` by (w_t desc, term asc),
         normalized to p_t = w_t / sum(selected w);
      4. final per-term weights interpolate the distributions
         (lambda = ``orig_weight``): lambda * 1/|q| for original
         terms, plus (1 - lambda) * p_t for expansion terms;
      5. one weighted :func:`search` (``term_weights=``) over the
         union vocabulary.

    Scale shape: stage 1 is the standard one-exchange query; stage 2
    decodes ONLY the feedback docs' shards
    (:func:`~index_spark.operators.analytics.multi_term_vectors` — a
    bounded IN-pruned point lookup) and collects ``fb_terms`` rows;
    stage 5 is again the one-exchange query plan. Nothing unbounded
    ever reaches the driver.
    """
    from index_spark.operators.analytics import multi_term_vectors

    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if not 0.0 < orig_weight <= 1.0:
        raise ValueError(f"orig_weight must be in (0, 1], "
                         f"got {orig_weight}")
    fb = search(index, docs, stats, query, k=fb_docs, stem=stem,
                camel=camel, use_wand=use_wand, shard_size=shard_size,
                zone=zone, tombstones=tombstones,
                restrict=restrict).collect()
    if not fb:
        return spark.createDataFrame([], TOPK_SCHEMA)
    fbdf = spark.createDataFrame([(int(r["doc_id"]), float(r["score"]))
                                  for r in fb], "doc_id long, fscore double")
    tv = multi_term_vectors(pin_zone(index, zone),
                            [int(r["doc_id"]) for r in fb], shard_size)
    dlen = tv.groupBy("doc_id").agg(F.sum("tf").alias("dlen"))
    cand = (tv.join(F.broadcast(fbdf), "doc_id")
            .join(F.broadcast(dlen), "doc_id")
            .groupBy("term")
            .agg(F.sum((F.col("tf").cast("double") / F.col("dlen"))
                       * F.col("fscore")).alias("wt"))
            .orderBy(F.desc("wt"), F.asc("term"))
            .limit(fb_terms).collect())
    z = sum(r["wt"] for r in cand)
    lam = float(orig_weight)
    weights: dict[str, float] = {}
    for t in qterms:
        weights[t] = lam * (1.0 / len(qterms))
    if z > 0.0:
        for r in cand:
            weights[r["term"]] = (weights.get(r["term"], 0.0)
                                  + (1.0 - lam) * (r["wt"] / z))
    # expansion terms are dictionary tokens already — stem=False on the
    # final pass (same contract as search_fuzzy)
    return search(index, docs, stats, " ".join(sorted(weights)), k=k,
                  stem=False, camel=False, use_wand=use_wand,
                  shard_size=shard_size, zone=zone, tombstones=tombstones,
                  restrict=restrict, term_weights=weights)


# regex metacharacters that end a literal prefix; a quantifier after a
# literal char means that char itself is optional/repeated, so it drops
# out of the prefix too
_RE_QUANT = set("*+?{")


def _regex_literal_prefix(pat: str) -> str:
    m = re.match(r"[a-z0-9]*", pat)
    prefix = m.group(0) if m else ""
    if prefix and len(prefix) < len(pat) and pat[len(prefix)] in _RE_QUANT:
        prefix = prefix[:-1]
    return prefix


def regex_expand(index: DataFrame | None, patterns: list[str],
                 max_expansions: int = 32, zone: str | None = None,
                 dictionary: DataFrame | None = None
                 ) -> dict[str, list[str]]:
    """Expand regular expressions to matching dictionary terms (Lucene
    RegexpQuery semantics: the pattern must match the WHOLE term). Same
    catalog contract as :func:`wildcard_expand`: the compact term
    dictionary when given, else the df-aggregated sharded index; at
    most ``max_expansions`` terms per pattern, highest global df first
    (term-ascending tiebreak).

    The pattern's leading literal run (before the first metacharacter,
    quantifier-aware: the prefix of ``dat*`` is ``da``) is pushed as a
    ``StartsWith`` against the term-sorted catalog so anchored patterns
    row-group-prune; a pattern with no literal prefix scans the
    catalog's term column — the documented leading-wildcard cost, paid
    against millions of dictionary rows, never the sharded index.
    """
    from pyspark.sql import Window

    from index_spark.operators.build import DOC_MARKER

    if not patterns:
        return {}
    if dictionary is not None:
        cat = pin_zone(dictionary, zone).select(
            "term", F.col("df").alias("df_g"))
    else:
        cat = (pin_zone(index, zone)
               .filter(F.col("term") != DOC_MARKER)
               .groupBy("term").agg(F.sum("df").alias("df_g")))
    out: dict[str, list[str]] = {}
    for p in patterns:
        pat = p.lower()
        re.compile(pat)  # surface a bad pattern as the caller's error
        cond = F.col("term").rlike(f"^(?:{pat})$")
        prefix = _regex_literal_prefix(pat)
        if prefix:
            cond = F.col("term").startswith(prefix) & cond
        w = Window.orderBy(F.desc("df_g"), F.asc("term"))
        rows = (cat.filter(cond)
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= max_expansions)
                .select("term").collect())
        out[p] = sorted(r["term"] for r in rows)
    return out


def search_regex(index: DataFrame, docs: DataFrame | None, stats: dict,
                 query: str, k: int = 10, max_expansions: int = 32,
                 stem: bool = True, camel: bool = True,
                 shard_size: int = 4096, zone: str | None = None,
                 mode: str = "or", exclude: str | None = None,
                 dictionary: DataFrame | None = None,
                 **kw) -> DataFrame:
    """Regex-aware top-k BM25: whitespace tokens containing a regex
    metacharacter expand against the term catalog
    (:func:`regex_expand`, anchored whole-term match); plain tokens
    pass through the caller's stem/camel tokenizer. Same expansion
    contract as :func:`search_wildcard`: own-idf per variant,
    ``mode="and"`` is group-conjunctive over original tokens, a
    pattern matching nothing empties an AND result.
    """
    spark = index.sparkSession
    raw = [w for w in query.split() if w]
    meta = set(".[](){}|+*?^$\\")
    pats = sorted({w.lower() for w in raw if set(w) & meta})
    lit_q = " ".join(w for w in raw if not set(w) & meta)
    lits = sorted(set(tokenize(lit_q, stem=stem, camel=camel)))
    exp: dict[str, set[str]] = {t: {t} for t in lits}
    for p, terms in regex_expand(index, pats, max_expansions, zone,
                                 dictionary).items():
        exp[p] = set(terms)
    originals = sorted(exp)
    terms = sorted({t for v in exp.values() for t in v})
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if exclude is not None:
        exclude = " ".join(
            sorted(set(tokenize(exclude, stem=stem, camel=camel)))) or None
    groups = None
    if mode == "and":
        if any(not exp[t] for t in originals):
            return spark.createDataFrame([], TOPK_SCHEMA)
        gids: dict[str, list[int]] = {}
        for i, t in enumerate(originals):
            for v in exp[t]:
                gids.setdefault(v, []).append(i)
        groups = {v: tuple(g) for v, g in gids.items()}
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, zone=zone,
                  mode=mode, exclude=exclude, groups=groups, **kw)


# ------------------------------------------------------------- LM-Dirichlet

def lm_dirichlet_search(index: DataFrame, stats: dict, query: str,
                        mu: float = 2000.0, k: int = 10, stem: bool = True,
                        camel: bool = True, zone: str | None = None,
                        tombstones: DataFrame | None = None,
                        cf: dict[str, int] | None = None) -> DataFrame:
    """Top-k query-likelihood ranking with Dirichlet-prior smoothing
    (Zhai & Lafferty, SIGIR 2001) — the alternative similarity module
    search engines offer next to BM25 (Lucene's
    ``LMDirichletSimilarity``); the better-calibrated choice for short
    queries over verbose fields.

    Scoring contract (Lucene's matched-terms-only convention, so the
    DuckDB oracle restates it join-for-join): per matched (doc, term)

        ln(1 + tf / (mu * p_w)) + ln(mu / (dl + mu)),   p_w = cf_w / C

    summed over the doc's matched query terms — cf_w is the term's
    GLOBAL collection frequency, C the collection's total token count
    (``stats['total_tokens']``), dl the doc length. Docs matching no
    query term never score. Summation order is pinned (ascending term,
    ascending doc id) so scores are bitwise-reproducible across runs
    and partitionings.

    Scale shape — identical to :func:`search`'s: the term filter pushes
    to the index scan (only query-term rows load, sorted-at-rest
    row-group pruning applies), global cf is a bounded aggregate over
    <= |q| x segments METADATA rows (no blob decode), the kernel decodes
    only matched rows shard-locally (every doc's postings live in its
    own doc-range shard, so per-doc sums need no cross-shard combine),
    and the result is a TakeOrderedAndProject over per-shard outputs.
    """
    spark = index.sparkSession
    if mu <= 0:
        raise ValueError(f"mu must be positive, got {mu}")
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    c_total = float(stats.get("total_tokens") or 0)
    if c_total <= 0:
        raise ValueError("stats['total_tokens'] must be positive "
                         "(zoned index: pass the pinned zone's stats)")
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(qterms))
    if cf is not None:
        # caller-supplied global cfs (QueryEngine's LRU) — no stats job
        p_w = {t: float(v) / c_total for t, v in cf.items()
               if t in qterms and v > 0}
    else:
        # global cf per matched term: <= |q| rows ever reach the driver
        p_w = {r["term"]: float(r["cf"]) / c_total
               for r in matched.select("term", "cf").groupBy("term")
                               .agg(F.sum("cf").alias("cf")).collect()}
    if not p_w:
        return spark.createDataFrame([], TOPK_SCHEMA)
    # the scoring kernel reads only the blobs — cf stays out of the
    # Arrow batches
    hits = matched.filter(F.col("term").isin(sorted(p_w))) \
                  .select("shard", "term", "doc_blob", "tf_blob", "dl_blob")
    ln_mu = float(np.log(mu))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        all_docs, parts = [], []
        for t in sorted(per_term):  # pinned summation order
            p = p_w[t]
            for docs, tfs, dls in per_term[t]:
                all_docs.append(docs)
                parts.append(np.log1p(tfs / (mu * p))
                             + (ln_mu - np.log(dls + mu)))
        docs = np.concatenate(all_docs)
        part = np.concatenate(parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.zeros(uniq.size, np.float64)
        np.add.at(score, inv, part)
        return pd.DataFrame({"doc_id": uniq, "score": score})

    scored = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    if tombstones is not None:
        # deleted docs drop BEFORE the cut, so the top-k stays exact
        # over the live corpus (doc-level anti-join — simpler than the
        # BM25 kernels' in-shard side-channel, same result)
        scored = scored.join(
            tombstones.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def lm_jelinek_mercer_search(index: DataFrame, stats: dict, query: str,
                             lam: float = 0.1, k: int = 10,
                             stem: bool = True, camel: bool = True,
                             zone: str | None = None,
                             tombstones: DataFrame | None = None,
                             cf: dict[str, int] | None = None) -> DataFrame:
    """Top-k query likelihood with Jelinek-Mercer (linear-interpolation)
    smoothing — Lucene's ``LMJelinekMercerSimilarity``, the similarity
    Zhai & Lafferty (SIGIR 2001) recommend for LONG / verbose queries
    (Dirichlet for short keyword ones).

    Scoring contract (matched-terms-only, join-for-join restatable):
    per matched (doc, term)

        ln(1 + ((1 - lam) * tf / dl) / (lam * p_w)),   p_w = cf_w / C

    summed over the doc's matched query terms. ``lam`` in (0, 1):
    small lam trusts the document model, lam -> 1 the collection.
    Summation order pinned (ascending term, ascending doc id) —
    bitwise-reproducible like :func:`lm_dirichlet_search`, whose plan
    shape (pushed term scan, bounded metadata cf aggregate, shard-local
    Arrow kernel, distributed top-k) this shares exactly.
    """
    spark = index.sparkSession
    if not (0.0 < lam < 1.0):
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    c_total = float(stats.get("total_tokens") or 0)
    if c_total <= 0:
        raise ValueError("stats['total_tokens'] must be positive "
                         "(zoned index: pass the pinned zone's stats)")
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(qterms))
    if cf is not None:
        p_w = {t: float(v) / c_total for t, v in cf.items()
               if t in qterms and v > 0}
    else:
        p_w = {r["term"]: float(r["cf"]) / c_total
               for r in matched.select("term", "cf").groupBy("term")
                               .agg(F.sum("cf").alias("cf")).collect()}
    if not p_w:
        return spark.createDataFrame([], TOPK_SCHEMA)
    hits = matched.filter(F.col("term").isin(sorted(p_w))) \
                  .select("shard", "term", "doc_blob", "tf_blob", "dl_blob")
    one_m = 1.0 - lam

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        all_docs, parts = [], []
        for t in sorted(per_term):  # pinned summation order
            p = p_w[t]
            for docs, tfs, dls in per_term[t]:
                all_docs.append(docs)
                parts.append(np.log1p((one_m * tfs / dls) / (lam * p)))
        docs = np.concatenate(all_docs)
        part = np.concatenate(parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.zeros(uniq.size, np.float64)
        np.add.at(score, inv, part)
        return pd.DataFrame({"doc_id": uniq, "score": score})

    scored = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    if tombstones is not None:
        scored = scored.join(
            tombstones.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def classic_search(index: DataFrame, stats: dict, query: str,
                   k: int = 10, stem: bool = True, camel: bool = True,
                   zone: str | None = None,
                   tombstones: DataFrame | None = None) -> DataFrame:
    """Top-k ranking under Lucene's pre-6.0 default ``ClassicSimilarity``
    (the practical TF-IDF vector-space model, Salton 1975 as Lucene
    shipped it) — the third similarity module next to BM25 and the LM
    family, for parity with engines whose scores users still compare
    against.

    Scoring contract (pinned so the oracle restates it exactly):

        score(d) = coord(d) * sum_t  sqrt(tf) * idf_t^2 / sqrt(dl)
        idf_t    = 1 + ln(N / (df_t + 1))
        coord(d) = |matched query terms in d| / |query terms|

    queryNorm (a rank-invariant global constant in Lucene) is pinned
    to 1 and documented out. df_t is the GLOBAL df summed over the
    term's segment metadata rows — a bounded aggregate, no blob decode.
    Every (doc, term) posting lives in exactly one segment row under
    the doc-range merge protocol, so the kernel's per-doc contribution
    count IS the matched-term count and coord is shard-locally exact.
    Plan shape is :func:`lm_dirichlet_search`'s.
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs = float(stats.get("n_docs") or 0)
    if n_docs <= 0:
        raise ValueError("stats['n_docs'] must be positive "
                         "(zoned index: pass the pinned zone's stats)")
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(qterms))
    # global df per matched term: <= |q| metadata rows reach the driver
    idf2 = {r["term"]: (1.0 + np.log(n_docs / (float(r["df"]) + 1.0))) ** 2
            for r in matched.select("term", "df").groupBy("term")
                            .agg(F.sum("df").alias("df")).collect()}
    if not idf2:
        return spark.createDataFrame([], TOPK_SCHEMA)
    coord_den = float(len(qterms))
    hits = matched.filter(F.col("term").isin(sorted(idf2))) \
                  .select("shard", "term", "doc_blob", "tf_blob", "dl_blob")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        all_docs, parts = [], []
        for t in sorted(per_term):  # pinned summation order
            w = idf2[t]
            for docs, tfs, dls in per_term[t]:
                all_docs.append(docs)
                parts.append(np.sqrt(tfs) * w / np.sqrt(dls))
        docs = np.concatenate(all_docs)
        part = np.concatenate(parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.zeros(uniq.size, np.float64)
        np.add.at(score, inv, part)
        nmatch = np.zeros(uniq.size, np.float64)
        np.add.at(nmatch, inv, 1.0)  # one contribution per matched term
        return pd.DataFrame({"doc_id": uniq,
                             "score": score * (nmatch / coord_den)})

    scored = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    if tombstones is not None:
        scored = scored.join(
            tombstones.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ------------------------------------------------------- fielded queries

def parse_fielded(q: str, zones: set[str], default_zone: str,
                  stem: bool = True, camel: bool = True
                  ) -> list[tuple[str, str]]:
    """(zone, term) pairs from Lucene query_string field syntax:
    ``title:spark body:shuffle join`` — a ``zone:`` prefix scopes the
    token, unprefixed tokens hit ``default_zone``. A colon whose prefix
    is NOT a known zone raises (loud, naming the zones — same contract
    as :func:`pin_zone`; plain queries with incidental colons belong on
    :func:`search`, whose tokenizer strips them). Multi-token text
    after a prefix (``title:big_data``) scopes every produced token."""
    if default_zone not in zones:
        raise ValueError(f"unknown default zone {default_zone!r} "
                         f"(zones: {sorted(zones)})")
    pairs: set[tuple[str, str]] = set()
    for w in q.split():
        if ":" in w:
            z, rest = w.split(":", 1)
            if z not in zones:
                raise ValueError(f"unknown zone {z!r} in fielded query "
                                 f"(zones: {sorted(zones)})")
            pairs.update((z, t)
                         for t in tokenize(rest, stem=stem, camel=camel))
        else:
            pairs.update((default_zone, t)
                         for t in tokenize(w, stem=stem, camel=camel))
    return sorted(pairs)


def fielded_search(index: DataFrame, zone_stats: dict, query: str,
                   k: int = 10, default_zone: str = "body",
                   mode: str = "or", stem: bool = True,
                   camel: bool = True,
                   use_wand: bool | str = "auto") -> DataFrame:
    """Fielded top-k BM25 over a zoned index — the query_string field
    syntax every Lucene engine serves: each (zone, term) pair scores
    with ITS zone's own BM25 statistics (df, N, avgdl) and a doc's
    score sums its matched pairs. ``mode='and'`` scores only docs
    matching EVERY pair (each pair is one conjunctive gate).

    Composition, not new machinery: the pair relation replaces
    :func:`zone_search`'s query-terms x zones cross product, rows
    relabel ``term -> zone:term`` so the kernels treat each pair as an
    independent scoring unit (WAND upper-bound grouping and the
    conjunctive group gates both key on it), and per-row idf/avgdl
    carry each zone's statistics exactly as in :func:`zone_search`.
    Plan shape is ``search``'s: pair-pruned scan (a bounded
    disjunction of (zone, term) equalities — both columns push to the
    parquet scan) -> ONE shard exchange (all zones of a doc range
    share a shard, so cross-zone conjunction is shard-locally exact)
    -> per-shard kernel -> distributed top-k."""
    spark = index.sparkSession
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if "zone" not in index.columns:
        raise ValueError("fielded_search needs a zoned index "
                         "(build_zoned_index)")
    pairs = parse_fielded(query, set(zone_stats), default_zone,
                          stem=stem, camel=camel)
    if not pairs:
        return spark.createDataFrame([], TOPK_SCHEMA)
    from functools import reduce
    from operator import or_
    cond = reduce(or_, [(F.col("zone") == z) & (F.col("term") == t)
                        for z, t in pairs])
    hits = index.filter(cond)
    # per-(zone, term) global df via aggregate + broadcast join-back
    dfs = hits.groupBy("zone", "term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), ["zone", "term"])
    zones = sorted({z for z, _ in pairs})
    n_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["n_docs"]))])
    a_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["avgdl"]))])
    hits = (hits
            .withColumn("idf", F.log(
                (n_map[F.col("zone")] - F.col("df_g") + 0.5)
                / (F.col("df_g") + 0.5) + 1.0))
            .withColumn("avgdl", a_map[F.col("zone")])
            .withColumn("term", F.concat_ws(":", "zone", "term")))
    n_pairs = len(pairs)

    if mode == "or":
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _pick_scorer(pdf, use_wand)(pdf, 0.0, k)
    else:
        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            return _score_shard_conjunctive(pdf, 0.0, k, n_pairs)

    local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def suggest_phrase(index: DataFrame | None, corpus: DataFrame,
                   query: str, k: int = 3, max_dist: int = 1,
                   max_expansions: int = 3, alpha: float = 0.5,
                   stem: bool = True, camel: bool = True,
                   zone: str | None = None,
                   dictionary: DataFrame | None = None,
                   trigram: DataFrame | None = None,
                   text_col: str = "text") -> DataFrame:
    """Phrase "did you mean" (the Lucene PhraseSuggester shape): rank
    whole-query corrections by an add-alpha bigram language model over
    the corpus, instead of correcting terms independently — "dat tabl"
    should propose "data table" because that BIGRAM is frequent, even
    when each term has several equally-near unigram neighbors.

    Candidates per query position are :func:`fuzzy_expand`'s pinned
    top-``max_expansions`` dictionary terms within ``max_dist`` (edit
    distance 0 keeps the original term in its own candidate list when
    it exists). Candidate phrases are the positions' cross product
    (bounded by max_expansions^len — keep both small), scored

        ln((c(w1)+a)/(N+aV)) + sum_i ln((c(w_i,w_i+1)+a)/(c(w_i)+aV))

    with token counts c(.) over ``corpus`` tokenized with the CALLER's
    ``stem``/``camel`` flags — the LM counts must live in the same
    token space as the dictionary candidates, or a stemmed store's
    candidates would all score the bare smoothing constant (the
    add-alpha convention itself matches ``lm.bigram_lm_scores``).
    stem=False + camel=False is the SQL-parity spec the driver oracle
    restates; the stemmed path runs the engine tokenizer Arrow-batched.
    Returns (phrase, logp, n_changed) top-k by logp desc / phrase asc,
    logp rounded to 6.

    Scale shape: candidate generation is the dictionary/trigram fuzzy
    path (bounded rows); the token relation is cached so the three
    count aggregates (totals, candidate unigrams, candidate bigrams —
    each map-combinable, the latter two PRUNED to the candidate
    vocabulary / adjacent pairs before the shuffle) tokenize the corpus
    once; the cross product and the final scoring arithmetic run on
    the driver over those bounded collected counts — pure comparisons
    and ln over exact integers, which keeps the whole suggester
    SQL-restatable value-for-value."""
    from itertools import product

    from index_spark.functions.text import TOKENS_SQL

    spark = corpus.sparkSession
    out_schema = "phrase string, logp double, n_changed long"
    qterms = tokenize(query, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], out_schema)
    if len(qterms) > 4:
        raise ValueError("suggest_phrase supports <= 4 query terms "
                         "(the candidate cross product is exponential)")
    exp = fuzzy_expand(index, sorted(set(qterms)), max_dist=max_dist,
                       max_expansions=max_expansions, zone=zone,
                       dictionary=dictionary, trigram=trigram)
    cand_lists = [exp.get(t, []) for t in qterms]
    if any(not c for c in cand_lists):
        return spark.createDataFrame([], out_schema)
    vocab = sorted({w for c in cand_lists for w in c})

    if stem or camel:
        # engine tokenizer (Arrow-batched) — same token space as the
        # dictionary the candidates came from
        @F.pandas_udf("array<string>")
        def _tok(texts: pd.Series) -> pd.Series:
            return texts.map(
                lambda s: tokenize(s or "", stem=stem, camel=camel))

        t = corpus.select(_tok(F.col(text_col)).alias("t"))
    else:
        t = corpus.select(
            F.expr(TOKENS_SQL.format(col=text_col)).alias("t"))
    t = t.persist()  # three bounded aggregates, one tokenize pass
    # totals: N tokens, V distinct terms (one combinable aggregate)
    tot = t.select(F.explode_outer("t").alias("w")) \
           .filter(F.col("w").isNotNull()) \
           .agg(F.count("*").alias("n"),
                F.countDistinct("w").alias("v")).collect()[0]
    n_total, v_size = int(tot["n"]), int(tot["v"])
    uni = {r["w"]: int(r["c"]) for r in
           t.select(F.explode_outer("t").alias("w"))
            .filter(F.col("w").isin(vocab))
            .groupBy("w").agg(F.count("*").alias("c")).collect()}
    pairs_wanted = {(a, b) for c1, c2 in zip(cand_lists, cand_lists[1:])
                    for a in c1 for b in c2}
    bi: dict[tuple[str, str], int] = {}
    if pairs_wanted:
        lefts = sorted({a for a, _ in pairs_wanted})
        bg = F.expr("transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2))")
        bi_rows = (t.filter(F.size("t") >= 2)
                   .select(F.explode_outer(bg).alias("b"))
                   .filter(F.col("b.w1").isin(lefts)
                           & F.col("b.w2").isin(vocab))
                   .groupBy("b.w1", "b.w2")
                   .agg(F.count("*").alias("c")).collect())
        bi = {(r["w1"], r["w2"]): int(r["c"]) for r in bi_rows
              if (r["w1"], r["w2"]) in pairs_wanted}

    t.unpersist()

    import math as _math

    rows = []
    for combo in product(*cand_lists):
        lp = _math.log((uni.get(combo[0], 0) + alpha)
                       / (n_total + alpha * v_size))
        for a, b in zip(combo, combo[1:]):
            lp += _math.log((bi.get((a, b), 0) + alpha)
                            / (uni.get(a, 0) + alpha * v_size))
        changed = sum(1 for w, q0 in zip(combo, qterms) if w != q0)
        rows.append((" ".join(combo), round(lp, 6), changed))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(rows[:k], out_schema)


def rank_feature_search(index: DataFrame, docs: DataFrame | None,
                        stats: dict, query: str, features: DataFrame,
                        feature_col: str = "feature",
                        fn: str = "saturation", pivot: float = 1.0,
                        scaling: float = 1.0, exponent: float = 1.0,
                        weight: float = 1.0, k: int = 10,
                        stem: bool = True, camel: bool = True,
                        shard_size: int = 4096, **kw) -> DataFrame:
    """``rank_feature`` query (the Elasticsearch static-signal should
    clause): BM25 relevance plus an ADDITIVE monotone transform of a
    per-document numeric feature — page quality, freshness score,
    inbound-link count.  ``features`` is a (doc_id, feature) relation;
    a document with no feature row contributes 0 (ES: the clause simply
    doesn't match), so the join is a left join and never drops a
    relevance match.

        saturation: w * f / (f + pivot)
        log:        w * ln(scaling + f)
        sigmoid:    w * f^exp / (f^exp + pivot^exp)

    Unlike multiplicative ``boosts=`` (which ride the scoring kernel —
    a boost can only rescale matches), the additive form must see the
    COMPLETE match set before the cut: a mid-relevance doc with a huge
    feature can enter the top-k from arbitrarily deep, so scores come
    from :func:`_complete_match_scores` (per-shard full match scores,
    no global cut) joined against the feature relation and only then
    top-k'd.  At 10^12 docs the joined volume is (matched docs) rows
    against a doc-keyed feature dimension — a plain shuffle join on
    doc_id, map-side combinable nowhere needed because both sides are
    already per-doc.
    """
    spark = index.sparkSession
    if fn not in ("saturation", "log", "sigmoid"):
        raise ValueError(f"fn must be saturation|log|sigmoid, got {fn!r}")
    if fn in ("saturation", "sigmoid") and pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    local = _complete_match_scores(index, stats, qterms, stem=stem,
                                   camel=camel, shard_size=shard_size,
                                   **kw)
    f = F.col("_feat").cast("double")
    if fn == "saturation":
        contrib = f / (f + F.lit(float(pivot)))
    elif fn == "log":
        contrib = F.log(F.lit(float(scaling)) + f)
    else:
        fp = F.pow(f, F.lit(float(exponent)))
        contrib = fp / (fp + F.lit(float(pivot) ** float(exponent)))
    feat = features.select(F.col("doc_id").cast("long").alias("doc_id"),
                           F.col(feature_col).alias("_feat"))
    scored = (local.join(feat, "doc_id", "left")
              .select("doc_id",
                      (F.col("score") + F.lit(float(weight))
                       * F.coalesce(contrib, F.lit(0.0))).alias("score")))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def boosting_search(index: DataFrame, stats: dict, positive: str,
                    negative: str, negative_boost: float = 0.5,
                    k: int = 10, stem: bool = True, camel: bool = True,
                    shard_size: int = 4096, zone: str | None = None,
                    round_at: int | None = None, **kw) -> DataFrame:
    """``boosting`` query (the Elasticsearch demotion clause): documents
    are ranked by the POSITIVE query's BM25, and any document that also
    matches the NEGATIVE query keeps its rank eligibility but has its
    score multiplied by ``negative_boost`` (0 < nb < 1 demotes — unlike
    ``exclude=``, which removes).

    Plan: complete positive match scores (the demotion can pull a
    top-ranked doc below position k, so the cut must happen after the
    multiply — same completeness argument as :func:`rank_feature_search`)
    left-joined against the negative MATCH SET from
    ``analytics.matching_docs`` (doc streams only — strictly cheaper
    than scoring the negative query).  Both sides are doc_id relations;
    one shuffle join, then the k-row TakeOrdered."""
    from index_spark.operators.analytics import matching_docs

    if not 0.0 <= negative_boost <= 1.0:
        raise ValueError(
            f"negative_boost must be in [0, 1], got {negative_boost}")
    spark = index.sparkSession
    qterms = sorted(set(tokenize(positive, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    local = _complete_match_scores(index, stats, qterms, stem=stem,
                                   camel=camel, shard_size=shard_size,
                                   zone=zone, **kw)
    neg = matching_docs(index, negative, mode="or", stem=stem,
                        camel=camel, zone=zone) \
        .withColumn("_neg", F.lit(True))
    sc = F.when(F.col("_neg"),
                F.col("score") * F.lit(float(negative_boost))) \
          .otherwise(F.col("score"))
    if round_at is not None:  # rank on rounded scores (oracle parity)
        sc = F.round(sc, round_at)
    out = local.join(neg, "doc_id", "left").select("doc_id",
                                                   sc.alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def pinned_search(index: DataFrame, stats: dict, query: str,
                  pinned_ids: list[int], k: int = 10, stem: bool = True,
                  camel: bool = True, shard_size: int = 4096,
                  zone: str | None = None, round_at: int | None = None,
                  **kw) -> DataFrame:
    """``pinned`` query (Elasticsearch search-result promotion): the
    ``pinned_ids`` occupy ranks 1..p in the GIVEN order (whether or not
    they match organically — ES pins unconditionally), then organic
    BM25 matches fill the remaining k−p ranks, excluding the pins.
    Returns (rank, doc_id, score, pinned); a pinned doc keeps its
    organic score for transparency (0.0 when it doesn't match).

    Plan: complete match scores once; the pin list is a bounded query
    constant (broadcast literal relation), so pins resolve with one
    broadcast join, organics with one anti-join + k-row TakeOrdered.
    The final rank is a row_number over ≤ k rows (single bounded
    partition — k is a query constant)."""
    from pyspark.sql import Window

    if not pinned_ids:
        raise ValueError("pinned_ids must be non-empty")
    if len(set(pinned_ids)) != len(pinned_ids):
        raise ValueError("pinned_ids must be distinct")
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    local = (_complete_match_scores(index, stats, qterms, stem=stem,
                                    camel=camel, shard_size=shard_size,
                                    zone=zone, **kw)
             if qterms else spark.createDataFrame([], TOPK_SCHEMA))
    if round_at is not None:  # rank on rounded scores (oracle parity)
        local = local.select("doc_id", F.round("score", round_at)
                             .alias("score"))
    pins = spark.createDataFrame(
        [(int(d), i + 1) for i, d in enumerate(pinned_ids)],
        "doc_id long, _pin int")
    p = len(pinned_ids)
    pinned_part = (pins.join(local, "doc_id", "left")
                   .select("doc_id",
                           F.coalesce("score", F.lit(0.0)).alias("score"),
                           F.col("_pin"), F.lit(True).alias("pinned")))
    n_org = max(k - p, 0)
    organic = (local.join(F.broadcast(pins.select("doc_id")),
                          "doc_id", "left_anti")
               .orderBy(F.desc("score"), F.asc("doc_id")).limit(n_org)
               .select("doc_id", "score", F.lit(None).cast("int")
                       .alias("_pin"), F.lit(False).alias("pinned")))
    u = pinned_part.unionByName(organic)
    w = Window.orderBy(F.asc_nulls_last("_pin"), F.desc("score"),
                       F.asc("doc_id"))
    return (u.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("rank", "doc_id", "score", "pinned")
            .orderBy("rank"))


def distance_feature_search(index: DataFrame, stats: dict, query: str,
                            features: DataFrame, kind: str = "geo",
                            origin=None, pivot: float = 1.0,
                            boost: float = 1.0, k: int = 10,
                            stem: bool = True, camel: bool = True,
                            shard_size: int = 4096,
                            zone: str | None = None,
                            round_at: int | None = None,
                            **kw) -> DataFrame:
    """``distance_feature`` query (Elasticsearch): BM25 relevance plus
    an additive proximity boost ``boost · pivot / (pivot + dist)``
    toward an origin — geo (``kind='geo'``, ``features`` =
    (doc_id, lat, lon), ``origin`` = (lat, lon), ``pivot`` in km via
    the pinned haversine) or date (``kind='date'``, ``features`` =
    (doc_id, ts), ``origin`` = ISO timestamp string, ``pivot`` in
    seconds).  A document without a feature row gets no contribution
    (the clause simply doesn't match — ES semantics), so the join is a
    left join and never drops a relevance match.

    Same completeness-before-cut argument and plan as
    :func:`rank_feature_search`: complete match scores, one doc-keyed
    shuffle join against the feature dimension, k-row TakeOrdered."""
    from index_spark.operators.geo import haversine_km

    if kind not in ("geo", "date"):
        raise ValueError(f"kind must be geo|date, got {kind!r}")
    if pivot <= 0:
        raise ValueError(f"pivot must be > 0, got {pivot}")
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    local = _complete_match_scores(index, stats, qterms, stem=stem,
                                   camel=camel, shard_size=shard_size,
                                   zone=zone, **kw)
    if kind == "geo":
        olat, olon = (float(v) for v in origin)
        feats = features.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            haversine_km(F.lit(olat), F.lit(olon),
                         F.col("lat"), F.col("lon")).alias("_dist"))
    else:
        feats = features.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.abs(F.unix_timestamp(F.col("ts").cast("timestamp"))
                  - F.unix_timestamp(F.lit(origin).cast("timestamp")))
            .cast("double").alias("_dist"))
    contrib = (F.lit(float(boost)) * F.lit(float(pivot))
               / (F.lit(float(pivot)) + F.col("_dist")))
    sc = F.col("score") + F.coalesce(contrib, F.lit(0.0))
    if round_at is not None:  # rank on rounded scores (oracle parity)
        sc = F.round(sc, round_at)
    scored = local.join(feats, "doc_id", "left").select("doc_id",
                                                        sc.alias("score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def match_bool_prefix_search(index: DataFrame, stats: dict, query: str,
                             k: int = 10, max_expansions: int = 50,
                             stem: bool = True, camel: bool = True,
                             shard_size: int = 4096,
                             zone: str | None = None,
                             dictionary: DataFrame | None = None,
                             round_at: int | None = None,
                             **kw) -> DataFrame:
    """ES ``match_bool_prefix``: the analyzed terms become bool SHOULD
    clauses — every term but the last as a scored term query, the last
    as a PREFIX query.  Unlike ``match_phrase_prefix`` there is NO
    position requirement; "data tab" matches a doc with "table" and
    "data" anywhere, in any order.  Lucene rewrites the prefix clause
    constant-score (the default ``CONSTANT_SCORE_REWRITE`` for
    multi-term queries in a bool context), so its contribution is
    pinned at +1.0 for any doc containing ≥1 expansion; the fixed
    terms contribute their usual BM25.

    Plan: complete BM25 scores for the fixed terms (one term-pruned
    pass), the prefix clause as a bounded expansion lookup
    (dictionary-preferred, StartsWith-pruned — the
    :func:`~index_spark.operators.phrase.expand_prefix` path) feeding a
    doc-stream-only match-set decode, one doc_id full-outer join, then
    the k-row TakeOrdered.  Nothing here scales with corpus size except
    the term-pruned posting reads."""
    from index_spark.operators.analytics import matching_docs
    from index_spark.operators.phrase import expand_prefix

    if kw.get("mode") == "and":
        # ES operator=and makes every clause required INCLUDING the
        # prefix; the optional-prefix combine below would silently relax
        # it (the fuzzy mode='and' lesson) — implement when needed
        raise ValueError("match_bool_prefix supports mode='or' only: "
                         "with operator=and ES requires the prefix "
                         "clause too, which this combine does not model")
    spark = index.sparkSession
    qterms = tokenize(query, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    fixed, prefix = sorted(set(qterms[:-1])), qterms[-1]
    variants = expand_prefix(index, prefix,
                             max_expansions=max_expansions,
                             dictionary=dictionary, zone=zone)
    scored = _complete_match_scores(index, stats, fixed, stem=stem,
                                    camel=camel, shard_size=shard_size,
                                    zone=zone, **kw) if fixed else None
    # expansions are already analyzed index terms ([a-z0-9]+ runs), so
    # the stem=False/camel=False tokenize inside matching_docs is the
    # identity on them
    pref = (matching_docs(index, " ".join(variants), mode="or",
                          stem=False, camel=False, zone=zone)
            .withColumn("_pfx", F.lit(True))) if variants else None
    if scored is None and pref is None:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if scored is None:
        out = pref.select("doc_id", F.lit(1.0).alias("score"))
    elif pref is None:
        out = scored
    else:
        out = (scored.join(pref, "doc_id", "full")
               .select("doc_id",
                       (F.coalesce(F.col("score"), F.lit(0.0))
                        + F.when(F.col("_pfx"), F.lit(1.0))
                        .otherwise(F.lit(0.0))).alias("score")))
    sc = (F.round(F.col("score"), round_at) if round_at is not None
          else F.col("score"))
    return (out.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def script_score_search(index: DataFrame, stats: dict, query: str,
                        features: DataFrame | None, script: str,
                        k: int = 10, stem: bool = True,
                        camel: bool = True, shard_size: int = 4096,
                        zone: str | None = None,
                        round_at: int | None = None,
                        **kw) -> DataFrame:
    """ES ``script_score`` query: REPLACE each matching document's
    score with a script over the organic score and per-doc features —
    ``script`` is a Catalyst SQL expression referencing ``score`` and
    any column of ``features`` (doc_id-keyed), e.g.
    ``"score * ln(1 + n_chars / 100.0)"``.  Docs missing a feature row
    keep NULL feature columns (the script decides — ES parity where a
    missing field is a script responsibility).

    Plan: complete match scores (the rescale can reorder, so the cut
    follows it), ONE doc-keyed left join against the feature relation,
    row-local codegen for the script, k-row TakeOrdered.  The script
    never leaves the JVM."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    local = _complete_match_scores(index, stats, qterms, stem=stem,
                                   camel=camel, shard_size=shard_size,
                                   zone=zone, **kw)
    if features is not None:
        clash = [c for c in features.columns if c == "score"]
        if clash:
            raise ValueError("features must not carry a 'score' column "
                             "— it would shadow the organic score the "
                             "script references")
        local = local.join(features, "doc_id", "left")
    sc = F.expr(script).cast("double")
    if round_at is not None:
        sc = F.round(sc, round_at)
    return (local.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


_QS_TOKENS = re.compile(r"\(|\)|\bAND\b|\bOR\b|\bNOT\b|[^\s()]+")


def parse_query_string(q: str, stem: bool = True,
                       camel: bool = True) -> tuple:
    """Parse the Lucene/ES ``query_string`` boolean grammar — ``AND``,
    ``OR``, ``NOT``, parentheses, implicit OR between adjacent atoms
    (the ES ``default_operator``) — into a nested AST of
    ``('term', t) | ('and', [children]) | ('or', [children]) |
    ('not', child)``.  Operator keywords are UPPERCASE-only (Lucene's
    rule: lowercase and/or/not are search terms).  Precedence: NOT >
    AND > OR; a bare token analyzes through the standard tokenizer (a
    token that analyzes to several terms forms an OR group)."""
    toks = _QS_TOKENS.findall(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        nodes = [parse_and()]
        while True:
            t = peek()
            if t == "OR":
                take()
                nodes.append(parse_and())
            elif t is not None and t not in (")", "AND", "OR"):
                nodes.append(parse_and())  # adjacency = default OR
            else:
                break
        return nodes[0] if len(nodes) == 1 else ("or", nodes)

    def parse_and():
        nodes = [parse_not()]
        while peek() == "AND":
            take()
            nodes.append(parse_not())
        return nodes[0] if len(nodes) == 1 else ("and", nodes)

    def parse_not():
        if peek() == "NOT":
            take()
            return ("not", parse_not())
        return parse_atom()

    def parse_atom():
        t = peek()
        if t is None:
            raise ValueError(f"query_string ended early: {q!r}")
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError(f"unbalanced parens in {q!r}")
            take()
            return node
        if t in (")", "AND", "OR"):
            raise ValueError(f"misplaced {t!r} in {q!r}")
        take()
        terms = tokenize(t, stem=stem, camel=camel)
        if not terms:
            raise ValueError(f"token {t!r} analyzes to nothing")
        if len(terms) == 1:
            return ("term", terms[0])
        return ("or", [("term", w) for w in terms])

    node = parse_or()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in {q!r}")
    return node


def _qs_leaf_terms(node) -> set[str]:
    kind = node[0]
    if kind == "term":
        return {node[1]}
    if kind == "prefix":
        return set()
    if kind == "not":
        return _qs_leaf_terms(node[1])
    return set().union(*(_qs_leaf_terms(c) for c in node[1]))


def _qs_leaf_prefixes(node) -> set[str]:
    kind = node[0]
    if kind == "prefix":
        return {node[1]}
    if kind == "term":
        return set()
    if kind == "not":
        return _qs_leaf_prefixes(node[1])
    return set().union(*(_qs_leaf_prefixes(c) for c in node[1]))


def per_term_scores(index: DataFrame, stats: dict,
                    terms: list[str],
                    zone: str | None = None) -> DataFrame:
    """The (term, doc_id, score) BM25 contribution relation for a term
    set — the generic-composition substrate the boolean evaluator
    joins over.  Term-pruned decode (only the probed posting lists are
    read), df from index metadata (one broadcast), doc lengths from
    the '%' table joined by doc_id.  The fused shard kernels remain
    the hot path for flat queries; this relation exists for arbitrary
    boolean shapes where per-clause match sets must compose."""
    from index_spark.operators.analytics import postings_from_index
    from index_spark.operators.build import doclens_from_index

    src = pin_zone(index, zone)
    hits = src.filter(F.col("term").isin(sorted(set(terms))))
    tv = postings_from_index(hits)
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    dl = doclens_from_index(src)
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    idf = F.log((F.lit(n_docs) - F.col("df_g") + 0.5)
                / (F.col("df_g") + 0.5) + 1.0)
    tfn = (F.col("tf").cast("double")
           / (F.col("tf") + K1 * (1.0 - B + B * F.col("doc_len")
                                  / F.lit(avgdl))))
    return (tv.join(F.broadcast(dfs), "term")
            .join(dl, "doc_id")
            .select("term", "doc_id", (idf * tfn).alias("score")))


def query_string_search(index: DataFrame, stats: dict, q: str,
                        k: int = 10, stem: bool = True,
                        camel: bool = True, zone: str | None = None,
                        round_at: int | None = None) -> DataFrame:
    """Lucene/ES ``query_string`` query: full boolean grammar —
    ``(data AND table) OR (scan NOT filter)`` — evaluated as
    compositional DataFrame algebra over the per-term BM25 relation.
    Lucene scoring semantics pinned: a clause contributes its matched
    children's BM25 sum; an AND's children all contribute; an OR
    contributes whichever children matched; ``NOT`` is filter-only
    (contributes no score) and applies at its boolean level as a
    MUST_NOT anti-join — Lucene's flat-boolean rule, so ``a NOT b``
    (= SHOULD a, MUST_NOT b) and ``a AND NOT b`` both work.  A level
    with ONLY negated children is unsatisfiable-by-composition and
    raises, as Lucene's parser does.

    Plan: one term-pruned posting decode feeds every leaf; each AND is
    a doc_id inner join (score sum), each OR a full-outer join
    (coalesced sum), each NOT one anti-join — all equi-joins on
    doc_id, so Catalyst/AQE plan and reorder them; depth is bounded by
    the query, never the corpus."""
    spark = index.sparkSession
    ast = parse_query_string(q, stem=stem, camel=camel)
    terms = sorted(_qs_leaf_terms(ast))
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    S = per_term_scores(index, stats, terms, zone=zone)
    out = _eval_bool_ast(S, ast)
    sc = (F.round(F.col("score"), round_at) if round_at is not None
          else F.col("score"))
    return (out.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def _eval_bool_ast(S: DataFrame, ast,
                   prefix_sets: dict[str, DataFrame] | None = None
                   ) -> DataFrame:
    """Shared boolean-AST evaluator over the per-term BM25 relation
    ``S`` (term, doc_id, score): each AND is a doc_id inner join
    (score sum), each OR a full-outer join (coalesced sum), each NOT
    one anti-join — all equi-joins on doc_id, so Catalyst/AQE plan and
    reorder them.  ``prefix_sets`` supplies (doc_id)-frames for
    ``('prefix', p)`` leaves, which contribute a constant 1.0 per
    matching doc (ES/Lucene's constant_score multi-term rewrite)."""
    def eval_node(node) -> tuple[str, DataFrame]:
        kind = node[0]
        if kind == "term":
            return ("scored", S.filter(F.col("term") == node[1])
                    .select("doc_id", "score"))
        if kind == "prefix":
            docset = (prefix_sets or {}).get(node[1])
            if docset is None:
                raise ValueError(f"no expansion for prefix {node[1]!r}")
            return ("scored",
                    docset.select("doc_id",
                                  F.lit(1.0).alias("score")))
        if kind == "not":
            tag, child = eval_node(node[1])
            if tag != "scored":
                raise ValueError("NOT NOT is not supported — rewrite "
                                 "the query")
            return ("negated", child.select("doc_id"))
        children = [eval_node(c) for c in node[1]]
        pos = [df for tag, df in children if tag == "scored"]
        neg = [df for tag, df in children if tag == "negated"]
        if not pos:
            raise ValueError("a boolean level needs at least one "
                             "non-negated clause (Lucene's rule)")
        acc = pos[0]
        for nxt in pos[1:]:
            if kind == "and":
                acc = (acc.join(nxt.withColumnRenamed("score", "_s2"),
                                "doc_id")
                       .select("doc_id", (F.col("score")
                                          + F.col("_s2"))
                               .alias("score")))
            else:
                acc = (acc.join(nxt.withColumnRenamed("score", "_s2"),
                                "doc_id", "full")
                       .select("doc_id",
                               (F.coalesce("score", F.lit(0.0))
                                + F.coalesce("_s2", F.lit(0.0)))
                               .alias("score")))
        for nset in neg:
            acc = acc.join(nset, "doc_id", "left_anti")
        return ("scored", acc)

    tag, out = eval_node(ast)
    if tag != "scored":
        raise ValueError("query is pure negation — nothing to rank")
    return out


def common_terms_search(index: DataFrame, stats: dict, query: str,
                        cutoff_frequency: float = 0.01, k: int = 10,
                        stem: bool = True, camel: bool = True,
                        zone: str | None = None,
                        round_at: int | None = None) -> DataFrame:
    """Lucene ``CommonTermsQuery`` (the ES ``common`` terms query /
    ``cutoff_frequency`` on match): query terms split by document
    frequency at ``cutoff_frequency * N`` — LOW-frequency terms select
    the candidate set (OR over low terms, each scoring BM25), while
    HIGH-frequency ("common") terms never select on their own: their
    BM25 contribution is added only to documents already matched by a
    low-frequency term.  If every term is common, the query degrades
    to a plain OR over all of them (Lucene's rule — otherwise a
    stopword-only query would match nothing).

    Plan: one bounded df aggregate over the query terms (<= |terms|
    rows to the driver — the classification input), then the shared
    per-term BM25 relation split into two doc-keyed aggregates joined
    low-side-outer.  Everything after the term-pruned posting decode
    is JVM codegen; no posting list is read twice."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs = float(stats["n_docs"])
    src = pin_zone(index, zone)
    dfs = (src.filter(F.col("term").isin(qterms))
           .groupBy("term").agg(F.sum("df").alias("df_g")).collect())
    df_map = {r["term"]: int(r["df_g"]) for r in dfs}
    rare = sorted(t for t in qterms
                  if df_map.get(t, 0) <= cutoff_frequency * n_docs)
    common = sorted(t for t in qterms if t in df_map and t not in rare)
    if not df_map:
        return spark.createDataFrame([], TOPK_SCHEMA)
    S = per_term_scores(index, stats, sorted(df_map), zone=zone)
    if not rare:
        out = (S.groupBy("doc_id").agg(F.sum("score").alias("score")))
    else:
        low = (S.filter(F.col("term").isin(rare))
               .groupBy("doc_id").agg(F.sum("score").alias("score")))
        if common:
            high = (S.filter(F.col("term").isin(common))
                    .groupBy("doc_id").agg(F.sum("score").alias("_hs")))
            out = (low.join(high, "doc_id", "left")
                   .select("doc_id",
                           (F.col("score")
                            + F.coalesce("_hs", F.lit(0.0)))
                           .alias("score")))
        else:
            out = low
    sc = (F.round(F.col("score"), round_at) if round_at is not None
          else F.col("score"))
    return (out.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def terms_lookup_search(index: DataFrame, corpus_with_ids: DataFrame,
                        lookup_doc_id: int, top_terms: int = 5,
                        k: int = 10, stem: bool = True,
                        camel: bool = True,
                        zone: str | None = None) -> DataFrame:
    """ES ``terms`` query with *terms lookup*: the term set comes from
    another document's field instead of the request body.  The lookup
    document's ``top_terms`` highest-tf terms (tf desc, term asc —
    pinned order) become one constant-score terms filter; each matched
    distinct lookup term contributes exactly 1.0 (Lucene's
    constant-score rewrite of a terms query scores the number of
    matching clauses under a bool SHOULD), so ``score`` = |lookup
    terms present in the doc|.

    Plan: one pushdown point-read of the lookup row (bounded by one
    document at any corpus scale — the more_like_this shape), then a
    term-pruned doc-stream decode and one distinct+count aggregate.
    No tf/dl decode: matching is membership-only."""
    from collections import Counter

    spark = index.sparkSession
    rows = (corpus_with_ids.filter(F.col("doc_id") == int(lookup_doc_id))
            .select("content").collect())
    if not rows:
        return spark.createDataFrame([], TOPK_SCHEMA)
    tf = Counter(tokenize(rows[0]["content"], stem=stem, camel=camel))
    terms = sorted(t for _, t in
                   sorted(((-n, t) for t, n in tf.items()))[:top_terms])
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    from index_spark.operators.analytics import postings_from_index

    hits = pin_zone(index, zone).filter(F.col("term").isin(terms))
    matched = (postings_from_index(hits)
               .select("term", "doc_id").distinct())
    return (matched.groupBy("doc_id")
            .agg(F.count("*").cast("double").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def function_score_search(index: DataFrame, stats: dict, query: str,
                          functions: list[dict],
                          features: DataFrame | None = None,
                          boost_mode: str = "multiply",
                          score_mode: str = "sum", k: int = 10,
                          stem: bool = True, camel: bool = True,
                          shard_size: int = 4096,
                          zone: str | None = None,
                          round_at: int | None = None,
                          **kw) -> DataFrame:
    """ES ``function_score`` query: per-doc function values combine
    under ``score_mode`` (``sum``/``multiply``/``max``) into one
    factor, which combines with the organic BM25 under ``boost_mode``
    (``multiply``/``sum``/``replace``).  Supported functions:

    - ``{"kind": "field_value_factor", "field", "factor", "modifier"
      ("none"|"ln1p"|"sqrt"), "missing", "weight"}`` — a column of
      ``features`` (doc_id-keyed), ES's fvf formula
      ``modifier(factor * value)``; missing rows take ``missing``.
    - ``{"kind": "random_score", "seed", "weight"}`` — deterministic
      per-doc pseudo-random in [0,1): an LCG hash of doc_id,
      ``((doc_id * 1103515245 + seed) mod 2^32) / 2^32`` (multiplier
      bounded so the product stays in int64 for doc_id < 2^32; ES
      leaves the hash implementation-defined, this one is pinned so
      any SQL engine reproduces it).
    - ``{"kind": "weight", "weight"}`` — a constant factor.

    Each function's value multiplies its ``weight`` (ES semantics).
    Plan: complete match scores (functions can reorder, so the cut
    follows the rescale), ONE doc-keyed left join for features, then
    row-local JVM codegen for every function — the script never
    leaves the JVM."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    local = _complete_match_scores(index, stats, qterms, stem=stem,
                                   camel=camel, shard_size=shard_size,
                                   zone=zone, **kw)
    needs_features = any(f["kind"] == "field_value_factor"
                         for f in functions)
    if needs_features:
        if features is None:
            raise ValueError("field_value_factor requires a features "
                             "relation (doc_id-keyed)")
        if "score" in features.columns:
            raise ValueError("features must not carry a 'score' column")
        local = local.join(features, "doc_id", "left")

    cols = []
    for fn in functions:
        kind = fn["kind"]
        w = F.lit(float(fn.get("weight", 1.0)))
        if kind == "field_value_factor":
            v = (F.coalesce(F.col(fn["field"]).cast("double"),
                            F.lit(float(fn.get("missing", 1.0))))
                 * F.lit(float(fn.get("factor", 1.0))))
            mod = fn.get("modifier", "none")
            if mod == "ln1p":
                v = F.log(v + F.lit(1.0))
            elif mod == "sqrt":
                v = F.sqrt(v)
            elif mod != "none":
                raise ValueError(f"unknown modifier {mod!r}")
            cols.append(w * v)
        elif kind == "random_score":
            seed = int(fn.get("seed", 0))
            h = F.pmod(F.pmod(F.col("doc_id"), F.lit(4294967296))
                       * F.lit(1103515245) + F.lit(seed),
                       F.lit(4294967296))
            cols.append(w * (h.cast("double") / F.lit(4294967296.0)))
        elif kind == "weight":
            cols.append(w)
        else:
            raise ValueError(f"unknown function kind {kind!r}")
    if not cols:
        raise ValueError("function_score needs at least one function")
    if score_mode == "sum":
        fv = cols[0]
        for c in cols[1:]:
            fv = fv + c
    elif score_mode == "multiply":
        fv = cols[0]
        for c in cols[1:]:
            fv = fv * c
    elif score_mode == "max":
        fv = F.greatest(*cols) if len(cols) > 1 else cols[0]
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    if boost_mode == "multiply":
        sc = F.col("score") * fv
    elif boost_mode == "sum":
        sc = F.col("score") + fv
    elif boost_mode == "replace":
        sc = fv
    else:
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    if round_at is not None:
        sc = F.round(sc, round_at)
    return (local.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def cross_fields_search(index: DataFrame, zone_stats: dict, query: str,
                        zone_weights: dict[str, float], k: int = 10,
                        tie_breaker: float = 0.0, stem: bool = True,
                        camel: bool = True, k1: float = K1,
                        b: float = B) -> DataFrame:
    """ES ``multi_match`` type ``cross_fields``: treats the fields as
    one big field *term-wise* — each query term must only appear in
    SOME field, and scores with BLENDED statistics (Lucene
    ``BlendedTermQuery``): df_blend(t) = max over zones of the
    per-zone df, idf over N = |docs present in any zone|.  Per term
    and doc the per-zone contributions
    ``w_z * idf_blend * tf_z / (tf_z + k1*(1-b+b*dl_z/avgdl_z))``
    combine dismax-style: the best zone wins, the others add
    ``tie_breaker`` times their value; per-doc score sums over terms.
    (Contrast: :func:`dismax_search` dismaxes whole per-zone BM25
    queries; cross_fields dismaxes PER TERM with shared idf — the
    difference Lucene introduced the blending for: a term common in
    one field and rare in another no longer gets an inflated idf from
    the field it is rare in.)

    Plan: one bounded per-(zone, term) df aggregate from row metadata
    (<= |terms| x |zones| rows), one tiny doc-union job over the '%'
    marker rows for N, then ONE shard-grouped scoring kernel — the
    standard one-exchange query shape; only per-shard top-k rows
    merge globally."""
    from index_spark.operators.build import DOC_MARKER

    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)

    zsel = index.filter(F.col("zone").isin(zones))
    hits = zsel.filter(F.col("term").isin(qterms))
    zdfs = (hits.groupBy("zone", "term").agg(F.sum("df").alias("df_z"))
            .collect())
    blend: dict[str, int] = {}
    for r in zdfs:
        blend[r["term"]] = max(blend.get(r["term"], 0), int(r["df_z"]))
    if not blend:
        return spark.createDataFrame([], TOPK_SCHEMA)

    markers = (zsel.filter(F.col("term") == DOC_MARKER)
               .select("shard", "term", "doc_blob"))

    def union_docs(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = [np.cumsum(vb.decode(blob).astype(np.int64))
                for blob in pdf["doc_blob"]]
        n = np.unique(np.concatenate(docs)).size if docs else 0
        return pd.DataFrame({"term": [DOC_MARKER], "dfd": [n]})

    n_docs = sum(r["dfd"] for r in markers.groupBy("shard")
                 .applyInPandas(union_docs, _UNION_DF_SCHEMA).collect())
    if n_docs == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    idf_map = {t: math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               for t, df in blend.items()}
    zw = {z: float(zone_weights[z]) for z in zones}
    zavg = {z: float(zone_stats[z]["avgdl"]) for z in zones}
    tb = float(tie_breaker)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        lo, hi = None, None
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            az = zavg[row.zone]
            idf = idf_map.get(row.term)
            if idf is None:
                continue
            contrib = (zw[row.zone] * idf * tfs
                       / (tfs + k1 * ((1.0 - b) + b * dls / az)))
            by_term.setdefault(row.term, []).append((docs, contrib))
            lo = int(docs[0]) if lo is None else min(lo, int(docs[0]))
            hi = int(docs[-1]) if hi is None else max(hi, int(docs[-1]))
        if lo is None:
            return pd.DataFrame({"doc_id": [], "score": []})
        span = hi - lo + 1
        acc = np.zeros(span, dtype=np.float64)
        for term in sorted(by_term):  # pinned ascending-term sum order
            best = np.zeros(span, dtype=np.float64)
            tot = np.zeros(span, dtype=np.float64)
            for docs, contrib in by_term[term]:
                idx = docs - lo
                tot[idx] += contrib
                np.maximum.at(best, idx, contrib)
            nz = tot > 0.0
            acc[nz] += best[nz] + tb * (tot[nz] - best[nz])
        nzi = np.flatnonzero(acc)
        if nzi.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        return _topk_frame(nzi + lo, acc[nzi], k)

    local = hits.groupBy("shard").applyInPandas(score, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


_CFIELD_STATS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("dfd", T.LongType(), False),
    T.StructField("wdl", T.DoubleType(), False),
])


def combined_fields_search(index: DataFrame, zone_stats: dict,
                           query: str,
                           zone_weights: dict[str, float], k: int = 10,
                           stem: bool = True, camel: bool = True,
                           k1: float = K1, b: float = B) -> DataFrame:
    """ES ``combined_fields`` query: score as if the fields were ONE
    merged pseudo-field whose term frequencies are the weighted sum of
    the per-field frequencies (weights are per-field boosts; ES
    requires >= 1) — the principled term-centric alternative to
    cross_fields, derived from BM25F with a shared length
    normalization:

        tf*(t,d)  = sum_z  w_z * tf_z(t,d)
        dl*(d)    = sum_z  w_z * dl_z(d)
        avgdl*    = mean over docs of dl*
        score(d)  = sum_t idf_doc(t) * tf* / (tf* + k1*(1-b+b*dl*/avgdl*))

    with doc-level idf (df = docs containing t in ANY zone, N = docs
    in any zone) — exactly BM25 over the concatenation-with-repeats
    corpus, which is what ES documents.

    Plan mirrors :func:`bm25f_search`'s two jobs: (1) one shard-grouped
    pass over the query terms' doc streams + the '%' marker rows
    computing doc-level df per term AND (N, sum of dl*) — small rows
    only; (2) one shard-grouped scoring kernel where marker rows
    rebuild dl* per doc and posting rows accumulate tf* — one
    exchange, per-shard top-k, tiny global merge."""
    from index_spark.operators.build import DOC_MARKER

    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)
    zw = {z: float(zone_weights[z]) for z in zones}

    zsel = index.filter(F.col("zone").isin(zones))
    pool = (zsel.filter(F.col("term").isin(qterms + [DOC_MARKER]))
            .select("shard", "zone", "term", "doc_blob", "tf_blob"))

    def stats_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        terms, dfds, wdls = [], [], []
        for term, grp in pdf.groupby("term", sort=False):
            if term == DOC_MARKER:
                acc: dict[int, float] = {}
                seen = []
                for row in grp.itertuples(index=False):
                    docs = np.cumsum(
                        vb.decode(row.doc_blob).astype(np.int64))
                    dls = vb.decode(row.tf_blob).astype(np.float64)
                    seen.append(docs)
                    w = zw[row.zone]
                    for d, dl in zip(docs.tolist(), dls.tolist()):
                        acc[d] = acc.get(d, 0.0) + w * dl
                terms.append(term)
                dfds.append(np.unique(np.concatenate(seen)).size
                            if seen else 0)
                wdls.append(float(sum(acc.values())))
            else:
                docs = [np.cumsum(vb.decode(blob).astype(np.int64))
                        for blob in grp["doc_blob"]]
                terms.append(term)
                dfds.append(np.unique(np.concatenate(docs)).size)
                wdls.append(0.0)
        return pd.DataFrame({"term": terms,
                             "dfd": np.asarray(dfds, np.int64),
                             "wdl": np.asarray(wdls, np.float64)})

    agg = (pool.groupBy("shard")
           .applyInPandas(stats_fn, _CFIELD_STATS_SCHEMA)
           .groupBy("term").agg(F.sum("dfd").alias("dfd"),
                                F.sum("wdl").alias("wdl")).collect())
    dfd = {r["term"]: int(r["dfd"]) for r in agg}
    wdl_tot = sum(float(r["wdl"]) for r in agg)
    n_docs = dfd.pop(DOC_MARKER, 0)
    if not dfd or n_docs == 0:
        return spark.createDataFrame([], TOPK_SCHEMA)
    avgdl_c = wdl_tot / n_docs
    idf_map = {t: math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               for t, df in dfd.items()}

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        post: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
        marks: list[tuple[np.ndarray, np.ndarray, float]] = []
        lo, hi = None, None
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            vals = vb.decode(row.tf_blob).astype(np.float64)
            if row.term == DOC_MARKER:
                marks.append((docs, vals, zw[row.zone]))
            else:
                post.setdefault(row.term, []).append(
                    (docs, zw[row.zone] * vals))
            lo = int(docs[0]) if lo is None else min(lo, int(docs[0]))
            hi = int(docs[-1]) if hi is None else max(hi, int(docs[-1]))
        if lo is None or not post:
            return pd.DataFrame({"doc_id": [], "score": []})
        span = hi - lo + 1
        wdl = np.zeros(span, dtype=np.float64)
        for docs, dls, w in marks:
            wdl[docs - lo] += w * dls
        denom_dl = k1 * ((1.0 - b) + b * wdl / avgdl_c)
        acc = np.zeros(span, dtype=np.float64)
        for term in sorted(post):  # pinned ascending-term sum order
            idf = idf_map.get(term)
            if idf is None:
                continue
            wtf = np.zeros(span, dtype=np.float64)
            for docs, wtfs in post[term]:
                wtf[docs - lo] += wtfs
            nz = wtf > 0.0
            acc[nz] += idf * wtf[nz] / (wtf[nz] + denom_dl[nz])
        nzi = np.flatnonzero(acc)
        if nzi.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        return _topk_frame(nzi + lo, acc[nzi], k)

    local = pool.groupBy("shard").applyInPandas(score, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def term_range_search(index: DataFrame, lo: str | None, hi: str | None,
                      k: int = 10, include_lower: bool = True,
                      include_upper: bool = False,
                      zone: str | None = None) -> DataFrame:
    """Lucene ``TermRangeQuery`` under the constant-score boolean
    rewrite: every distinct index term lexicographically inside
    ``[lo, hi)`` (bounds configurable, ``None`` = open end) is a
    1.0-scoring SHOULD clause, so ``score`` = number of distinct
    in-range terms the doc contains — Lucene's
    ``CONSTANT_SCORE_BLENDED/BOOLEAN`` rewrite of a multi-term query,
    which never materializes the term set on the coordinator.

    Plan shape (the reason a term RANGE is cheap here): both build
    kernels emit term-string-sorted rows per shard batch, so the range
    predicate hits parquet row-group min/max on ``term`` before any
    decode — the scan reads only row groups overlapping the range.
    Matching is membership-only (doc-stream decode; tf/dl never read);
    the aggregate is a map-side-combinable distinct+count.  No term
    list ever reaches the driver, so there is no Lucene
    ``maxClauseCount`` analog to trip at scale."""
    from index_spark.operators.analytics import postings_from_index
    from index_spark.operators.build import DOC_MARKER

    if lo is None and hi is None:
        raise ValueError("term_range_search needs at least one bound")
    pred = F.col("term") != DOC_MARKER
    if lo is not None:
        pred &= (F.col("term") >= lo) if include_lower else \
            (F.col("term") > lo)
    if hi is not None:
        pred &= (F.col("term") <= hi) if include_upper else \
            (F.col("term") < hi)
    hits = pin_zone(index, zone).filter(pred)
    matched = (postings_from_index(hits)
               .select("term", "doc_id").distinct())
    return (matched.groupBy("doc_id")
            .agg(F.count("*").cast("double").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


_SQS_TOKENS = re.compile(r"\(|\)|\||\+|[^\s()|+]+")


def parse_simple_query_string(q: str, default_operator: str = "or",
                              stem: bool = True,
                              camel: bool = True):
    """Parse the ES ``simple_query_string`` grammar — flags
    ``AND|OR|NOT|PREFIX|PRECEDENCE``: ``+`` joins clauses
    conjunctively, ``|`` disjunctively, a leading ``-`` negates the
    next atom (token or parenthesized group), ``(...)`` groups,
    trailing ``*`` makes a prefix leaf, and bare adjacency applies
    ``default_operator``.  The PHRASE flag is not enabled: quotes are
    stripped and their tokens join at the current level (exactly what
    ES does when PHRASE is excluded from ``flags``) — exact phrases
    are first-class elsewhere (``search_dsl`` / ``phrase_search`` /
    ``multi_phrase_search``).

    LENIENT by contract, like ES: unbalanced parens, dangling
    operators, empty groups, and operator runs are repaired or
    dropped, never raised.  Returns the same AST grammar as
    :func:`parse_query_string` (``term``/``and``/``or``/``not``) plus
    ``('prefix', text)`` leaves (prefix text is lowercased and
    UNstemmed — stemming would change the prefix bytes), or ``None``
    when nothing analyzable remains.  Precedence pinned:
    ``-`` > ``+`` > ``|``; adjacency joins at the default operator's
    level."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    toks = _SQS_TOKENS.findall(q.replace('"', " "))
    # lenient paren repair: drop unmatched closers, then unmatched openers
    fixed: list[str] = []
    depth = 0
    for t in toks:
        if t == "(":
            depth += 1
        elif t == ")":
            if depth == 0:
                continue
            depth -= 1
        fixed.append(t)
    while depth > 0:  # close dangling groups at end-of-query
        fixed.append(")")
        depth -= 1
    toks = fixed
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def at_atom() -> bool:
        t = peek()
        return t is not None and t not in (")", "|", "+")

    def parse_or():
        nodes = [parse_and()]
        while True:
            t = peek()
            if t == "|":
                take()
                if not at_atom():  # dangling '|' — drop it
                    continue
                nxt = parse_and()
                if nxt is not None:
                    nodes.append(nxt)
            elif default_operator == "or" and at_atom():
                nxt = parse_and()
                if nxt is not None:
                    nodes.append(nxt)
            else:
                break
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else ("or", nodes)

    def parse_and():
        nodes = [parse_unary()]
        while True:
            t = peek()
            if t == "+":
                take()
                if not at_atom():  # dangling '+' — drop it
                    continue
                nodes.append(parse_unary())
            elif default_operator == "and" and at_atom():
                nodes.append(parse_unary())
            else:
                break
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else ("and", nodes)

    def parse_unary():
        t = peek()
        if t is None or t in (")", "|", "+"):
            return None
        if t == "(":
            take()
            node = parse_or()
            if peek() == ")":
                take()
            return node
        take()
        neg = 0
        while t.startswith("-"):
            neg += 1
            t = t[1:]
        if not t:  # bare '-' run: negate the next atom if any
            node = parse_unary() if at_atom() or peek() == "(" else None
            if node is None:
                return None
            return ("not", node) if neg % 2 else node
        node = _sqs_atom(t, stem=stem, camel=camel)
        if node is None:
            return None
        return ("not", node) if neg % 2 else node

    def join_default(nodes):
        if not nodes:
            return None
        if len(nodes) == 1:
            return nodes[0]
        return (default_operator, nodes)

    def _sqs_atom(t: str, stem: bool, camel: bool):
        is_prefix = t.endswith("*")
        t = t.rstrip("*")
        if not t:
            return None  # bare '*' — lenient drop (no match_all leaf)
        if is_prefix:
            # prefix text: analyzer minus stemming (prefix bytes are
            # literal); a multi-token fragment keeps its tail as the
            # prefix, leading tokens join at the default operator
            parts = tokenize(t, stem=False, camel=camel)
            if not parts:
                return None
            lead = []
            for w in parts[:-1]:
                lead.extend(tokenize(w, stem=stem, camel=camel))
            nodes = [("term", w) for w in lead]
            nodes.append(("prefix", parts[-1]))
            return join_default(nodes)
        terms = tokenize(t, stem=stem, camel=camel)
        if not terms:
            return None
        if len(terms) == 1:
            return ("term", terms[0])
        return join_default([("term", w) for w in terms])

    node = parse_or()
    # leniency backstop: trailing garbage is ignored by construction
    return node


def simple_query_string_search(index: DataFrame, stats: dict, q: str,
                               k: int = 10,
                               default_operator: str = "or",
                               stem: bool = True, camel: bool = True,
                               zone: str | None = None,
                               max_expansions: int = 50,
                               dictionary: DataFrame | None = None,
                               round_at: int | None = None) -> DataFrame:
    """ES ``simple_query_string`` query: the lenient end-user grammar
    (``+ | - ( ) *``) evaluated on the same compositional join algebra
    as :func:`query_string_search` — one term-pruned per-term BM25
    relation feeds every term leaf; each ``*`` prefix leaf rewrites
    against the term catalog (:func:`expand_prefix_terms`, bounded by
    ``max_expansions``) into a membership doc set contributing a
    constant 1.0 per doc (Lucene's constant_score multi-term rewrite).
    Unparseable fragments are repaired or dropped, never raised — the
    ES contract for this query.  A query that is pure negation (or
    analyzes to nothing) returns no rows."""
    from index_spark.operators.analytics import postings_from_index
    from index_spark.operators.phrase import expand_prefix_terms

    spark = index.sparkSession
    ast = parse_simple_query_string(q, default_operator=default_operator,
                                    stem=stem, camel=camel)
    if ast is None:
        return spark.createDataFrame([], TOPK_SCHEMA)
    terms = sorted(_qs_leaf_terms(ast))
    prefixes = sorted(_qs_leaf_prefixes(ast))
    S = per_term_scores(index, stats, terms, zone=zone) if terms else \
        spark.createDataFrame(
            [], "term string, doc_id long, score double")
    prefix_sets: dict[str, DataFrame] = {}
    for p in prefixes:
        exp = expand_prefix_terms(index, p, max_expansions=max_expansions,
                                  zone=zone, dictionary=dictionary)
        if exp:
            hits = pin_zone(index, zone).filter(F.col("term").isin(exp))
            prefix_sets[p] = (postings_from_index(hits)
                              .select("doc_id").distinct())
        else:  # empty rewrite matches nothing (Lucene)
            prefix_sets[p] = spark.createDataFrame([], "doc_id long")
    try:
        out = _eval_bool_ast(S, ast, prefix_sets)
    except ValueError:
        # pure negation — ES would match-all-minus; we pin no-rows
        # (consistent with query_string_search's Lucene rule)
        return spark.createDataFrame([], TOPK_SCHEMA)
    sc = (F.round(F.col("score"), round_at) if round_at is not None
          else F.col("score"))
    return (out.select("doc_id", sc.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def phonetic_expand(index: DataFrame | None, qterms: list[str],
                    max_expansions: int = 8, zone: str | None = None,
                    dictionary: DataFrame | None = None
                    ) -> dict[str, list[str]]:
    """Per query term, the catalog terms sharing its phonetic key
    (``functions/phonetic.py`` pinned soundex) — the expansion behind
    ``sounds_like_search``, Lucene ``PhoneticFilter`` semantics.  Kept
    to the ``max_expansions`` highest-df terms per key (df desc, term
    asc — the fuzzy family's pinned order).

    Catalog shape exactly like :func:`fuzzy_expand`: prefers the
    compacted dictionary (millions of rows, blob-free); the key
    expression is row-local codegen, so the scan is one cheap pass —
    and compaction can persist the key as a catalog column to make it
    a hash-prunable equi-join at very large vocabularies."""
    from index_spark.functions.phonetic import phonetic_key, phonetic_key_py
    from index_spark.operators.build import DOC_MARKER

    from pyspark.sql import Window

    keys = {t: phonetic_key_py(t) for t in qterms}
    want = sorted({k for k in keys.values() if k})
    if not want:
        return {t: [] for t in qterms}
    if dictionary is not None:
        cat = pin_zone(dictionary, zone)
        if "pkey" not in cat.columns:  # pre-phonetic-column catalogs
            cat = cat.withColumn("pkey", phonetic_key(F.col("term")))
        cat = cat.select("term", "df", "pkey")
    else:
        if index is None:
            raise ValueError("need an index or a dictionary to expand")
        cat = (pin_zone(index, zone)
               .filter(F.col("term") != DOC_MARKER)
               .groupBy("term").agg(F.sum("df").alias("df"))
               .withColumn("pkey", phonetic_key(F.col("term"))))
    cat = cat.filter(F.col("pkey").isin(want))
    w = Window.partitionBy("pkey").orderBy(F.desc("df"), F.asc("term"))
    rows = (cat.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= int(max_expansions))
            .select("pkey", "term").collect())
    by_key: dict[str, list[str]] = {}
    for r in rows:
        by_key.setdefault(r["pkey"], []).append(r["term"])
    return {t: sorted(by_key.get(keys[t], [])) if keys[t] else []
            for t in qterms}


def sounds_like_search(index: DataFrame, docs: DataFrame | None,
                       stats: dict, query: str, k: int = 10,
                       max_expansions: int = 8, stem: bool = True,
                       camel: bool = True, shard_size: int = 4096,
                       zone: str | None = None, mode: str = "or",
                       exclude: str | None = None,
                       dictionary: DataFrame | None = None,
                       **kw) -> DataFrame:
    """Phonetic ("sounds-like") top-k BM25: each query term expands to
    its soundex-key neighborhood in the term catalog
    (:func:`phonetic_expand`), then ONE search runs over the distinct
    expanded terms, each variant scored with its own global idf —
    exactly the :func:`search_fuzzy` composition with the edit-distance
    neighborhood swapped for the phonetic one (Lucene's
    ``PhoneticFilter`` + query-time analysis chain).

    ``mode="and"`` is group-conjunctive like fuzzy: a doc must contain
    at least one variant of EVERY original term.  ``exclude`` is
    tokenized HERE with the caller's stem/camel flags (the inner
    search runs stem=False on pre-analyzed expansions).  Two jobs: the
    bounded catalog expansion, then the one-exchange scoring plan."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    exp = phonetic_expand(index, qterms, max_expansions=max_expansions,
                          zone=zone, dictionary=dictionary)
    terms = sorted({t for v in exp.values() for t in v})
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    if exclude is not None:
        exclude = " ".join(
            sorted(set(tokenize(exclude, stem=stem, camel=camel)))) or None
    groups = None
    if mode == "and":
        if any(not exp.get(t) for t in qterms):
            return spark.createDataFrame([], TOPK_SCHEMA)
        gids: dict[str, list[int]] = {}
        for i, t in enumerate(qterms):
            for v in exp[t]:
                gids.setdefault(v, []).append(i)
        groups = {v: tuple(g) for v, g in gids.items()}
    return search(index, docs, stats, " ".join(terms), k=k, stem=False,
                  camel=False, shard_size=shard_size, zone=zone,
                  mode=mode, exclude=exclude, groups=groups, **kw)


def sparse_vector_search(index: DataFrame, stats: dict | None,
                         query_weights: dict[str, float], k: int = 10,
                         zone: str | None = None,
                         round_at: int | None = None) -> DataFrame:
    """ES ``sparse_vector`` query (the learned-sparse / ELSER serving
    shape): the query is a sparse feature map ``{token: weight}``; a
    doc scores the dot product of the query map with its own sparse
    features.  Doc-side feature weights are pinned to the sublinear
    impact ``ln(1 + tf)`` derived from the index itself (the classic
    SPLADE-family impact; a model-produced weight column would slot in
    identically as a third blob).

    Plan: exactly the BM25 scan shape — term-pruned columnar decode of
    only the query tokens' posting lists, then one
    map-side-combinable weighted sum per doc; scoring needs no global
    statistics, so there is no idf broadcast at all.  ES's optional
    ``prune`` heuristic (drop query tokens whose df is a large
    multiple of the average — they cost the most and discriminate the
    least) is the caller's choice here: filter ``query_weights``
    against the term catalog before calling."""
    from index_spark.operators.analytics import postings_from_index

    spark = index.sparkSession
    terms = sorted(query_weights)
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    wmap = F.create_map(*[F.lit(x) for t in terms
                          for x in (t, float(query_weights[t]))])
    hits = pin_zone(index, zone).filter(F.col("term").isin(terms))
    posts = postings_from_index(hits)
    score = F.sum(wmap[F.col("term")]
                  * F.log(F.lit(1.0) + F.col("tf")))
    if round_at is not None:
        score = F.round(score, round_at)
    return (posts.groupBy("doc_id").agg(score.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def collapse_inner_hits(index: DataFrame, docs: DataFrame, stats: dict,
                        query: str, collapse: str = "source",
                        k: int = 10, inner_size: int = 3,
                        stem: bool = True,
                        use_wand: bool | str = "auto",
                        shard_size: int = 4096, camel: bool = True,
                        zone: str | None = None, mode: str = "or",
                        exclude: str | None = None,
                        tombstones: DataFrame | None = None,
                        restrict: DataFrame | None = None) -> DataFrame:
    """ES ``collapse`` with ``inner_hits``: the top-k collapse groups
    (ranked by their best document, exactly :func:`collapse_search`'s
    order) each return their own top-``inner_size`` matching documents
    as (group_key, inner_rank, doc_id, score).

    Same one-exchange complete-scores plan as collapse_search, plus
    ONE group-keyed window for the per-group rank — the window's
    partition count is the group cardinality (a real dimension:
    source/host/repo), never the corpus, and rows past ``inner_size``
    drop before the winners join.  The k winning groups are a bounded
    relation, so the final join broadcasts."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    out_schema = T.StructType([
        T.StructField("group_key", T.StringType(), True),
        T.StructField("inner_rank", T.IntegerType(), False),
    ] + list(TOPK_SCHEMA.fields))
    if not qterms:
        return spark.createDataFrame([], out_schema)
    from pyspark.sql import Window

    local = _complete_match_scores(
        index, stats, qterms, exclude, stem=stem, camel=camel,
        use_wand=use_wand, shard_size=shard_size, zone=zone, mode=mode,
        tombstones=tombstones, restrict=restrict)
    keyed = local.join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.col(collapse).alias("group_key")),
        "doc_id")
    wg = Window.partitionBy("group_key").orderBy(F.desc("score"),
                                                 F.asc("doc_id"))
    ranked = (keyed.withColumn("inner_rank", F.row_number().over(wg))
              .filter(F.col("inner_rank") <= int(inner_size)))
    winners = (ranked.filter(F.col("inner_rank") == 1)
               .select("group_key",
                       F.col("score").alias("_best_score"),
                       F.col("doc_id").alias("_best_doc"))
               .orderBy(F.desc("_best_score"), F.asc("_best_doc"))
               .limit(k))
    return (ranked.join(F.broadcast(winners), "group_key")
            .orderBy(F.desc("_best_score"), F.asc("_best_doc"),
                     F.asc("inner_rank"))
            .select("group_key", "inner_rank", "doc_id", "score"))


def highlight(topk: DataFrame, corpus_with_ids: DataFrame, query: str,
              stem: bool = False, camel: bool = False,
              fragment_size: int = 16, n_fragments: int = 3,
              pre_tag: str = "<em>", post_tag: str = "</em>",
              text_col: str = "content") -> DataFrame:
    """Multi-fragment highlighting for a top-k result page — the ES
    ``highlight`` API (unified highlighter) re-expressed over the
    analyzer's token stream.

    Pinned contract (deterministic and restatable in any SQL dialect,
    unlike Lucene's passage-break heuristics):

    - the document's analyzed tokens (``lower`` → ``[a-z0-9]+`` runs in
      SQL-parity mode) tile into consecutive ``fragment_size``-token
      windows;
    - a window's score is its query-term occurrence count; windows with
      zero hits are never emitted;
    - the ``n_fragments`` best windows win by (hits desc, window asc)
      and are emitted in DOCUMENT order (``frag_no`` = 1.. in position
      order, the unified highlighter's default);
    - fragment text = the window's tokens joined by single spaces, each
      query-term token wrapped ``pre_tag``/``post_tag``.

    Plan shape: the k-row top-k relation broadcasts into the corpus
    scan (exactly k documents' text is read at any corpus scale); the
    tokenize / window-score / wrap pipeline is pure whole-stage-codegen
    (``split``/``slice``/``filter``/``transform``/``array_join`` — no
    Python, no extra exchange); the only per-doc fan-out is one row per
    token window, bounded by doc length / ``fragment_size`` over k
    docs. The final per-doc rank is a window over ≤ k partitions.

    Returns (doc_id, score, frag_no, hits, fragment).
    """
    from pyspark.sql import Window

    if fragment_size < 1 or n_fragments < 1:
        raise ValueError("fragment_size and n_fragments must be >= 1")
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    out_schema = ("doc_id long, score double, frag_no int, hits long, "
                  "fragment string")
    if not qterms:
        return topk.sparkSession.createDataFrame([], out_schema)
    qset = F.array(*[F.lit(t) for t in qterms])
    fs = int(fragment_size)

    if stem or camel:
        # highlighting wraps the analyzed token stream; the JVM-side
        # expression pipeline implements only the SQL-parity analyzer
        # (stemmed/camel surfaces live in the Arrow tokenizer — use
        # snippets() for stemmed indexes, which matches literal text)
        raise ValueError("highlight supports the SQL-parity analyzer "
                         "only (stem=False, camel=False); use snippets()"
                         " for stemmed indexes")
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != "")
    joined = (corpus_with_ids.join(F.broadcast(topk), "doc_id")
              .select("doc_id", "score", toks.alias("_toks")))
    n_win = F.ceil(F.size(F.col("_toks")) / fs).cast("int")
    # guard: sequence(0, -1) DESCENDS in Spark, so a token-less doc must
    # produce an empty window array (explode then emits no rows)
    seq = F.when(F.size(F.col("_toks")) > 0,
                 F.sequence(F.lit(0), n_win - 1)) \
           .otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    wins = (joined
            .select("doc_id", "score", "_toks",
                    F.explode(seq).alias("win")))
    frag_toks = F.slice(F.col("_toks"), F.col("win") * fs + 1, fs)
    hits = F.size(F.filter(frag_toks,
                           lambda t: F.array_contains(qset, t)))
    wrapped = F.array_join(
        F.transform(frag_toks,
                    lambda t: F.when(F.array_contains(qset, t),
                                     F.concat(F.lit(pre_tag), t,
                                              F.lit(post_tag)))
                    .otherwise(t)), " ")
    scored = (wins.select("doc_id", "score", "win",
                          hits.cast("long").alias("hits"),
                          wrapped.alias("fragment"))
              .filter(F.col("hits") > 0))
    wd = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("win"))
    kept = (scored.withColumn("_rk", F.row_number().over(wd))
            .filter(F.col("_rk") <= int(n_fragments)))
    wo = Window.partitionBy("doc_id").orderBy(F.asc("win"))
    return (kept.withColumn("frag_no", F.row_number().over(wo))
            .select("doc_id", "score", "frag_no", "hits", "fragment")
            .orderBy(F.asc("doc_id"), F.asc("frag_no")))


def dfr_search(index: DataFrame, stats: dict, query: str,
               c: float = 1.0, k: int = 10, stem: bool = True,
               camel: bool = True, zone: str | None = None,
               tombstones: DataFrame | None = None) -> DataFrame:
    """Top-k ranking under the Divergence-From-Randomness framework
    (Amati & van Rijsbergen, TOIS 2002) in Lucene's classic
    ``DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2)``
    configuration ("IneL2" family with the I(n) basic model) — the
    fourth similarity module next to BM25, Classic, and the LM pair.

    Scoring contract (pinned so the oracle restates it exactly):

        tfn      = tf * log2(1 + c * avgdl / dl)          (H2)
        score(d) = sum_t  tfn / (tfn + 1)                  (L)
                          * log2((N + 1) / (df_t + 0.5))   (I(n))

    summed over the doc's matched query terms (matched-terms-only, the
    Lucene convention). df_t is the GLOBAL df summed from the term's
    segment metadata rows — a bounded aggregate, no blob decode — and
    N/avgdl come from ``stats``. Plan shape is
    :func:`lm_dirichlet_search`'s: term filter pushed to the scan,
    shard-local decode of matched rows only (dl rides in ``dl_blob``),
    pinned ascending-term summation, k-row TakeOrderedAndProject.
    """
    spark = index.sparkSession
    if c <= 0:
        raise ValueError(f"c must be positive, got {c}")
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive (zoned index: pass the pinned "
                         "zone's stats)")
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(qterms))
    ln2 = float(np.log(2.0))
    w = {r["term"]: np.log((n_docs + 1.0) / (float(r["df"]) + 0.5)) / ln2
         for r in matched.select("term", "df").groupBy("term")
                         .agg(F.sum("df").alias("df")).collect()}
    if not w:
        return spark.createDataFrame([], TOPK_SCHEMA)
    hits = matched.filter(F.col("term").isin(sorted(w))) \
                  .select("shard", "term", "doc_blob", "tf_blob", "dl_blob")
    c_avgdl = float(c) * avgdl

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        all_docs, parts = [], []
        for t in sorted(per_term):  # pinned summation order
            wt = w[t]
            for docs, tfs, dls in per_term[t]:
                all_docs.append(docs)
                tfn = tfs * (np.log1p(c_avgdl / dls) / ln2)
                parts.append(tfn / (tfn + 1.0) * wt)
        docs = np.concatenate(all_docs)
        part = np.concatenate(parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.zeros(uniq.size, np.float64)
        np.add.at(score, inv, part)
        return pd.DataFrame({"doc_id": uniq, "score": score})

    scored = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    if tombstones is not None:
        scored = scored.join(
            tombstones.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _termwise_topk(index: DataFrame, query: str,
                   make_weights, part_fn, k: int, stem: bool,
                   camel: bool, zone: str | None,
                   tombstones: DataFrame | None) -> DataFrame:
    """Shared matched-terms-only scoring kernel for the per-term
    similarity modules (DFI / IB / Axiomatic — same plan shape as
    :func:`dfr_search`): term filter pushed to the scan, one bounded
    per-term metadata aggregate (df/cf rows, never blobs) feeding
    ``make_weights(rows) -> {term: weight_tuple}``, then shard-local
    decode of matched rows only with ``part_fn(weights[t], tfs, dls)``
    returning each posting's score contribution; pinned ascending-term
    summation, k-row TakeOrderedAndProject. Exactly one exchange of
    (doc_id, score) rows; doc lengths ride in ``dl_blob``."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(qterms))
    meta = matched.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")).collect()
    w = make_weights(meta)
    if not w:
        return spark.createDataFrame([], TOPK_SCHEMA)
    hits = matched.filter(F.col("term").isin(sorted(w))) \
                  .select("shard", "term", "doc_blob", "tf_blob", "dl_blob")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.float64)
            dls = vb.decode(row.dl_blob).astype(np.float64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        all_docs, parts = [], []
        for t in sorted(per_term):  # pinned summation order
            for docs, tfs, dls in per_term[t]:
                all_docs.append(docs)
                parts.append(part_fn(w[t], tfs, dls))
        docs = np.concatenate(all_docs)
        part = np.concatenate(parts)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.zeros(uniq.size, np.float64)
        np.add.at(score, inv, part)
        return pd.DataFrame({"doc_id": uniq, "score": score})

    scored = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    if tombstones is not None:
        scored = scored.join(
            tombstones.select(F.col("doc_id").cast("long").alias("doc_id")),
            "doc_id", "left_anti")
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def dfi_search(index: DataFrame, stats: dict, query: str,
               measure: str = "standardized", k: int = 10,
               stem: bool = True, camel: bool = True,
               zone: str | None = None,
               tombstones: DataFrame | None = None) -> DataFrame:
    """Top-k under Divergence From Independence (Kocabas, Dincer &
    Karaoglan, Inf. Retrieval 2014; Lucene ``DFISimilarity``) — the
    fifth similarity module next to BM25/Classic/LM/DFR. Non-parametric:
    no tunables, just how far the observed tf diverges from the tf
    expected under term/document independence.

    Scoring contract (pinned so the oracle restates it exactly):

        expected(t, d) = (cf_t + 1) * dl_d / (T + 1)
        contribution   = 0                        if tf <= expected
                       = log2(measure + 1)        otherwise
        standardized: (tf - e) / sqrt(e)     [Lucene default]
        saturated:    (tf - e) / e
        chisquared:   (tf - e)^2 / e

    T = total tokens in the collection (``stats['total_tokens']``),
    cf_t the GLOBAL collection frequency summed from segment metadata
    rows. Matched-terms-only, the Lucene convention; docs at or below
    the independence expectation contribute exactly zero (Lucene's
    "divergence from independence is non-negative" gate). Plan shape:
    :func:`dfr_search` (one exchange, blob decode only for matched
    rows)."""
    if measure not in ("standardized", "saturated", "chisquared"):
        raise ValueError(f"unknown independence measure: {measure!r}")
    t_total = float(stats.get("total_tokens") or 0)
    if t_total <= 0:
        raise ValueError("stats['total_tokens'] must be positive "
                         "(zoned index: pass the pinned zone's stats)")
    ln2 = float(np.log(2.0))

    def make_weights(meta):
        # weight = (cf + 1) / (T + 1): the per-token expectation rate
        return {r["term"]: (float(r["cf"]) + 1.0) / (t_total + 1.0)
                for r in meta}

    def part(rate, tfs, dls):
        e = rate * dls
        if measure == "standardized":
            m = (tfs - e) / np.sqrt(e)
        elif measure == "saturated":
            m = (tfs - e) / e
        else:
            m = (tfs - e) ** 2 / e
        return np.where(tfs > e, np.log1p(np.maximum(m, 0.0)) / ln2, 0.0)

    return _termwise_topk(index, query, make_weights, part, k,
                          stem, camel, zone, tombstones)


def ib_search(index: DataFrame, stats: dict, query: str,
              distribution: str = "ll", lam: str = "df", c: float = 1.0,
              k: int = 10, stem: bool = True, camel: bool = True,
              zone: str | None = None,
              tombstones: DataFrame | None = None) -> DataFrame:
    """Top-k under the Information-Based framework (Clinchant &
    Gaussier, SIGIR 2010; Lucene ``IBSimilarity``) — the sixth
    similarity module. Information gain of observing tfn occurrences
    under a power-law (LL) or smoothed power-law (SPL) frequency
    distribution with a per-term burstiness parameter lambda.

    Scoring contract (pinned so the oracle restates it exactly):

        tfn       = tf * log2(1 + c * avgdl / dl)          (H2)
        lambda_t  = (df_t + 1) / (N + 1)      [lam='df']
                  = (cf_t + 1) / (N + 1)      [lam='ttf']
        LL:  contribution = ln((tfn + lambda) / lambda)
        SPL: contribution = -ln((lambda^(tfn/(tfn+1)) - lambda)
                                / (1 - lambda))

    df_t/cf_t are GLOBAL sums from segment metadata; N/avgdl from
    ``stats``. Matched-terms-only; plan shape :func:`dfr_search`.
    LL is well-defined for any lambda > 0 (a corpus-wide term has
    df = N, lambda = 1, contribution ln(tfn + 1)); SPL's
    (lambda^x - lambda)/(1 - lambda) degenerates at lambda >= 1, so
    SPL callers get a loud error there rather than NaN scores."""
    if distribution not in ("ll", "spl"):
        raise ValueError(f"unknown distribution: {distribution!r}")
    if lam not in ("df", "ttf"):
        raise ValueError(f"unknown lambda: {lam!r}")
    if c <= 0:
        raise ValueError(f"c must be positive, got {c}")
    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive (zoned index: pass the pinned "
                         "zone's stats)")
    ln2 = float(np.log(2.0))
    c_avgdl = float(c) * avgdl

    def make_weights(meta):
        out = {}
        for r in meta:
            base = float(r["df"]) if lam == "df" else float(r["cf"])
            lv = (base + 1.0) / (n_docs + 1.0)
            if lv >= 1.0 and distribution == "spl":
                raise ValueError(
                    f"lambda >= 1 for term {r['term']!r} "
                    f"(lam={lam!r}): SPL degenerates")
            out[r["term"]] = lv
        return out

    def part(lv, tfs, dls):
        tfn = tfs * (np.log1p(c_avgdl / dls) / ln2)
        if distribution == "ll":
            return np.log((tfn + lv) / lv)
        return -np.log((np.power(lv, tfn / (tfn + 1.0)) - lv) / (1.0 - lv))

    return _termwise_topk(index, query, make_weights, part, k,
                          stem, camel, zone, tombstones)


def axiomatic_search(index: DataFrame, stats: dict, query: str,
                     variant: str = "f2exp", s: float = 0.5,
                     kexp: float = 0.35, k: int = 10, stem: bool = True,
                     camel: bool = True, zone: str | None = None,
                     tombstones: DataFrame | None = None) -> DataFrame:
    """Top-k under the axiomatic retrieval framework (Fang & Zhai,
    SIGIR 2005; Lucene ``AxiomaticF2EXP`` / ``AxiomaticF2LOG``) — the
    seventh similarity module: scoring functions DERIVED from retrieval
    constraints (TFC/TDC/LNC) rather than a probabilistic model.

    Scoring contract (pinned so the oracle restates it exactly):

        tfln = tf / (tf + s + s * dl / avgdl)
        F2EXP: contribution = ((N + 1) / df_t)^kexp       * tfln
        F2LOG: contribution = ln((N + 1) / df_t)          * tfln

    with Lucene's defaults s=0.5, kexp=0.35. df_t is the GLOBAL df
    summed from segment metadata; N/avgdl from ``stats``.
    Matched-terms-only; plan shape :func:`dfr_search`."""
    if variant not in ("f2exp", "f2log"):
        raise ValueError(f"unknown axiomatic variant: {variant!r}")
    if s <= 0:
        raise ValueError(f"s must be positive, got {s}")
    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive (zoned index: pass the pinned "
                         "zone's stats)")

    def make_weights(meta):
        out = {}
        for r in meta:
            ratio = (n_docs + 1.0) / float(r["df"])
            out[r["term"]] = (ratio ** float(kexp) if variant == "f2exp"
                              else float(np.log(ratio)))
        return out

    def part(idf, tfs, dls):
        return idf * tfs / (tfs + s + s * dls / avgdl)

    return _termwise_topk(index, query, make_weights, part, k,
                          stem, camel, zone, tombstones)


def completion_catalog(docs: DataFrame, context_col: str,
                       text_col: str = "text") -> DataFrame:
    """Build the context-aware completion catalog (the ES completion-
    suggester's at-rest form with CATEGORY CONTEXTS): one row per
    (context, term) with the term's df within that context as its
    suggestion weight. Surface forms — no stemming — because
    completions echo back what users typed.

    One map-side-combinable aggregate over the token stream; at 100 TB
    the result is |contexts| x |vocab| rows (millions), a broadcast-
    sized dimension the suggest path scans instead of the corpus."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))),
                            "[^a-z0-9]+"), lambda x: x != "")
    return (docs.select(F.col(context_col).alias("context"),
                        F.col("doc_id"),
                        F.explode_outer(toks).alias("term"))
            .filter(F.col("term").isNotNull())
            .groupBy("context", "term")
            .agg(F.countDistinct("doc_id").alias("df")))


def context_suggest(catalog: DataFrame, prefix: str,
                    contexts: dict[str, float], size: int = 10
                    ) -> DataFrame:
    """Context-filtered completion (the ES completion suggester's
    category-contexts query): candidates are catalog terms starting
    with ``prefix`` whose context is in the query's context set;
    each candidate scores

        score = max over matched contexts of (df * boost)

    — the ES rule that when a suggestion matches several query contexts
    the most significant (highest-boosting) one wins, not their sum.
    Returns (term, score) top-``size`` by (score desc, term asc),
    4-decimal rounds.

    Plan: ``StartsWith`` prunes row groups of the term-sorted catalog,
    the context filter is an IN over a literal set, the boost applies
    via a broadcast-sized CASE, and the cut is TakeOrderedAndProject —
    no corpus access, no join."""
    if not contexts:
        raise ValueError("contexts must be non-empty "
                         "(use term_prefix_stats for uncontexted "
                         "prefix walks)")
    if not prefix:
        raise ValueError("prefix must be non-empty")
    boost = F.lit(None).cast("double")
    for ctx, b in sorted(contexts.items()):
        boost = F.when(F.col("context") == ctx,
                       F.lit(float(b))).otherwise(boost)
    return (catalog
            .filter(F.col("term").startswith(prefix)
                    & F.col("context").isin(sorted(contexts)))
            .select("term", (F.col("df") * boost).alias("_s"))
            .groupBy("term").agg(F.round(F.max("_s"), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("term")).limit(size))


def bm25_lossy_search(index: DataFrame, stats: dict, query: str,
                      k: int = 10, stem: bool = True, camel: bool = True,
                      zone: str | None = None,
                      tombstones: DataFrame | None = None) -> DataFrame:
    """Lucene-fidelity BM25: identical to :func:`search`'s scoring
    contract EXCEPT that the document length enters through Lucene's
    lossy one-byte norm codec (``SmallFloat.intToByte4`` — see
    functions/norms.py):

        dl_q     = byte4ToInt(intToByte4(dl))     (4 significant bits)
        score(d) = sum_t ln(1 + (N - df + 0.5)/(df + 0.5))
                         * tf / (tf + k1*(1 - b + b * dl_q / avgdl))

    k1=1.2, b=0.75; avgdl stays the EXACT collection mean
    (Lucene computes avgFieldLength from sumTotalTermFreq/docCount,
    not from the decoded norms). Docs no longer than 40 tokens score
    identically to :func:`search` (the codec's NUM_FREE_VALUES exact
    range; 41 is the first lossy value); longer docs floor to their
    quantization bucket, which is exactly where Lucene and textbook
    BM25 diverge — this kernel is the parity target when validating
    against a real Lucene/ES run. Plan shape: :func:`dfr_search`
    (one exchange)."""
    from index_spark.functions.norms import quantize_norms_np

    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive (zoned index: pass the pinned "
                         "zone's stats)")

    def make_weights(meta):
        return {r["term"]: math.log(1.0 + (n_docs - float(r["df"]) + 0.5)
                                    / (float(r["df"]) + 0.5))
                for r in meta}

    def part(idf, tfs, dls):
        dlq = quantize_norms_np(dls).astype(np.float64)
        return idf * tfs / (tfs + K1 * (1.0 - B + B * dlq / avgdl))

    return _termwise_topk(index, query, make_weights, part, k,
                          stem, camel, zone, tombstones)


CHAMPION_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("tf", T.LongType(), False),
    T.StructField("dl", T.LongType(), False),
])


def build_champion_lists(index: DataFrame, n: int = 32,
                         zone: str | None = None) -> DataFrame:
    """Champion lists (a.k.a. static index pruning / top-docs lists —
    Manning et al., IIR §7.1.3; Ntoulas & Cho, SIGIR 2007): for every
    term, the ``n`` postings with the highest tf (doc_id-asc
    tiebreak) plus the term's GLOBAL df — a compaction-time companion
    relation that serves approximate top-k from a tiny fraction of the
    index (:func:`search_champions`).

    Returns (term, df, doc_id, tf, dl), at most ``n`` rows per term.

    Scale shape: each index ROW contributes only its own top-``n``
    candidates from inside the Arrow decode kernel (a map-side
    pre-cut: a hot term with thousands of segment rows ships
    n*rows candidates, never its full posting list), then one window
    per term over those survivors makes the cut global; df is the
    usual metadata-only aggregate broadcast back. Build-time cost, so
    the window over the pre-cut relation is acceptable — the query
    path never touches the full index."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    index = pin_zone(index, zone)
    from index_spark.operators.build import DOC_MARKER

    terms = index.filter(F.col("term") != DOC_MARKER)
    dfg = terms.groupBy("term").agg(F.sum("df").alias("df"))

    def fn(batches):
        # one output frame per ARROW BATCH, not per index row — a
        # per-row yield pays DataFrame construction + Arrow
        # serialization once per (term, segment) row and becomes
        # allocation-bound on million-row indexes
        for pdf in batches:
            t_out, d_out, tf_out, dl_out = [], [], [], []
            for row in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(row.doc_blob)
                                 .astype(np.int64))
                tfs = vb.decode(row.tf_blob).astype(np.int64)
                dls = vb.decode(row.dl_blob).astype(np.int64)
                if docs.size > n:
                    # row-local pre-cut: top-n by (tf desc, doc asc)
                    order = np.lexsort((docs, -tfs))[:n]
                    docs, tfs, dls = docs[order], tfs[order], dls[order]
                t_out.append(np.repeat(row.term, docs.size))
                d_out.append(docs)
                tf_out.append(tfs)
                dl_out.append(dls)
            if t_out:
                yield pd.DataFrame({
                    "term": np.concatenate(t_out),
                    "doc_id": np.concatenate(d_out),
                    "tf": np.concatenate(tf_out),
                    "dl": np.concatenate(dl_out)})

    cand = (terms.select("term", "doc_blob", "tf_blob", "dl_blob")
            .mapInPandas(fn, schema=CHAMPION_SCHEMA))
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy(F.desc("tf"),
                                           F.asc("doc_id"))
    return (cand.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n).drop("_r")
            .join(dfg, "term")
            .select("term", "df", "doc_id", "tf", "dl"))


def search_champions(champions: DataFrame, stats: dict, query: str,
                     k: int = 10, stem: bool = True,
                     camel: bool = True) -> DataFrame:
    """Approximate top-k BM25 over the champion relation ONLY — the
    serving half of :func:`build_champion_lists`. Scores are the exact
    BM25 contributions of the champion postings (idf from the stored
    global df, the usual k1=1.2 / b=0.75 contract), so a doc's score
    is exact iff all its matched postings are champions; docs whose
    postings were pruned score lower or drop — the documented
    approximation of the technique.

    Plan: PURE JVM codegen end to end (no Python, no blob decode at
    query time): term filter pushes to the champion scan (<= n rows
    per query term reach the aggregate), one groupBy(doc_id) partial
    sum, k-row TakeOrderedAndProject. The whole query touches
    |q| * n rows regardless of corpus size — that is the point.

    Scores are reported at 4-decimal precision and the cut orders by
    (rounded score desc, doc_id asc): a groupBy sum has no pinned
    addend order, so ranking raw floats would make the k-th row
    engine-dependent at the ulp level."""
    spark = champions.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive")
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    part = idf * tf / (tf + K1 * (1.0 - B + B * dl / F.lit(avgdl)))
    return (champions.filter(F.col("term").isin(qterms))
            .select("doc_id", part.alias("_p"))
            .groupBy("doc_id")
            .agg(F.round(F.sum("_p"), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def search_cjk(index: DataFrame, docs: DataFrame | None, stats: dict,
               query: str, k: int = 10, stem: bool = True,
               camel: bool = True, **kw) -> DataFrame:
    """Top-k BM25 over a mixed latin+CJK-bigram index
    (:func:`~index_spark.operators.build.build_cjk_index`): the query
    tokenizes with the SAME analyzer composition
    (:func:`~index_spark.functions.text.cjk_query_terms` — latin
    tokens plus CJK run bigrams), then delegates to :func:`search`
    via the pre-tokenized ``qterms`` hook.  All of search's knobs
    (mode/exclude/tombstones/restrict/boosts/after/...) pass through.
    """
    from index_spark.functions.text import cjk_query_terms

    return search(index, docs, stats, query, k=k, stem=stem,
                  camel=camel,
                  qterms=cjk_query_terms(query, stem=stem, camel=camel),
                  **kw)
