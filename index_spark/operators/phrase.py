"""Exact phrase search over a positions-carrying index.

The reference's core data model is *position* postings (each Post is a
position delta, /root/reference/index.h:215-224, index.cpp:181-185) —
the thing they exist for is phrase/proximity matching. Our index stores
per-document occurrence ordinals (pos_blob, built with
``build_index(..., positions=True)``; per-doc rather than chunk-global
so range shards stay independently mergeable, SURVEY.md §7).

Query semantics: a phrase of terms t0..tm-1 matches at document position
p iff t_i occurs at p+i for every i. Result = (doc_id, n_matches) for
docs with >= 1 match, ranked by n_matches desc, doc_id asc.

Distributed shape — identical to the BM25 path (operators/query.py):

  index.filter(term IN phrase_terms)     # term-pruned columnar scan
    -> groupBy('shard') -> per-shard position-intersection kernel
    -> orderBy(n_matches desc, doc_id asc).limit(k)   # TakeOrdered

One exchange of a few pruned rows; each shard kernel is vectorized
numpy: occurrences become sorted (doc, pos-i) int64 keys and the phrase
match set is an m-way sorted-array intersection — never a per-document
Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize

PHRASE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_matches", T.LongType(), False),
])


def decode_positions(tf_blob: bytes, pos_blob: bytes,
                     style_shift: int = 0) -> np.ndarray:
    """pos_blob (per-posting first-absolute deltas) -> flat absolute
    occurrence ordinals, segmented by the tf values (vectorized
    segmented cumsum). ``style_shift`` > 0 strips a styled index's
    packed style channel (``value = (gap << shift) | style``,
    functions/style.py) before the cumsum — positional semantics are
    then identical to an unstyled build."""
    tfs = vb.decode(tf_blob).astype(np.int64)
    deltas = vb.decode(pos_blob).astype(np.int64)
    if style_shift:
        deltas >>= style_shift
    if deltas.size != int(tfs.sum()):
        raise ValueError(
            "pos_blob length mismatch — was the index built with "
            "positions=True?")
    if deltas.size == 0:
        return deltas
    seg = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    c = np.cumsum(deltas)
    base = c[seg] - deltas[seg]
    return c - np.repeat(base, tfs)


def _term_occurrences(rows, style_shift: int = 0
                      ) -> tuple[np.ndarray, np.ndarray]:
    """One term's shard rows (>=1 disjoint doc sub-ranges) ->
    (doc per occurrence, position per occurrence), (doc, pos)-sorted."""
    rows = sorted(rows, key=lambda r: r.first_doc)
    doc_l, pos_l = [], []
    for r in rows:
        docs = np.cumsum(vb.decode(r.doc_blob).astype(np.int64))
        tfs = vb.decode(r.tf_blob).astype(np.int64)
        doc_l.append(np.repeat(docs, tfs))
        pos_l.append(decode_positions(r.tf_blob, r.pos_blob,
                                      style_shift=style_shift))
    return np.concatenate(doc_l), np.concatenate(pos_l)


def _phrase_shard(pdf: pd.DataFrame, qterms: list[str],
                  style_shift: int = 0,
                  max_start: int | None = None) -> pd.DataFrame:
    """Vectorized m-way phrase intersection over one shard's rows.
    ``max_start`` keeps only matches whose first-term ordinal is
    < max_start (the SpanFirst gate — applied on the intersected keys,
    whose position component IS the match start)."""
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "n_matches": np.empty(0, np.int64)})
    groups: dict[str, list] = {}
    for r in pdf.itertuples(index=False):
        groups.setdefault(r.term, []).append(r)
    if any(t not in groups for t in qterms):
        return empty  # a missing term in this doc range -> no match
    decoded = {t: _term_occurrences(rs, style_shift)
               for t, rs in groups.items()}

    # shard-local composite keys (doc - doc_min) * pos_cap + (pos - i):
    # fits int64 because the doc range is shard-bounded and positions are
    # bounded by the shard's max doc length
    doc_min = min(int(d.min()) for d, _ in decoded.values())
    pos_cap = max(int(p.max()) for _, p in decoded.values()) + len(qterms) + 2

    keys: np.ndarray | None = None
    for i, t in enumerate(qterms):
        docs, pos = decoded[t]
        adj = pos - i
        ok = adj >= 0
        k = (docs[ok] - doc_min) * pos_cap + adj[ok]
        keys = k if keys is None else np.intersect1d(keys, k,
                                                     assume_unique=True)
        if keys.size == 0:
            return empty
    if max_start is not None:
        keys = keys[keys % pos_cap < max_start]
        if keys.size == 0:
            return empty
    match_docs = keys // pos_cap + doc_min
    ud, cnt = np.unique(match_docs, return_counts=True)
    return pd.DataFrame({"doc_id": ud.astype(np.int64),
                         "n_matches": cnt.astype(np.int64)})


def _zone_pinned(index: DataFrame, zone: str | None) -> DataFrame:
    """Positions are per-zone streams: a zoned index must be pinned to
    ONE zone before position queries, or different zones' occurrences
    would be conflated. Delegates to :func:`query.pin_zone` so an
    absent/typo'd zone raises loudly (listing the available zones)
    instead of silently matching nothing. Also tolerates a merged
    (shard-less) index."""
    from index_spark.operators.query import pin_zone

    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    return index


def _local_positional_topk(index: DataFrame, hits: DataFrame, kernel,
                           k: int, tombstones: DataFrame | None,
                           shard_size: int) -> DataFrame:
    """Shared tail of phrase/proximity: per-shard kernel -> tombstone
    mask (BEFORE the local prune, so deletes can't under-fill k) ->
    local top-k -> distributed TakeOrderedAndProject. Tombstones ride
    the same shard-cogroup shape as ``query.search``."""
    def prune(out: pd.DataFrame) -> pd.DataFrame:
        if len(out) > k:  # local prune is exact: shards partition docs
            out = out.sort_values(["n_matches", "doc_id"],
                                  ascending=[False, True]).head(k)
        return out

    if tombstones is not None:
        merged_form = "shard" not in index.columns
        shard_expr = (F.lit(0).cast("long") if merged_form
                      else F.floor(F.col("doc_id") / shard_size)
                      .cast("long"))
        tomb = tombstones.select(shard_expr.alias("shard"),
                                 F.col("doc_id").cast("long"))

        def fn2(pdf: pd.DataFrame, tpdf: pd.DataFrame) -> pd.DataFrame:
            out = kernel(pdf)
            banned = tpdf["doc_id"].to_numpy(np.int64)
            if banned.size and len(out):
                out = out[~out["doc_id"].isin(banned)]
            return prune(out)

        local = hits.groupby("shard").cogroup(tomb.groupby("shard")) \
            .applyInPandas(fn2, schema=PHRASE_SCHEMA)
    else:
        local = hits.groupBy("shard").applyInPandas(
            lambda pdf: prune(kernel(pdf)), schema=PHRASE_SCHEMA)
    return local.orderBy(F.desc("n_matches"), F.asc("doc_id")).limit(k)


def phrase_search(index: DataFrame, stats: dict | None, phrase: str,
                  k: int = 10, stem: bool = True,
                  camel: bool = True, zone: str | None = None,
                  tombstones: DataFrame | None = None,
                  shard_size: int = 4096,
                  style_shift: int = 0) -> DataFrame:
    """Top-k exact-phrase matches: (doc_id, n_matches).

    ``stats`` is accepted for API symmetry with ``search`` and unused
    (phrase ranking is pure occurrence count). The query tokenizer must
    match the build's (same ``stem``/``camel``) or positions won't align.
    ``tombstones``/``shard_size``: logical deletes, dropped before the
    local top-k (see ``query.search``). ``style_shift``: pass the
    build's shift for a STYLED index (style_spans builds) — the packed
    style channel strips before positional intersection, so matches are
    identical to an unstyled build.
    """
    spark = index.sparkSession
    qterms = tokenize(phrase, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted(set(qterms))))
    return _local_positional_topk(
        index, hits, lambda pdf: _phrase_shard(pdf, qterms, style_shift),
        k, tombstones, shard_size)


def _sloppy_shard(pdf: pd.DataFrame, qterms: list[str],
                  gap: int, style_shift: int = 0) -> pd.DataFrame:
    """Ordered gap-bounded phrase over one shard: a match anchors at an
    occurrence p1 of the first term from which SOME chain p1 < p2 < …
    < pm exists with p_{j+1} - p_j <= gap (gap=1 ≡ exact phrase).

    Exact "exists a chain" (not greedy): viability propagates RIGHT to
    LEFT — an occurrence of term j is viable iff a viable occurrence of
    term j+1 sits in (p, p+gap], tested by one searchsorted over the
    next term's viable composite keys. n_matches = viable first-term
    occurrences per doc."""
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "n_matches": np.empty(0, np.int64)})
    groups: dict[str, list] = {}
    for r in pdf.itertuples(index=False):
        groups.setdefault(r.term, []).append(r)
    if any(t not in groups for t in qterms):
        return empty
    decoded = {t: _term_occurrences(rs, style_shift)
               for t, rs in groups.items()}
    doc_min = min(int(d.min()) for d, _ in decoded.values())
    pos_cap = max(int(p.max()) for _, p in decoded.values()) + gap + 2

    viable: np.ndarray | None = None  # composite keys of term j+1
    for t in reversed(qterms):
        docs, pos = decoded[t]
        keys = (docs - doc_min) * pos_cap + pos
        order = np.argsort(keys)
        keys = keys[order]
        if viable is not None:
            idx = np.searchsorted(viable, keys + 1)
            ok = idx < viable.size
            ok[ok] = viable[idx[ok]] <= keys[ok] + gap
            keys = keys[ok]
            if keys.size == 0:
                return empty
        viable = keys
    match_docs = viable // pos_cap + doc_min
    ud, cnt = np.unique(match_docs, return_counts=True)
    return pd.DataFrame({"doc_id": ud.astype(np.int64),
                         "n_matches": cnt.astype(np.int64)})


def sloppy_phrase_search(index: DataFrame, stats: dict | None,
                         phrase: str, gap: int = 2, k: int = 10,
                         stem: bool = True, camel: bool = True,
                         zone: str | None = None,
                         tombstones: DataFrame | None = None,
                         shard_size: int = 4096,
                         style_shift: int = 0) -> DataFrame:
    """Top-k ordered gap-bounded ("sloppy") phrase matches:
    (doc_id, n_matches). ``gap`` bounds each consecutive step
    (p_{j+1} - p_j <= gap); gap=1 reproduces :func:`phrase_search`
    exactly (pytest-pinned). Same one-exchange positional plan."""
    if gap < 1:
        raise ValueError("gap must be >= 1")
    spark = index.sparkSession
    qterms = tokenize(phrase, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted(set(qterms))))
    return _local_positional_topk(
        index, hits,
        lambda pdf: _sloppy_shard(pdf, qterms, gap, style_shift),
        k, tombstones, shard_size)


def _pair_window_counts(d0, p0, d1, p1, window: int):
    """Per-doc count of ordered position pairs with 0 < pos1 - pos0 <= W,
    fully vectorized (two searchsorted passes over the occurrence
    arrays). Inputs are (doc, pos) occurrence arrays sorted by (doc,
    pos)."""
    import numpy as np

    # restrict to docs present on both sides
    common = np.intersect1d(np.unique(d0), np.unique(d1))
    if common.size == 0:
        return common, common
    m0 = np.isin(d0, common)
    m1 = np.isin(d1, common)
    d0, p0 = d0[m0], p0[m0]
    d1, p1 = d1[m1], p1[m1]
    # composite keys keep windows from leaking across documents: space
    # positions so that doc boundaries are > W apart
    span = np.int64(max(int(p0.max()), int(p1.max())) + window + 2)
    k0 = d0 * span + p0
    k1 = d1 * span + p1
    lo = np.searchsorted(k0, k1 - window, side="left")
    hi = np.searchsorted(k0, k1 - 1, side="right")
    cnt = (hi - lo).astype(np.int64)
    ud, inv = np.unique(d1, return_inverse=True)
    per_doc = np.bincount(inv, weights=cnt).astype(np.int64)
    keep = per_doc > 0
    return ud[keep], per_doc[keep]


def proximity_search(index: DataFrame, stats: dict | None, term_a: str,
                     term_b: str, window: int = 5, k: int = 10,
                     stem: bool = True, camel: bool = True,
                     zone: str | None = None,
                     tombstones: DataFrame | None = None,
                     shard_size: int = 4096,
                     style_shift: int = 0,
                     ordered: bool = True) -> DataFrame:
    """Top-k within-window co-occurrence: (doc_id, n_matches) where
    n_matches counts ordered position pairs with ``0 < pos(term_b) -
    pos(term_a) <= window`` — the proximity generalization of phrase
    adjacency (window=1 over two terms == the phrase count). Same
    one-exchange plan shape as phrase_search; ``tombstones`` as there.

    ``ordered=False`` is Lucene ``SpanNearQuery(inOrder=false)``: each
    unordered pair with ``1 <= |pos diff| <= window`` counts once —
    computed as the two directed passes summed (their sign-disjoint
    windows cannot double-count a pair). For ``term_a == term_b`` the
    directed count already enumerates each unordered pair once, so the
    flag is a no-op there."""
    spark = index.sparkSession
    ta = tokenize(term_a, stem=stem, camel=camel)
    tb = tokenize(term_b, stem=stem, camel=camel)
    if not ta or not tb:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    ta, tb = ta[0], tb[0]
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted({ta, tb})))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        groups: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            groups.setdefault(r.term, []).append(r)
        if ta not in groups or tb not in groups:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "n_matches": np.empty(0, np.int64)})
        d0, p0 = _term_occurrences(groups[ta], style_shift)
        d1, p1 = _term_occurrences(groups[tb], style_shift)
        docs, cnt = _pair_window_counts(d0, p0, d1, p1, window)
        if not ordered and ta != tb:
            docs_r, cnt_r = _pair_window_counts(d1, p1, d0, p0, window)
            merged: dict[int, int] = {
                int(d): int(c) for d, c in zip(docs, cnt)}
            for d, c in zip(docs_r, cnt_r):
                merged[int(d)] = merged.get(int(d), 0) + int(c)
            ud = np.fromiter(sorted(merged), np.int64, count=len(merged))
            return pd.DataFrame({
                "doc_id": ud,
                "n_matches": np.fromiter((merged[int(d)] for d in ud),
                                         np.int64, count=ud.size)})
        return pd.DataFrame({"doc_id": docs, "n_matches": cnt})

    return _local_positional_topk(index, hits, kernel, k, tombstones,
                                  shard_size)


def span_first_search(index: DataFrame, stats: dict | None, phrase: str,
                      max_start: int = 10, k: int = 10,
                      stem: bool = True, camel: bool = True,
                      zone: str | None = None,
                      tombstones: DataFrame | None = None,
                      shard_size: int = 4096,
                      style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanFirstQuery``: top-k docs where the phrase (or a
    single term — a 1-term phrase) matches with its FIRST token at
    ordinal < ``max_start``; (doc_id, n_matches) counts only those
    early matches. The "term appears in the opening of the document"
    query — title-ish boosts on unzoned corpora, lead-paragraph
    filters.

    Same one-exchange positional plan as :func:`phrase_search`; the
    start gate is a vectorized mask on the intersected match keys
    inside the shard kernel (the key's position component is the match
    start), so pruning costs nothing extra."""
    if max_start < 1:
        raise ValueError("max_start must be >= 1")
    spark = index.sparkSession
    qterms = tokenize(phrase, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted(set(qterms))))
    return _local_positional_topk(
        index, hits,
        lambda pdf: _phrase_shard(pdf, qterms, style_shift,
                                  max_start=max_start),
        k, tombstones, shard_size)


def _phrase_prefix_shard(pdf: pd.DataFrame, fixed: list[str],
                         variants: list[str],
                         style_shift: int = 0) -> pd.DataFrame:
    """Phrase intersection where the LAST slot matches ANY of
    ``variants`` (the prefix expansions): fixed slots intersect exactly
    as in ``_phrase_shard``; the last slot's occurrence set is the
    union over variants present in this shard. Distinct variants are
    distinct terms, so their (doc, pos) occurrences are disjoint — the
    union stays duplicate-free and the m-way sorted intersection is
    unchanged."""
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "n_matches": np.empty(0, np.int64)})
    groups: dict[str, list] = {}
    for r in pdf.itertuples(index=False):
        groups.setdefault(r.term, []).append(r)
    if any(t not in groups for t in fixed):
        return empty
    present = [v for v in variants if v in groups]
    if not present:
        return empty
    decoded = {t: _term_occurrences(rs, style_shift)
               for t, rs in groups.items() if t in fixed or t in present}
    vdocs = np.concatenate([decoded[v][0] for v in present])
    vpos = np.concatenate([decoded[v][1] for v in present])

    doc_min = min(int(d.min()) for d, _ in decoded.values())
    m = len(fixed) + 1
    pos_cap = max(int(p.max()) for _, p in decoded.values()) + m + 2

    keys: np.ndarray | None = None
    for i, t in enumerate(fixed):
        docs, pos = decoded[t]
        adj = pos - i
        ok = adj >= 0
        k = (docs[ok] - doc_min) * pos_cap + adj[ok]
        keys = k if keys is None else np.intersect1d(keys, k,
                                                     assume_unique=True)
        if keys.size == 0:
            return empty
    last_i = len(fixed)
    adj = vpos - last_i
    ok = adj >= 0
    vk = (vdocs[ok] - doc_min) * pos_cap + adj[ok]
    vk.sort()
    keys = vk if keys is None else np.intersect1d(keys, vk,
                                                  assume_unique=True)
    if keys.size == 0:
        return empty
    match_docs = keys // pos_cap + doc_min
    ud, cnt = np.unique(match_docs, return_counts=True)
    return pd.DataFrame({"doc_id": ud.astype(np.int64),
                         "n_matches": cnt.astype(np.int64)})


def expand_prefix(index: DataFrame, prefix: str,
                  max_expansions: int = 50,
                  dictionary: DataFrame | None = None,
                  zone: str | None = None) -> list[str]:
    """The bounded prefix-expansion term set (Lucene order: ascending
    term, first ``max_expansions``). Prefers the compact ``dictionary``
    artifact (millions of rows, StartsWith row-group-pruned); falls
    back to distinct terms of the sharded index metadata (also sorted
    at rest, so StartsWith prunes there too). Driver-side result is
    bounded by max_expansions."""
    from index_spark.operators.query import pin_zone

    if not prefix:
        raise ValueError("empty prefix")
    src = dictionary if dictionary is not None else pin_zone(index, zone)
    rows = (src.filter(F.col("term").startswith(prefix))
            .select("term").distinct()
            .orderBy(F.asc("term")).limit(max_expansions).collect())
    return [r.term for r in rows]


def match_phrase_prefix(index: DataFrame, stats: dict | None,
                        phrase: str, k: int = 10,
                        max_expansions: int = 50, stem: bool = True,
                        camel: bool = True, zone: str | None = None,
                        dictionary: DataFrame | None = None,
                        tombstones: DataFrame | None = None,
                        shard_size: int = 4096,
                        style_shift: int = 0) -> DataFrame:
    """ES/Lucene ``match_phrase_prefix``: an exact phrase whose LAST
    analyzed token is a prefix — "data tab" matches "... data table ..."
    via the expansion set {terms starting with "tab"}, capped at
    ``max_expansions`` in ascending term order (the Lucene cap and
    order; a hot prefix silently matching the whole dictionary is the
    failure mode the cap exists for). Returns (doc_id, n_matches)
    ranked like ``phrase_search``.

    Plan: one bounded expansion lookup (dictionary-preferred,
    StartsWith-pruned) + the phrase kernel with the last slot as a term
    SET — still a single exchange of term-pruned rows, the expansions
    only widen the ``isin`` filter."""
    spark = index.sparkSession
    qterms = tokenize(phrase, stem=stem, camel=camel)
    if not qterms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    fixed, prefix = qterms[:-1], qterms[-1]
    variants = expand_prefix(index, prefix, max_expansions=max_expansions,
                             dictionary=dictionary, zone=zone)
    if not variants:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted(set(fixed) | set(variants))))
    return _local_positional_topk(
        index, hits,
        lambda pdf: _phrase_prefix_shard(pdf, fixed, variants, style_shift),
        k, tombstones, shard_size)


def _span_not_shard(pdf: pd.DataFrame, inc_terms: list[str],
                    exc_terms: list[str], pre: int, post: int,
                    style_shift: int = 0) -> pd.DataFrame:
    """Vectorized SpanNot over one shard's rows: include-phrase
    occurrences (the ``_phrase_shard`` m-way intersection) survive iff
    NO exclude-term occurrence lies within [start - pre,
    start + m - 1 + post].  The exclusion test is two searchsorteds
    over the exclude occurrences in the same composite key space — no
    per-match loop."""
    empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                          "n_matches": np.empty(0, np.int64)})
    groups: dict[str, list] = {}
    for r in pdf.itertuples(index=False):
        groups.setdefault(r.term, []).append(r)
    if any(t not in groups for t in inc_terms):
        return empty
    present_exc = [t for t in exc_terms if t in groups]
    decoded = {t: _term_occurrences(rs, style_shift)
               for t, rs in groups.items()
               if t in inc_terms or t in present_exc}

    m = len(inc_terms)
    doc_min = min(int(d.min()) for d, _ in decoded.values())
    # headroom covers the match footprint AND the post window so an
    # exclusion probe key can never spill into the next doc's block
    pos_cap = (max(int(p.max()) for _, p in decoded.values())
               + m + post + 2)

    keys: np.ndarray | None = None
    for i, t in enumerate(inc_terms):
        docs, pos = decoded[t]
        adj = pos - i
        ok = adj >= 0
        kk = (docs[ok] - doc_min) * pos_cap + adj[ok]
        keys = kk if keys is None else np.intersect1d(kk, keys,
                                                      assume_unique=True)
        if keys.size == 0:
            return empty
    if present_exc:
        ek = np.concatenate([
            (decoded[t][0] - doc_min) * pos_cap + decoded[t][1]
            for t in present_exc])
        ek.sort()
        s = keys % pos_cap
        d = keys // pos_cap
        lo = d * pos_cap + np.maximum(s - pre, 0)
        hi = d * pos_cap + np.minimum(s + m - 1 + post, pos_cap - 1)
        has_exc = (np.searchsorted(ek, lo, side="left")
                   < np.searchsorted(ek, hi, side="right"))
        keys = keys[~has_exc]
        if keys.size == 0:
            return empty
    match_docs = keys // pos_cap + doc_min
    ud, cnt = np.unique(match_docs, return_counts=True)
    return pd.DataFrame({"doc_id": ud.astype(np.int64),
                         "n_matches": cnt.astype(np.int64)})


def span_not_search(index: DataFrame, stats: dict | None, include: str,
                    exclude: str, pre: int = 0, post: int = 0,
                    k: int = 10, stem: bool = True, camel: bool = True,
                    zone: str | None = None,
                    tombstones: DataFrame | None = None,
                    shard_size: int = 4096,
                    style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanNotQuery``: top-k docs by count of INCLUDE-phrase
    occurrences that do NOT have an EXCLUDE-term occurrence nearby —
    within ``pre`` positions before the match start or ``post``
    positions after the match end (pre = post = 0 is pure overlap,
    impossible for disjoint terms, so callers normally pass a
    tolerance).  "data table, but not when 'query' is within 3 tokens"
    — negative context filtering that plain ``exclude=`` (whole-doc
    NOT) can't express.  A doc with n include matches and one poisoned
    match still scores n−1.

    Same one-exchange positional plan as :func:`phrase_search`; the
    exclude terms only widen the term-pruned ``isin`` scan, and the
    not-gate is two vectorized searchsorteds inside the shard kernel."""
    if pre < 0 or post < 0:
        raise ValueError("pre and post must be >= 0")
    spark = index.sparkSession
    inc_terms = tokenize(include, stem=stem, camel=camel)
    exc_terms = sorted(set(tokenize(exclude, stem=stem, camel=camel)))
    if not inc_terms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    if not exc_terms:
        raise ValueError("span_not needs a non-empty exclude clause — "
                         "use phrase_search for the bare include")
    hits = _zone_pinned(index, zone)
    hits = hits.filter(
        F.col("term").isin(sorted(set(inc_terms) | set(exc_terms))))
    return _local_positional_topk(
        index, hits,
        lambda pdf: _span_not_shard(pdf, inc_terms, exc_terms, pre, post,
                                    style_shift),
        k, tombstones, shard_size)


def intervals_search(index: DataFrame, stats: dict | None, query: str,
                     max_gaps: int = 0, k: int = 10, stem: bool = True,
                     camel: bool = True, zone: str | None = None,
                     tombstones: DataFrame | None = None,
                     shard_size: int = 4096,
                     style_shift: int = 0) -> DataFrame:
    """ES ``intervals`` query, ordered ``match`` rule: the analyzed
    terms must appear IN ORDER with at most ``max_gaps`` total
    non-query tokens between the first and the last (max_gaps=0 is the
    exact phrase; the phrase kernel stays the fast path for that).
    Returns (doc_id, n_matches) where n_matches counts first-term
    occurrences that BEGIN a valid ordered chain — the greedy
    minimal-chain convention: from each start, each subsequent term
    takes its EARLIEST occurrence after the previous link, which is
    optimal for chain existence (any valid chain implies the greedy
    one fits), so the count is exactly "starts with a match", a
    deterministic engine-restatable pinning of Lucene's
    minimal-interval semantics.

    Same one-exchange positional plan as :func:`phrase_search`; the
    chain walk is one vectorized searchsorted per query term over the
    shard's occurrence arrays — no per-start loop."""
    if max_gaps < 0:
        raise ValueError(f"max_gaps must be >= 0, got {max_gaps}")
    spark = index.sparkSession
    qterms = tokenize(query, stem=stem, camel=camel)
    if len(qterms) < 2:
        raise ValueError("intervals needs >= 2 analyzed terms — use "
                         "search for a single term")
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted(set(qterms))))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "n_matches": np.empty(0, np.int64)})
        groups: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            groups.setdefault(r.term, []).append(r)
        if any(t not in groups for t in qterms):
            return empty
        decoded = {t: _term_occurrences(rs, style_shift)
                   for t, rs in groups.items()}
        m = len(qterms)
        doc_min = min(int(d.min()) for d, _ in decoded.values())
        pos_cap = (max(int(p.max()) for _, p in decoded.values())
                   + max_gaps + m + 2)
        keyed = {}
        for t in set(qterms):
            docs, pos = decoded[t]
            kk = (docs - doc_min) * pos_cap + pos
            kk.sort()
            keyed[t] = kk
        start = keyed[qterms[0]]
        cur = start
        for t in qterms[1:]:
            kt = keyed[t]
            idx = np.searchsorted(kt, cur, side="right")
            ok = idx < kt.size
            nxt = kt[np.minimum(idx, kt.size - 1)]
            # the next link must stay inside the same doc block
            ok &= (nxt // pos_cap) == (cur // pos_cap)
            start, cur = start[ok], nxt[ok]
            if start.size == 0:
                return empty
        ok = (cur - start) - (m - 1) <= max_gaps
        start = start[ok]
        if start.size == 0:
            return empty
        match_docs = start // pos_cap + doc_min
        ud, cnt = np.unique(match_docs, return_counts=True)
        return pd.DataFrame({"doc_id": ud.astype(np.int64),
                             "n_matches": cnt.astype(np.int64)})

    return _local_positional_topk(index, hits, kernel, k, tombstones,
                                  shard_size)


def _clause_match_keys(decoded: dict, clause: list[str],
                       pos_cap: int, doc_min: int) -> np.ndarray:
    """One span_or clause's match-start composite keys: a 1-term
    clause's occurrences, or the m-way phrase intersection (the
    ``_phrase_shard`` key walk) for multi-term clauses.  Empty array
    when any clause term is absent from this shard."""
    if any(t not in decoded for t in clause):
        return np.empty(0, np.int64)
    keys: np.ndarray | None = None
    for i, t in enumerate(clause):
        docs, pos = decoded[t]
        adj = pos - i
        ok = adj >= 0
        kk = (docs[ok] - doc_min) * pos_cap + adj[ok]
        kk.sort()
        keys = kk if keys is None else np.intersect1d(keys, kk,
                                                      assume_unique=True)
        if keys.size == 0:
            break
    return keys


def span_or_search(index: DataFrame, stats: dict | None,
                   clauses: list[str], k: int = 10, stem: bool = True,
                   camel: bool = True, zone: str | None = None,
                   tombstones: DataFrame | None = None,
                   shard_size: int = 4096,
                   style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanOrQuery``: the union of span clauses — each clause
    a term or an exact phrase — ranked by total match count
    (doc_id, n_matches = Σ per-clause matches).  Distinct clauses
    starting at the same position both count (the Lucene union keeps
    them; phrase starts are distinct positions within a clause by
    construction).

    One exchange: all clauses' terms share a single term-pruned
    ``isin`` scan and each shard decodes every term once — c clauses
    cost one pass, not c."""
    spark = index.sparkSession
    qclauses = [tokenize(c, stem=stem, camel=camel) for c in clauses]
    qclauses = [c for c in qclauses if c]
    if not qclauses:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    all_terms = sorted({t for c in qclauses for t in c})
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(all_terms))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "n_matches": np.empty(0, np.int64)})
        groups: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            groups.setdefault(r.term, []).append(r)
        decoded = {t: _term_occurrences(rs, style_shift)
                   for t, rs in groups.items()}
        if not decoded:
            return empty
        mmax = max(len(c) for c in qclauses)
        doc_min = min(int(d.min()) for d, _ in decoded.values())
        pos_cap = (max(int(p.max()) for _, p in decoded.values())
                   + mmax + 2)
        per_doc: dict[int, int] = {}
        for clause in qclauses:
            keys = _clause_match_keys(decoded, clause, pos_cap, doc_min)
            if keys.size == 0:
                continue
            docs = keys // pos_cap + doc_min
            ud, cnt = np.unique(docs, return_counts=True)
            for d, c in zip(ud, cnt):
                per_doc[int(d)] = per_doc.get(int(d), 0) + int(c)
        if not per_doc:
            return empty
        ud = np.fromiter(sorted(per_doc), np.int64, count=len(per_doc))
        return pd.DataFrame({
            "doc_id": ud,
            "n_matches": np.fromiter((per_doc[int(d)] for d in ud),
                                     np.int64, count=ud.size)})

    return _local_positional_topk(index, hits, kernel, k, tombstones,
                                  shard_size)


def _near_pair_spans(ka: np.ndarray, kb: np.ndarray, slop: int,
                     pos_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """All unordered near-pair spans between two DISTINCT terms'
    composite-key occurrence arrays: pairs with ``1 <= |pos diff| <=
    slop`` in the same doc block, returned as (start_key, end_key)
    arrays.  Vectorized: per b-occurrence the a-window resolves with
    two searchsorteds, then one repeat/arange expansion."""
    lo_i = np.searchsorted(ka, kb - slop, side="left")
    hi_i = np.searchsorted(ka, kb + slop, side="right")
    cnt = hi_i - lo_i
    keep = cnt > 0
    if not keep.any():
        e = np.empty(0, np.int64)
        return e, e
    kb_k, lo_k, cnt_k = kb[keep], lo_i[keep], cnt[keep]
    # grouped arange: indices of each b's matching a-occurrences
    total = int(cnt_k.sum())
    offs = np.concatenate(([0], np.cumsum(cnt_k)[:-1]))
    idx = np.arange(total) - np.repeat(offs, cnt_k) + np.repeat(lo_k,
                                                                cnt_k)
    a_k = ka[idx]
    b_k = np.repeat(kb_k, cnt_k)
    # same doc block only (the slop window can cross block edges)
    ok = (a_k // pos_cap) == (b_k // pos_cap)
    a_k, b_k = a_k[ok], b_k[ok]
    return np.minimum(a_k, b_k), np.maximum(a_k, b_k)


def _span_pair_gate(index: DataFrame, term_a: str, term_b: str,
                    little: str, slop: int, k: int, stem: bool,
                    camel: bool, zone: str | None,
                    tombstones: DataFrame | None, shard_size: int,
                    style_shift: int, mode: str) -> DataFrame:
    """Shared kernel for span_containing / span_within over a
    near-pair big span: enumerate unordered (term_a, term_b) pairs
    within ``slop``, then gate on the little term's occurrences —
    ``mode='containing'`` counts BIG spans holding >= 1 little
    occurrence (endpoints inclusive); ``mode='within'`` counts LITTLE
    occurrences covered by >= 1 big span (each little occurrence
    counts once however many spans cover it)."""
    spark = index.sparkSession
    ta = tokenize(term_a, stem=stem, camel=camel)
    tb = tokenize(term_b, stem=stem, camel=camel)
    tl = tokenize(little, stem=stem, camel=camel)
    if not (len(ta) == len(tb) == len(tl) == 1):
        raise ValueError("span big/little clauses must each analyze "
                         "to exactly one term")
    ta, tb, tl = ta[0], tb[0], tl[0]
    if ta == tb:
        raise ValueError("the near-pair terms must be distinct")
    if slop < 1:
        raise ValueError(f"slop must be >= 1, got {slop}")
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(sorted({ta, tb, tl})))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "n_matches": np.empty(0, np.int64)})
        groups: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            groups.setdefault(r.term, []).append(r)
        if any(t not in groups for t in (ta, tb, tl)):
            return empty
        decoded = {t: _term_occurrences(rs, style_shift)
                   for t, rs in groups.items()}
        doc_min = min(int(d.min()) for d, _ in decoded.values())
        pos_cap = (max(int(p.max()) for _, p in decoded.values())
                   + slop + 2)

        def keyed(t: str) -> np.ndarray:
            docs, pos = decoded[t]
            kk = (docs - doc_min) * pos_cap + pos
            kk.sort()
            return kk

        ka, kb, kl = keyed(ta), keyed(tb), keyed(tl)
        s, e = _near_pair_spans(ka, kb, slop, pos_cap)
        if s.size == 0:
            return empty
        if mode == "containing":
            has = (np.searchsorted(kl, s, side="left")
                   < np.searchsorted(kl, e, side="right"))
            kept = s[has]
            if kept.size == 0:
                return empty
            match_docs = kept // pos_cap + doc_min
        else:  # within: little occurrences covered by >= 1 span
            order = np.argsort(s, kind="stable")
            s_sorted, e_sorted = s[order], e[order]
            reach = np.maximum.accumulate(e_sorted)
            j = np.searchsorted(s_sorted, kl, side="right") - 1
            covered = (j >= 0) & (reach[np.maximum(j, 0)] >= kl)
            kept = kl[covered]
            if kept.size == 0:
                return empty
            match_docs = kept // pos_cap + doc_min
        ud, cnt = np.unique(match_docs, return_counts=True)
        return pd.DataFrame({"doc_id": ud.astype(np.int64),
                             "n_matches": cnt.astype(np.int64)})

    return _local_positional_topk(index, hits, kernel, k, tombstones,
                                  shard_size)


def span_containing_search(index: DataFrame, stats: dict | None,
                           term_a: str, term_b: str, little: str,
                           slop: int = 5, k: int = 10,
                           stem: bool = True, camel: bool = True,
                           zone: str | None = None,
                           tombstones: DataFrame | None = None,
                           shard_size: int = 4096,
                           style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanContainingQuery``: BIG spans — unordered
    (term_a, term_b) near-pairs within ``slop`` — that CONTAIN at
    least one occurrence of ``little`` (endpoints inclusive).
    (doc_id, n_matches) counts qualifying big spans.  "data near
    table, with query mentioned inside the window" — context-anchored
    co-occurrence that plain proximity can't express.

    One exchange of the three terms' term-pruned rows; pair
    enumeration is slop-bounded (≤ 2·slop pairs per occurrence), and
    the containment gate is two searchsorteds."""
    return _span_pair_gate(index, term_a, term_b, little, slop, k, stem,
                           camel, zone, tombstones, shard_size,
                           style_shift, "containing")


def span_within_search(index: DataFrame, stats: dict | None,
                       little: str, term_a: str, term_b: str,
                       slop: int = 5, k: int = 10, stem: bool = True,
                       camel: bool = True, zone: str | None = None,
                       tombstones: DataFrame | None = None,
                       shard_size: int = 4096,
                       style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanWithinQuery``: LITTLE spans (occurrences of
    ``little``) that sit inside at least one BIG span — an unordered
    (term_a, term_b) near-pair within ``slop``.  The dual of
    :func:`span_containing_search`: n_matches counts little
    occurrences (each once, however many big spans cover it), so a doc
    where 'query' appears 3× inside data∼table windows scores 3.

    The coverage test is interval stabbing without a join: spans
    sorted by start, running max of ends, one searchsorted per little
    occurrence — O((pairs + little) log pairs) per shard."""
    return _span_pair_gate(index, term_a, term_b, little, slop, k, stem,
                           camel, zone, tombstones, shard_size,
                           style_shift, "within")


# --------------------------------------------------------------------------
# ES `index_phrases`: index-time bigram shingles so 2-token phrase
# queries become single-term lookups (no positional intersection at all)
# --------------------------------------------------------------------------

_FNV64_OFFSET = 14695981039346656037
_FNV64_PRIME = 1099511628211


def phrase_term(a: str, b: str) -> str:
    """The shingle term for an adjacent token pair: FNV-1a 64 of
    ``a + '\\x00' + b`` as 16 lowercase hex chars — a pure [a-z0-9]+
    token, so it flows through the standard analyzer unchanged.  A
    64-bit space makes cross-pair collisions negligible (~n²/2⁶⁵), and
    a collision only ever ADDS a candidate, mirroring ES's acceptance
    of analyzer-level shingle collisions."""
    h = _FNV64_OFFSET
    for byte in (a + "\x00" + b).encode():
        h = (h ^ byte) * _FNV64_PRIME % (1 << 64)
    return format(h, "016x")


def shingle_corpus(corpus: DataFrame, text_col: str = "content",
                   stem: bool = False, camel: bool = False) -> DataFrame:
    """ES ``index_phrases: true`` build-side transform: replace each
    document's text with the space-joined shingle terms of its adjacent
    analyzed-token pairs, ready for a NORMAL :func:`~index_spark.
    operators.build.build_index` run (no positions needed) — the
    resulting index maps each bigram to a posting list whose tf IS the
    per-doc adjacent-pair count.

    Arrow-batched mapInPandas, one pass; the downstream build is
    unchanged, so the shingle index shares every lifecycle feature
    (merge, compaction, serving tables) with the primary index."""
    from index_spark.functions.text import tokenize as tok

    schema = corpus.schema

    def fn(batches):
        for pdf in batches:
            shingled = []
            for txt in pdf[text_col]:
                toks = tok(txt or "", stem=stem, camel=camel)
                shingled.append(" ".join(
                    phrase_term(a, b) for a, b in zip(toks, toks[1:])))
            pdf = pdf.copy()
            pdf[text_col] = shingled
            yield pdf

    return corpus.mapInPandas(fn, schema)


def indexed_phrase_search(index: DataFrame, stats: dict | None,
                          phrase: str, k: int = 10, stem: bool = False,
                          camel: bool = False,
                          shard_size: int = 4096) -> DataFrame:
    """Query side of ES ``index_phrases``: a 2-token phrase against a
    :func:`shingle_corpus`-built index is ONE term lookup — the
    shingle term's tf is exactly the adjacent-pair count, so
    (doc_id, n_matches) matches :func:`phrase_search` on a positional
    index with no position decode, no intersection, and a term-pruned
    scan of a single posting list.  This is the ES fast path and, like
    ES, it only accelerates bigrams — longer phrases raise (run them
    against the positional index).

    Plan: one ``isin`` posting-list read + an Arrow batch decode of
    (doc deltas, tfs) + the k-row TakeOrdered."""
    from index_spark.functions.text import tokenize as tok

    spark = index.sparkSession
    qterms = tok(phrase, stem=stem, camel=camel)
    if len(qterms) != 2:
        raise ValueError("index_phrases accelerates exactly 2-token "
                         "phrases; use phrase_search for others")
    t = phrase_term(qterms[0], qterms[1])
    hits = index.filter(F.col("term") == t) \
        .select("doc_blob", "tf_blob")

    def fn(batches):
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(r.doc_blob).astype(np.int64))
                tfs = vb.decode(r.tf_blob).astype(np.int64)
                yield pd.DataFrame({"doc_id": docs, "n_matches": tfs})

    out = hits.mapInPandas(fn, PHRASE_SCHEMA)
    return out.orderBy(F.desc("n_matches"), F.asc("doc_id")).limit(k)


def multi_phrase_search(index: DataFrame, stats: dict | None,
                        slots: list[list[str] | str], k: int = 10,
                        stem: bool = True, camel: bool = True,
                        zone: str | None = None,
                        tombstones: DataFrame | None = None,
                        shard_size: int = 4096,
                        style_shift: int = 0,
                        pre_analyzed: bool = False) -> DataFrame:
    """Lucene ``MultiPhraseQuery`` (the synonym-graph phrase): an exact
    phrase where EACH slot matches any of its alternative terms —
    ``[["data"], ["table", "index"]]`` matches "data table" and
    "data index" occurrences alike; (doc_id, n_matches) counts all
    combined starts.  Per-slot alternatives are distinct terms, so
    their occurrence sets are disjoint and the m-way sorted
    intersection is unchanged (the ``match_phrase_prefix`` argument,
    generalized to every slot).

    One exchange: all slots' terms share a single term-pruned ``isin``
    scan; a slot whose alternatives are all absent from a doc range
    ends that range's intersection immediately.

    ``pre_analyzed=True`` takes slot alternatives as INDEX terms
    verbatim (no analyzer pass) — the contract multi-term rewrites
    need: :func:`span_multi_search` expands a pattern against the term
    catalog, whose entries are already analyzed, and re-analyzing a
    stemmed term can double-stem it."""
    spark = index.sparkSession
    qslots: list[list[str]] = []
    for s in slots:
        alts = [s] if isinstance(s, str) else list(s)
        terms: list[str] = []
        for a in alts:
            if pre_analyzed:
                if not a or " " in a:
                    raise ValueError(f"pre-analyzed alternative {a!r} "
                                     "must be one non-empty term")
                terms.append(a)
                continue
            toks = tokenize(a, stem=stem, camel=camel)
            if len(toks) != 1:
                raise ValueError(f"slot alternative {a!r} must analyze "
                                 "to exactly one term")
            terms.append(toks[0])
        if not terms:
            raise ValueError("empty slot")
        qslots.append(sorted(set(terms)))
    if len(qslots) < 2:
        raise ValueError("multi_phrase needs >= 2 slots — a 1-slot "
                         "query is a plain term/terms query")
    all_terms = sorted({t for s in qslots for t in s})
    hits = _zone_pinned(index, zone)
    hits = hits.filter(F.col("term").isin(all_terms))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64),
                              "n_matches": np.empty(0, np.int64)})
        groups: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            groups.setdefault(r.term, []).append(r)
        if any(all(t not in groups for t in s) for s in qslots):
            return empty
        decoded = {t: _term_occurrences(rs, style_shift)
                   for t, rs in groups.items()}
        m = len(qslots)
        doc_min = min(int(d.min()) for d, _ in decoded.values())
        pos_cap = (max(int(p.max()) for _, p in decoded.values())
                   + m + 2)
        keys: np.ndarray | None = None
        for i, slot in enumerate(qslots):
            present = [t for t in slot if t in decoded]
            docs = np.concatenate([decoded[t][0] for t in present])
            pos = np.concatenate([decoded[t][1] for t in present])
            adj = pos - i
            ok = adj >= 0
            kk = (docs[ok] - doc_min) * pos_cap + adj[ok]
            kk.sort()
            keys = kk if keys is None else np.intersect1d(
                keys, kk, assume_unique=True)
            if keys.size == 0:
                return empty
        match_docs = keys // pos_cap + doc_min
        ud, cnt = np.unique(match_docs, return_counts=True)
        return pd.DataFrame({"doc_id": ud.astype(np.int64),
                             "n_matches": cnt.astype(np.int64)})

    return _local_positional_topk(index, hits, kernel, k, tombstones,
                                  shard_size)


def expand_prefix_terms(index: DataFrame | None, prefix: str,
                        max_expansions: int = 50,
                        zone: str | None = None,
                        dictionary: DataFrame | None = None) -> list[str]:
    """Multi-term rewrite expansion: the ``max_expansions``
    highest-docFreq index terms starting with ``prefix`` (df desc,
    term asc — Lucene's ``TopTermsSpanBooleanQueryRewrite`` order,
    ties pinned).  Prefers the compact term catalog published by
    compaction (``plans/dictionary.py``) — a pruned ``StartsWith``
    scan of millions of rows; falls back to a map-side-combinable
    aggregate over the index term metadata (blobs never read).  The
    result is bounded by ``max_expansions``, so the driver list is as
    small as any query's term set."""
    from index_spark.operators.build import DOC_MARKER

    if dictionary is not None:
        from index_spark.operators.query import pin_zone

        cat = (pin_zone(dictionary, zone)
               .filter(F.col("term").startswith(prefix))
               .select("term", "df"))
    else:
        if index is None:
            raise ValueError("need an index or a dictionary to expand")
        cat = (_zone_pinned(index, zone)
               .filter(F.col("term").startswith(prefix)
                       & (F.col("term") != DOC_MARKER))
               .groupBy("term").agg(F.sum("df").alias("df")))
    rows = (cat.orderBy(F.desc("df"), F.asc("term"))
            .limit(int(max_expansions)).collect())
    return sorted(r["term"] for r in rows)


def span_multi_search(index: DataFrame, stats: dict | None,
                      slots: list, k: int = 10, stem: bool = True,
                      camel: bool = True, zone: str | None = None,
                      max_expansions: int = 50,
                      tombstones: DataFrame | None = None,
                      shard_size: int = 4096,
                      dictionary: DataFrame | None = None,
                      style_shift: int = 0) -> DataFrame:
    """Lucene ``SpanMultiTermQueryWrapper`` inside an ordered
    adjacent span (the general ``match_phrase_prefix``): a phrase
    where any slot may be a multi-term pattern —
    ``["data", {"prefix": "tab"}]`` matches "data table", "data tabs",
    … for every catalog term under the prefix.  Each pattern slot
    rewrites to its top-``max_expansions`` expansion
    (:func:`expand_prefix_terms`, df-desc Lucene order) and the whole
    query evaluates as ONE :func:`multi_phrase_search` — a single
    term-pruned scan and one positional intersection, not one query
    per expanded term.

    Literal slots (strings / lists of strings) pass through the
    analyzer as usual; expanded terms are already index terms and
    bypass it (``pre_analyzed`` contract).  A pattern with zero
    catalog expansions matches nothing (Lucene's empty-rewrite
    behavior)."""
    spark = index.sparkSession
    qslots: list[list[str]] = []
    for s in slots:
        if isinstance(s, dict):
            if set(s) != {"prefix"}:
                raise ValueError(f"unsupported pattern slot {s!r} — "
                                 "only {'prefix': ...} is defined")
            exp = expand_prefix_terms(index, str(s["prefix"]),
                                      max_expansions=max_expansions,
                                      zone=zone, dictionary=dictionary)
            if not exp:
                return spark.createDataFrame(
                    [], T.StructType([
                        T.StructField("doc_id", T.LongType()),
                        T.StructField("n_matches", T.LongType())]))
            qslots.append(exp)
            continue
        alts = [s] if isinstance(s, str) else list(s)
        terms: list[str] = []
        for a in alts:
            toks = tokenize(a, stem=stem, camel=camel)
            if len(toks) != 1:
                raise ValueError(f"slot alternative {a!r} must analyze "
                                 "to exactly one term")
            terms.append(toks[0])
        qslots.append(sorted(set(terms)))
    return multi_phrase_search(index, stats, qslots, k=k, zone=zone,
                               tombstones=tombstones,
                               shard_size=shard_size,
                               style_shift=style_shift,
                               pre_analyzed=True)
