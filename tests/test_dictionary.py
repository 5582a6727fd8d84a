"""Compact term-dictionary artifact (plans/dictionary.py): published at
compaction, consumed by the fuzzy/spell/complete/prefix family so those
paths never scan the sharded index's term column per query.

The "never touches the index" property is asserted structurally:
``index=None`` is passed — any code path reaching for the index would
raise — and the catalog-backed results are value-identical to the
index-derived fallback.
"""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import DOC_MARKER, build_index
from index_spark.operators.query import (
    complete_terms,
    fuzzy_expand,
    search_fuzzy,
    suggest_corrections,
    term_prefix_stats,
)
from index_spark.plans.checkpoint import build_chunked, compact_index
from index_spark.plans.dictionary import (
    dictionary_from_index,
    load_dictionary,
)

SHARD = 64


@pytest.fixture(scope="module")
def store(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dictstore") / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=512)
    return out


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    docs, index, stats = build_index(
        spark.createDataFrame(tiny_corpus), stem=True, shard_size=SHARD)
    index = index.persist()
    index.count()
    return docs.persist(), index, stats


def test_compaction_publishes_dictionary(spark, store, built):
    """compact_index writes <store>/dictionary: one row per term, global
    df/cf sums matching an independent aggregate over the sharded index."""
    _, index, _ = built
    d = load_dictionary(spark, store).persist()
    assert set(d.columns) == {"term", "df", "cf", "n_segs",
                              "length", "pkey", "rterm"}
    # term-distinct, no doc marker
    assert d.count() == d.select("term").distinct().count()
    assert d.filter(F.col("term") == DOC_MARKER).count() == 0
    # global sums match the index-derived catalog exactly
    expect = {(r["term"], r["df"], r["cf"]) for r in
              dictionary_from_index(index)
              .select("term", "df", "cf").collect()}
    got = {(r["term"], r["df"], r["cf"]) for r in
           d.select("term", "df", "cf").collect()}
    assert got == expect
    # stored length column is consistent (the fuzzy band prune key)
    assert d.filter(F.length("term") != F.col("length")).count() == 0
    d.unpersist()


def test_dictionary_sorted_at_rest_and_pruned_scan(spark, store):
    """The artifact is range-partitioned + sorted by term, and a prefix
    scan pushes StartsWith into the parquet scan (row-group pruning)."""
    import pandas as pd

    d = load_dictionary(spark, store)
    # sorted at rest: within every parquet partition file, terms ascend
    part = (d.withColumn("_f", F.input_file_name())
            .select("_f", "term").toPandas())
    for _, g in part.groupby("_f"):
        t = g["term"].tolist()
        assert t == sorted(t)
    del pd
    plan = (d.filter(F.col("term").startswith("im"))
            .select("term", "df")._jdf.queryExecution().executedPlan()
            .toString())
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_prefix_and_complete_match_index_fallback(spark, store, built):
    _, index, _ = built
    d = load_dictionary(spark, store)
    for prefix in ["im", "re", "s", "zz"]:
        a = term_prefix_stats(None, prefix, limit=20,
                              dictionary=d).collect()
        b = term_prefix_stats(index, prefix, limit=20).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], prefix
        a = complete_terms(None, prefix, limit=10, dictionary=d).collect()
        b = complete_terms(index, prefix, limit=10).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], prefix


def test_fuzzy_and_spell_match_index_fallback(spark, store, built):
    _, index, _ = built
    d = load_dictionary(spark, store)
    for qs in [["imort"], ["retur", "clas"], ["import"], ["zzzzzzz"]]:
        assert fuzzy_expand(None, qs, dictionary=d) == \
               fuzzy_expand(index, qs), qs
    for q in ["import imort", "import return", "retur clas"]:
        a = suggest_corrections(None, q, dictionary=d).collect()
        b = suggest_corrections(index, q).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], q


def test_search_fuzzy_with_dictionary_rank_identity(spark, store, built):
    """search_fuzzy(dictionary=...) expands via the catalog but scores
    against the index — results identical to the index-expanded path."""
    docs, index, stats = built
    d = load_dictionary(spark, store)
    for q, mode in [("imort retur", "or"), ("imort retur", "and")]:
        a = search_fuzzy(index, docs, stats, q, k=10, mode=mode,
                         shard_size=SHARD, dictionary=d).collect()
        b = search_fuzzy(index, docs, stats, q, k=10, mode=mode,
                         shard_size=SHARD).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
               [(r["doc_id"], r["score"]) for r in b], (q, mode)


def test_wildcard_expand_prunes_dictionary_scan(spark, store, built):
    """A non-leading wildcard pushes its literal prefix as StartsWith
    into the dictionary parquet scan (row-group pruning against the
    term-sorted artifact); results match the index fallback."""
    from index_spark.operators.query import wildcard_expand

    _, index, _ = built
    d = load_dictionary(spark, store)
    for pats in (["im*"], ["re?urn"], ["s*", "zz*"]):
        a = wildcard_expand(None, pats, dictionary=d)
        b = wildcard_expand(index, pats)
        assert a == b
    plan = (d.filter(F.col("term").startswith("im")
                     & F.col("term").like("im%"))
            .select("term")._jdf.queryExecution().executedPlan().toString())
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_regex_expand_prunes_dictionary_scan(spark, store, built):
    """Anchored regex expansion against the catalog matches the index
    fallback (incl. a leading-metachar pattern that cannot push a
    prefix); the quantifier-aware literal prefix reaches PushedFilters."""
    from index_spark.operators.query import search  # noqa: F401
    from index_spark.operators.query import regex_expand

    _, index, _ = built
    d = load_dictionary(spark, store)
    for pats in (["im.*"], ["re?urn"], ["import(s|ed)?", ".*s"],
                 ["x{40}"]):
        a = regex_expand(None, pats, dictionary=d)
        b = regex_expand(index, pats)
        assert a == b, pats
    plan = (d.filter(F.col("term").startswith("im")
                     & F.col("term").rlike("^(?:im.*)$"))
            .select("term")._jdf.queryExecution().executedPlan().toString())
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_reversed_dictionary_suffix_pruning_and_identity(spark, store,
                                                         built):
    """Leading-wildcard suffix patterns route to the rterm-sorted
    companion projection: results identical to the index fallback and
    the plain-catalog scan; the reversed suffix reaches PushedFilters
    as a StartsWith on the stored rterm column."""
    from index_spark.operators.query import search_wildcard, wildcard_expand
    from index_spark.plans.dictionary import load_reversed_dictionary

    _, index, stats = built
    d = load_dictionary(spark, store)
    rd = load_reversed_dictionary(spark, store)
    # same rows, two sort orders
    assert rd.count() == d.count()
    assert "rterm" in rd.columns
    for pats in (["*s"], ["*urn"], ["*s", "im*"], ["*zzz"], ["?mport"]):
        a = wildcard_expand(None, pats, dictionary=d, rdictionary=rd)
        b = wildcard_expand(index, pats)
        c = wildcard_expand(None, pats, dictionary=d)
        assert a == b == c, pats
    # rterm-sorted at rest: each file's rterm range is contiguous
    import pyarrow.parquet as pq
    from index_spark.plans.dictionary import reversed_dictionary_path
    import glob as _glob
    ranges = []
    for f in sorted(_glob.glob(reversed_dictionary_path(store)
                               + "/*.parquet")):
        col = pq.read_table(f, columns=["rterm"])["rterm"].to_pylist()
        assert col == sorted(col), f
        if col:
            ranges.append((col[0], col[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    plan = (rd.filter(F.col("rterm").startswith("nru")
                      & F.col("term").like("%urn"))
            .select("term")._jdf.queryExecution().executedPlan().toString())
    assert "StartsWith" in plan and "PushedFilters" in plan
    # end-to-end: suffix search with the reversed catalog ranks
    # identically to the index-fallback route
    docs, index, stats = built
    a = search_wildcard(index, docs, stats, "import *urn", k=10,
                        mode="and", dictionary=d, rdictionary=rd,
                        shard_size=SHARD).collect()
    b = search_wildcard(index, docs, stats, "import *urn", k=10,
                        mode="and", shard_size=SHARD).collect()
    assert [(r.doc_id, r.score) for r in a] == \
        [(r.doc_id, r.score) for r in b]


def test_incremental_compaction_keeps_reversed_projection(spark,
                                                          tiny_corpus,
                                                          tmp_path):
    """After an incremental fold, the reversed projection carries
    exactly the main catalog's rows (term, df) with rterm =
    reverse(term)."""
    from index_spark.plans.dictionary import load_reversed_dictionary
    from index_spark.streaming.ingest import ingest_batch

    out = str(tmp_path / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    head, tail = ordered.iloc[:96], ordered.iloc[96:128]
    build_chunked(spark, spark.createDataFrame(head), out,
                  docs_per_chunk=48, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=512)
    ingest_batch(spark, spark.createDataFrame(tail), out,
                 shard_size=SHARD)
    m = compact_index(spark, out, segment_bytes=512)
    assert m["mode"] == "incremental"
    d = load_dictionary(spark, out).select("term", "df", "rterm")
    rd = load_reversed_dictionary(spark, out).select("term", "df", "rterm")
    a = sorted((r.term, r.df, r.rterm) for r in d.collect())
    b = sorted((r.term, r.df, r.rterm) for r in rd.collect())
    assert a == b
    assert all(rt == t[::-1] for t, _, rt in a)


def test_crash_window_self_heal(spark, store):
    """A crash between swap_dir's two renames leaves <target>_old as
    the only copy.  load_dictionary / load_reversed_dictionary must
    restore it transparently (same rows), and heal_swapped_dir must
    not fire when a live catalog exists."""
    import os
    import shutil

    from index_spark.plans.dictionary import (dictionary_path,
                                              heal_swapped_dir,
                                              load_reversed_dictionary,
                                              reversed_dictionary_path)

    before = sorted((r.term, r.df) for r in
                    load_dictionary(spark, store)
                    .select("term", "df").collect())

    p = dictionary_path(store)
    os.rename(p, p + "_old")                    # simulated crash state
    healed = sorted((r.term, r.df) for r in
                    load_dictionary(spark, store)
                    .select("term", "df").collect())
    assert healed == before
    assert os.path.isdir(p) and not os.path.isdir(p + "_old")

    rp = reversed_dictionary_path(store)
    os.rename(rp, rp + "_old")
    load_reversed_dictionary(spark, store).count()
    assert os.path.isdir(rp) and not os.path.isdir(rp + "_old")

    # live catalog + stale _old: heal must NOT clobber the live copy
    shutil.copytree(p, p + "_old")
    assert heal_swapped_dir(p) is False
    shutil.rmtree(p + "_old")


def test_front_coded_blocks_round_trip(spark, store):
    """IIR §5.2 front coding: encode -> decode reproduces the catalog
    exactly; block (head, last) bounds let prefix scans prune whole
    blocks before any decode."""
    from index_spark.plans.dictionary import (decode_front_coded,
                                              front_code_dictionary,
                                              prefix_scan_front_coded)

    d = load_dictionary(spark, store).select("term", "df")
    blocks = front_code_dictionary(d, block=16).persist()
    orig = sorted(map(tuple, d.collect()))
    back = sorted(map(tuple, decode_front_coded(blocks).collect()))
    assert back == orig
    # every block's bounds hold and entry counts sum to the catalog
    rows = blocks.collect()
    assert sum(r.n_terms for r in rows) == len(orig)
    assert all(r.head <= r.last and 1 <= r.n_terms <= 16 for r in rows)
    # prefix scan parity with the flat catalog
    for pref in ("re", "int", "zzz"):
        a = sorted(r.term for r in
                   prefix_scan_front_coded(blocks, pref).collect())
        b = sorted(r.term for r in
                   d.filter(F.col("term").startswith(pref)).collect())
        assert a == b, pref
    blocks.unpersist()
