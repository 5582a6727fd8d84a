"""Segmented global merge: hot terms must never concentrate into one
unbounded reducer row (merge.py merge_shards segment_bytes bound)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.functions import varbyte as vb


@pytest.fixture(scope="module")
def hot_corpus(spark):
    # every doc contains the hot term + a filler unique-ish token; 400
    # docs at shard_size=16 -> 25 shards, "hot" present in every one
    texts = [f"hot filler{i % 7} word{i % 13}" for i in range(400)]
    rows = [("r", f"{i:04d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["repo", "path", "content"])
    return texts, df


@pytest.fixture(scope="module")
def hot_index(spark, hot_corpus):
    from index_spark.operators.build import build_index

    _, df = hot_corpus
    docs, index, stats = build_index(df, stem=False, positions=True,
                                     shard_size=16)
    return index.persist(), stats


def _row_bytes(r):
    return (len(r["doc_blob"]) + len(r["tf_blob"]) + len(r["dl_blob"])
            + len(r["pos_blob"]))


def test_segmented_merge_bounds_row_bytes(hot_index):
    """With a small segment target, no merged row of the hot term may
    exceed target + one shard row (the cut is at shard granularity)."""
    from index_spark.operators.merge import merge_shards

    index, _ = hot_index
    seg_bytes = 96
    shard_rows = index.where(F.col("term") == "hot").collect()
    max_shard_row = max(_row_bytes(r) for r in shard_rows)
    total = sum(_row_bytes(r) for r in shard_rows)
    assert total > 4 * seg_bytes  # the fixture really is hot

    merged = merge_shards(index, segment_bytes=seg_bytes)
    hot_rows = merged.where(F.col("term") == "hot").collect()
    assert len(hot_rows) > 1  # split across bounded segments
    for r in hot_rows:
        assert _row_bytes(r) <= seg_bytes + max_shard_row, len(hot_rows)
    # segments partition the doc space: disjoint, and together exactly
    # the sharded index's postings
    ranges = sorted((r["first_doc"], r["last_doc"]) for r in hot_rows)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo
    assert sum(r["df"] for r in hot_rows) == sum(r["df"] for r in shard_rows)


def test_segmented_merge_rank_identical(spark, hot_index):
    """Search over segmented merge == unsegmented merge == sharded."""
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.query import search

    index, stats = hot_index

    def top(idx):
        return [(r["doc_id"], round(r["score"], 9)) for r in
                search(idx, None, stats, "hot filler3 word5",
                       stem=False).collect()]

    a = top(index)
    b = top(merge_shards(index, segment_bytes=None))
    c = top(merge_shards(index, segment_bytes=96))
    assert a == b == c and len(a) > 0


def test_segmented_merge_positions_survive(hot_corpus, hot_index):
    """Phrase search over the segmented merged index equals the sharded
    index's (pos blobs concatenate correctly per segment)."""
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.phrase import phrase_search

    _, index = hot_corpus[1], hot_index[0]
    merged = merge_shards(index, segment_bytes=96)
    a = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(index, None, "hot filler3", stem=False).collect()]
    b = [(r["doc_id"], r["n_matches"]) for r in
         phrase_search(merged, None, "hot filler3", stem=False).collect()]
    assert a == b and len(a) > 0


def test_cold_terms_merge_to_single_row(hot_index):
    """Terms under the byte target keep the one-row-per-term contract."""
    from index_spark.operators.merge import merge_shards

    index, _ = hot_index
    merged = merge_shards(index)  # default 8 MiB target: all cold here
    counts = (merged.groupBy("term").count()
              .where(F.col("count") > 1).collect())
    assert counts == []


def test_segmented_merge_decode_roundtrip(hot_index):
    """Each segment row decodes independently: cumsum of deltas yields
    ascending doc ids within [first_doc, last_doc]."""
    from index_spark.operators.merge import merge_shards

    index, _ = hot_index
    merged = merge_shards(index, segment_bytes=96)
    for r in merged.where(F.col("term") == "hot").collect():
        docs = np.cumsum(vb.decode(r["doc_blob"]).astype(np.int64))
        assert docs[0] == r["first_doc"]
        assert docs[-1] == r["last_doc"]
        assert (np.diff(docs) > 0).all()
        assert docs.size == r["df"]


def test_wand_kernel_on_merged_segments(spark, hot_index):
    """Forced-WAND search over merged (and segmented) rows must equal the
    exhaustive kernel: exercises the per-block byte offsets, which the
    merge must shift (part byte bases + the patched first varbyte)."""
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.query import search

    index, stats = hot_index

    def top(idx, wand):
        return [(r["doc_id"], round(r["score"], 9)) for r in
                search(idx, None, stats, "hot filler3 word5",
                       stem=False, use_wand=wand).collect()]

    for seg in (None, 96):
        merged = merge_shards(index, segment_bytes=seg)
        assert top(merged, True) == top(merged, False) == top(index, False)
    assert len(top(index, True)) > 0
