"""Sorted merge of per-shard posting blobs into a global per-term index.

The reference leaves chunks unmerged (independent immutable blobs with
their own docID spaces, index.cpp:60-99); the north_rule requires a
global term-partitioned index produced by sorted merge. Because build
shards are *ranges* of the global doc_id space (build.py), the merge of
one term's shards is concatenation + patching the boundary delta of each
subsequent blob — no decode of the full lists:

  blob_s starts with delta_0 = first_doc_s (gap from 0); after merge it
  must be first_doc_s - last_doc_{s-1}. Only that one varbyte is
  rewritten; skips / blocks get their posting indexes shifted.

One shuffle on term; hot terms are one reducer key here, but the value
is pre-compressed bytes (the heavy lifting happened shard-parallel), so
the reducer does O(total_bytes) memcpy, not O(postings) scoring work.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb

MERGED_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("doc_blob", T.BinaryType(), False),
    T.StructField("tf_blob", T.BinaryType(), False),
    T.StructField("dl_blob", T.BinaryType(), False),
    T.StructField("pos_blob", T.BinaryType(), False),
    T.StructField("skips", T.ArrayType(
        T.StructType([
            T.StructField("idx", T.LongType(), False),
            T.StructField("doc", T.LongType(), False),
        ])), False),
    T.StructField("blocks", T.ArrayType(
        T.StructType([
            T.StructField("start", T.LongType(), False),
            T.StructField("last_doc", T.LongType(), False),
            T.StructField("max_tf", T.LongType(), False),
            T.StructField("min_dl", T.DoubleType(), False),
        ])), False),
    T.StructField("max_tf", T.LongType(), False),
    T.StructField("min_dl", T.DoubleType(), False),
])


def _merge_term_impl(pdf: pd.DataFrame, zone: bool) -> pd.DataFrame:
    # (shard, first_doc): the fused build may emit two rows for a shard
    # that spans a partition boundary — disjoint doc sub-ranges, ordered
    # by first_doc
    pdf = pdf.sort_values(["shard", "first_doc"])
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    pos_parts: list[bytes] = []
    skips: list[tuple[int, int]] = []
    blocks: list[tuple[int, int, int, float]] = []
    prev_last = 0
    idx_shift = 0
    for row in pdf.itertuples(index=False):
        blob = bytes(row.doc_blob)
        if idx_shift == 0:
            doc_parts.append(blob)
        else:
            # rewrite the first delta: absolute first_doc -> gap from the
            # previous shard's last doc (O(1) — only the first varbyte is
            # examined, never the rest of the blob)
            _, consumed = vb.decode_first(blob)
            patched = vb.encode_one(int(row.first_doc) - prev_last)
            doc_parts.append(patched + blob[consumed:])
        tf_parts.append(bytes(row.tf_blob))
        dl_parts.append(bytes(row.dl_blob))
        # positions are doc-local deltas — concatenation needs no patch
        pos_parts.append(bytes(getattr(row, "pos_blob", b"") or b""))
        skips.extend((int(s["idx"]) + idx_shift, int(s["doc"])) for s in row.skips)
        blocks.extend(
            (int(b["start"]) + idx_shift, int(b["last_doc"]),
             int(b["max_tf"]), float(b["min_dl"]))
            for b in row.blocks
        )
        idx_shift += int(row.df)
        prev_last = int(row.last_doc)
    # keep only the first skip entry per power-of-two threshold: shard
    # builds each emit local crossings; after concat the doc values are
    # global already, so dedupe by doc-threshold keeping lowest idx
    dedup: dict[int, tuple[int, int]] = {}
    for idx, doc in skips:
        key = doc.bit_length()
        if key not in dedup or idx < dedup[key][0]:
            dedup[key] = (idx, doc)
    skips = sorted(dedup.values())
    first = pdf.iloc[0]
    return pd.DataFrame([{
        **({"zone": first["zone"]} if zone else {}),
        "term": first["term"],
        "df": int(pdf["df"].sum()),
        "cf": int(pdf["cf"].sum()),
        "first_doc": int(first["first_doc"]),
        "last_doc": prev_last,
        "doc_blob": b"".join(doc_parts),
        "tf_blob": b"".join(tf_parts),
        "dl_blob": b"".join(dl_parts),
        "pos_blob": b"".join(pos_parts),
        "skips": [(int(i), int(d)) for i, d in skips],
        "blocks": blocks,
        "max_tf": int(pdf["max_tf"].max()),
        "min_dl": float(pdf["min_dl"].min()),
    }])


def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
    # single-parameter wrappers: applyInPandas treats a 2-arg function
    # as (group_key, pdf)
    return _merge_term_impl(pdf, zone=False)


def _merge_term_zone(pdf: pd.DataFrame) -> pd.DataFrame:
    return _merge_term_impl(pdf, zone=True)


def merge_shards(index: DataFrame) -> DataFrame:
    """Sharded index -> one row per term (global sorted posting list).

    A zoned index (build_zoned_index) merges per (zone, term) — zones are
    independent sub-indexes and must never concatenate across."""
    if "zone" in index.columns:
        schema = T.StructType(
            [T.StructField("zone", T.StringType(), False)]
            + list(MERGED_SCHEMA.fields))
        return index.groupBy("zone", "term").applyInPandas(
            _merge_term_zone, schema=schema)
    return index.groupBy("term").applyInPandas(_merge_term, schema=MERGED_SCHEMA)
