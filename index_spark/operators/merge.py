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

One shuffle on the merge key; the reducer does O(total_bytes) memcpy of
pre-compressed bytes (the heavy lifting happened shard-parallel), and —
critically for 10^12-doc corpora — the merge key is NOT the bare term:
a hot term (``import`` ≈ present in every doc) would otherwise funnel
every shard row into ONE reducer and emit ONE multi-hundred-GB row.
:func:`merge_shards` therefore merges per (term, doc-range SEGMENT) with
a bounded bytes-per-segment target: terms whose total blob bytes fit the
target merge to a single row (the common, Zipf-cold case), hot terms
split into ⌈bytes/target⌉ contiguous shard-range segments, each a
bounded row on its own reducer. Query/phrase already score disjoint
sub-range rows of a term independently (query.py _decode_lists,
phrase.py), so segmented and monolithic merges are rank-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
            T.StructField("doc_off", T.LongType(), False),
            T.StructField("tf_off", T.LongType(), False),
            T.StructField("dl_off", T.LongType(), False),
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
    doc_base = tf_base = dl_base = 0
    for row in pdf.itertuples(index=False):
        blob = bytes(row.doc_blob)
        if idx_shift == 0:
            dlen = 0
            doc_parts.append(blob)
        else:
            # rewrite the first delta: absolute first_doc -> gap from the
            # previous shard's last doc (O(1) — only the first varbyte is
            # examined, never the rest of the blob)
            _, consumed = vb.decode_first(blob)
            patched = vb.encode_one(int(row.first_doc) - prev_last)
            dlen = len(patched) - consumed  # byte shift for offsets > 0
            doc_parts.append(patched + blob[consumed:])
        tfb = bytes(row.tf_blob)
        dlb = bytes(row.dl_blob)
        tf_parts.append(tfb)
        dl_parts.append(dlb)
        # positions are doc-local deltas — concatenation needs no patch
        pos_parts.append(bytes(getattr(row, "pos_blob", b"") or b""))
        skips.extend((int(s["idx"]) + idx_shift, int(s["doc"])) for s in row.skips)
        # block byte offsets: every part-local offset shifts by the bytes
        # of the parts already merged; within the patched part, offsets
        # past the rewritten first varbyte additionally shift by dlen
        # (offset 0 == the patched varbyte itself — no shift)
        blocks.extend(
            (int(b["start"]) + idx_shift, int(b["last_doc"]),
             int(b["max_tf"]), float(b["min_dl"]),
             doc_base + int(b["doc_off"]) + (dlen if int(b["doc_off"]) else 0),
             tf_base + int(b["tf_off"]), dl_base + int(b["dl_off"]))
            for b in row.blocks
        )
        doc_base += len(blob) + dlen
        tf_base += len(tfb)
        dl_base += len(dlb)
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


DEFAULT_SEGMENT_BYTES = 8 << 20  # 8 MiB of blob per merged row


def merge_shards(index: DataFrame,
                 segment_bytes: int = DEFAULT_SEGMENT_BYTES) -> DataFrame:
    """Sharded index -> one row per (term, bounded doc-range segment).

    Cold terms (total blob bytes <= ``segment_bytes``, the overwhelming
    Zipf majority) merge to ONE global sorted posting row. Hot terms
    split into ⌈total_bytes / segment_bytes⌉ segments of contiguous
    shard ranges, so no reducer key ever aggregates unbounded bytes and
    no output row exceeds ~segment_bytes (+ one shard's blob, since the
    cut is at shard granularity).

    Segment assignment is skew-safe metadata work: per-term totals come
    from a map-side-combined aggregate (small rows — never the blobs),
    only the HOT subset (few terms by Zipf) is broadcast back, and the
    segment id is a pure column expression over the shard id — the blobs
    shuffle exactly once, on the (term, segment) key.

    A zoned index (build_zoned_index) merges per (zone, term[, segment])
    — zones are independent sub-indexes and must never concatenate
    across. ``segment_bytes=None`` disables segmentation (always one row
    per term; only safe for bounded corpora)."""
    gcols = ["zone", "term"] if "zone" in index.columns else ["term"]
    if segment_bytes:
        row_bytes = (F.length("doc_blob") + F.length("tf_blob")
                     + F.length("dl_blob") + F.length("pos_blob"))
        totals = (index.groupBy(*gcols)
                  .agg(F.sum(row_bytes).alias("_tbytes"),
                       F.min("shard").alias("_min_sh"),
                       F.max("shard").alias("_max_sh")))
        hot = (totals.where(F.col("_tbytes") > segment_bytes)
               .withColumn("_n_segs", F.ceil(F.col("_tbytes")
                                             / F.lit(float(segment_bytes))))
               .withColumn("_width", F.greatest(F.lit(1), F.ceil(
                   (F.col("_max_sh") - F.col("_min_sh") + 1)
                   / F.col("_n_segs"))))
               .select(*gcols, "_min_sh", "_width"))
        index = (index.join(F.broadcast(hot), gcols, "left")
                 .withColumn("_seg", F.coalesce(
                     F.floor((F.col("shard") - F.col("_min_sh"))
                             / F.col("_width")), F.lit(0)).cast("long"))
                 .drop("_min_sh", "_width"))
        gcols = gcols + ["_seg"]
    else:
        index = index.withColumn("_seg", F.lit(0))
        gcols = gcols + ["_seg"]
    if "zone" in index.columns:
        schema = T.StructType(
            [T.StructField("zone", T.StringType(), False)]
            + list(MERGED_SCHEMA.fields))
        return index.groupBy(*gcols).applyInPandas(
            _merge_term_zone, schema=schema)
    return index.groupBy(*gcols).applyInPandas(
        _merge_term, schema=MERGED_SCHEMA)
