"""Reference-format chunk export: serialize a shard of our index into
the byte grammar of the reference's serialized chunk (``IndexBlob`` /
``IndexWriteHandler::WriteIndex``, /root/reference/index.cpp:48-58),
as pinned by the shipped ``testPL`` artifact and the golden-walk tests
(tests/test_golden_blob.py, SURVEY.md §1.4):

    header:  u64 DocumentsInIndex | u64 WordsInIndex | u64 capacity
             | 2 pad bytes
    bare:    '\\n' u64 keylen | key | ' '                (document URL)
    record:  '\\n' u64 keylen | key
             | '\\n' u64 useCount | ' ' u64 docCount | ' ' type char
             | ' ' u64 lastLocation | ' ' u64 0
             | '\\n' u64 nseek
             | nseek x ('\\n' u64 2^i ' ' u64 postIdx ' ' u64 location)
             | '\\n' | useCount x (varbyte ' ')
    file ends with one trailing '\\n'

Location space replayed exactly as ``Index::addDocument`` +
``PostingList::Delta`` build it (index.cpp:112-162, index.h:215-224):
one global ``WordsInIndex`` counter consumed by EVERY append — per doc
(ascending doc_id): the body tokens in position order, then the
end-of-document marker '%', then the self-URL key '##'+url.  Post
values: body gaps carry the style channel (``(gap << 1) | style``,
index.h:44-60 — Normal=0 reproduces testPL's 2x-gap body lists);
marker/URL gaps are raw.  Seek tables replay ``UpdateSeek``
(index.h:276-281) byte-faithfully, including its post-increment quirk
(the recorded location is the post's location + 1) and its
one-entry-per-append catch-up.  Varbytes use the reference codec
(functions/varbyte.py, golden-pinned).

Scale shape: one chunk file per SHARD — the export of a shard collects
only that shard's rows (vocab and postings bounded by shard_size docs)
and assembles the blob driver-side; ``export_all_chunks`` walks shards
sequentially (at deployment scale this loop becomes a foreachPartition
over shard-grouped rows, one file per task — same bytes, no driver
hop).  This is an interoperability/debug surface, not a serving path:
the engine serves from its own columnar layout.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import index_spark.functions.varbyte as vb
from index_spark.operators.build import DOC_MARKER
from index_spark.operators.phrase import decode_positions

SELF_URL_MARKER = "##"          # index.h:324
CAPACITY_WORD = 73728           # third header u64 observed in testPL


def _u64(v: int) -> bytes:
    return struct.pack("<Q", v)


def _replay_list(locs: list[int]) -> tuple[list[int], list[tuple[int, int, int]], int]:
    """(gaps, seek table [(2^i, idx, loc+1)], lastLocation) for one
    posting list with absolute locations ``locs`` — PostingList::Delta
    + UpdateSeek replay (index.h:215-224, 276-281)."""
    gaps, seeks = [], []
    last = 0
    seek_ix = 0
    for i, loc in enumerate(locs):
        gaps.append(loc - last)
        last = loc
        post_incr = loc + 1     # UpdateSeek sees WordsInIndex AFTER ++
        if post_incr >= (1 << seek_ix):
            seeks.append((1 << seek_ix, i, post_incr))
            seek_ix += 1
    return gaps, seeks, last


def _record(key: bytes, typ: str, dc: int, locs: list[int],
            style_shift: int = 0) -> bytes:
    gaps, seeks, lastloc = _replay_list(locs)
    vals = [(g << style_shift) for g in gaps] if style_shift else gaps
    out = [b"\n", _u64(len(key)), key,
           b"\n", _u64(len(vals)), b" ", _u64(dc), b" ",
           typ.encode(), b" ", _u64(lastloc), b" ", _u64(0),
           b"\n", _u64(len(seeks))]
    for thr, idx, loc in seeks:
        out += [b"\n", _u64(thr), b" ", _u64(idx), b" ", _u64(loc)]
    out.append(b"\n")
    for v in vals:
        out += [vb.encode_one(int(v)), b" "]
    return b"".join(out)


def export_reference_chunk(index: DataFrame, docs: DataFrame,
                           out_path: str, shard: int = 0,
                           corpus_tag: str = "index_spark",
                           style_shift: int = 1) -> dict:
    """Write one shard as a reference-grammar chunk file; returns
    {n_docs, words_in_index, n_records, bytes}.  Requires a
    ``positions=True`` build (locations need per-occurrence ordinals)."""
    rows = (index.filter(F.col("shard") == shard)
            .select("term", "df", "cf", "doc_blob", "tf_blob", "pos_blob")
            .collect())
    terms = {r["term"]: r for r in rows}
    marker = terms.pop(DOC_MARKER, None)
    if marker is None:
        raise ValueError(f"shard {shard} has no '{DOC_MARKER}' row — "
                         "not a built index?")
    doc_ids = np.cumsum(vb.decode(marker["doc_blob"])).astype(np.int64)
    dls = vb.decode(marker["tf_blob"]).astype(np.int64)
    # global location base per doc: body tokens, then '%', then '##url'
    # each consume one WordsInIndex slot (index.cpp:112-162)
    bases = np.concatenate(([0], np.cumsum(dls + 2)[:-1]))
    base_of = dict(zip(doc_ids.tolist(), bases.tolist()))
    dl_of = dict(zip(doc_ids.tolist(), dls.tolist()))
    words_in_index = int((dls + 2).sum())

    urls = {r["doc_id"]: f"{r['repo']}/{r['path']}" for r in
            docs.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
            .select("doc_id", "repo", "path").collect()}

    recs: list[tuple[bytes, bytes]] = []
    for term, r in terms.items():
        if r["pos_blob"] is None or len(r["pos_blob"]) == 0:
            raise ValueError("export needs a positions=True build "
                             f"(term {term!r} has no pos_blob)")
        tdocs = np.cumsum(vb.decode(r["doc_blob"])).astype(np.int64)
        tfs = vb.decode(r["tf_blob"]).astype(np.int64)
        pos = decode_positions(bytes(r["tf_blob"]), bytes(r["pos_blob"]))
        locs = (np.repeat([base_of[int(d)] for d in tdocs], tfs)
                + pos).tolist()
        key = term.encode()
        recs.append((key, _record(key, "b", int(r["df"]), locs,
                                  style_shift=style_shift)))
    # end-of-document marker: one post per doc at its EoD slot
    eod_locs = [base_of[int(d)] + dl_of[int(d)] for d in doc_ids]
    mkey = DOC_MARKER.encode()
    recs.append((mkey, _record(mkey, "e", len(doc_ids), eod_locs)))
    # self-URL keys: one single-post record per doc (sum of gaps ==
    # lastLocation falls out of the one-post list)
    for d in doc_ids:
        key = (SELF_URL_MARKER + urls.get(int(d), f"doc{int(d)}")).encode()
        recs.append((key, _record(key, "u", 1,
                                  [base_of[int(d)] + dl_of[int(d)] + 1])))

    recs.sort(key=lambda kr: kr[0])     # dict optimize -> sorted at rest
    tag = corpus_tag.encode()
    blob = b"".join(
        [_u64(len(doc_ids)), _u64(words_in_index), _u64(CAPACITY_WORD),
         b"\x00\x00",
         b"\n", _u64(len(tag)), tag, b" "]       # bare key (base URL)
        + [r for _, r in recs] + [b"\n"])
    with open(out_path, "wb") as f:
        f.write(blob)
    return {"n_docs": int(len(doc_ids)), "words_in_index": words_in_index,
            "n_records": len(recs), "bytes": len(blob)}


def export_all_chunks(index: DataFrame, docs: DataFrame, out_dir: str,
                      corpus_tag: str = "index_spark",
                      style_shift: int = 1) -> list[dict]:
    """One reference-grammar chunk file per shard (``chunk_<shard>``)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    shards = [r["shard"] for r in
              index.select("shard").distinct().orderBy("shard").collect()]
    out = []
    for s in shards:
        m = export_reference_chunk(
            index, docs, os.path.join(out_dir, f"chunk_{s}"), shard=int(s),
            corpus_tag=corpus_tag, style_shift=style_shift)
        m["shard"] = int(s)
        out.append(m)
    return out


def _ref_decode_one(data: bytes, p: int) -> tuple[int, int]:
    """Reference ``Post::get_bytes`` decode of one varbyte
    (index.h:63-74): length = leading-ones count of the first byte;
    ONE byte when the high bit is 0 (value = byte) or the byte is
    ``10xxxxxx`` (value = byte & 0x3F — a form the reference's shipped
    artifact contains but our canonical encoder never emits); n-byte
    payload = first-byte remainder then 6 bits per continuation."""
    b0 = data[p]
    if not (b0 >> 7):
        return b0, 1
    nb, s = 0, 7
    while (b0 >> s) & 1:
        nb += 1
        s -= 1
    if nb == 1:
        return b0 & 0x3F, 1
    v = b0 & ((1 << (7 - nb)) - 1)
    for b in data[p + 1: p + nb]:
        v = (v << 6) | (b & 0x3F)
    return v, nb


def walk_reference_chunk(path: str):
    """Verifying reader for the reference chunk grammar — consumes the
    ENTIRE file, raising on any structural mismatch (the same walk the
    golden tests run against the reference's shipped testPL).  Returns
    (header, records, bare_keys) with records =
    [(key, useCount, docCount, type, lastLocation, seeks, post_values)].
    """
    with open(path, "rb") as f:
        data = f.read()
    u64 = lambda p: struct.unpack_from("<Q", data, p)[0]
    n = len(data)
    header = (u64(0), u64(8), u64(16))
    p = 26
    records, bare = [], []
    while p < n - 1:
        if data[p] != 0x0A:
            raise ValueError(f"record must start with newline at {p}")
        klen = u64(p + 1)
        p += 9
        key = data[p: p + klen]
        p += klen
        if data[p] == 0x20:             # bare key record
            bare.append(key)
            p += 1
            continue
        if data[p] != 0x0A:
            raise ValueError(f"bad key terminator at {p}")
        use = u64(p + 1)
        p += 9
        dc = u64(p + 1)
        p += 9
        typ = chr(data[p + 1])
        p += 2
        lastloc = u64(p + 1)
        p += 9
        zero = u64(p + 1)
        if zero != 0:
            raise ValueError(f"reserved u64 must be 0 at {p}")
        p += 9
        if data[p] != 0x0A:
            raise ValueError(f"bad stats terminator at {p}")
        nseek = u64(p + 1)
        p += 9
        seeks = []
        for _ in range(nseek):
            if not (data[p] == 0x0A and data[p + 9] == 0x20
                    and data[p + 18] == 0x20):
                raise ValueError(f"bad seek row at {p}")
            seeks.append((u64(p + 1), u64(p + 10), u64(p + 19)))
            p += 27
        if data[p] != 0x0A:
            raise ValueError(f"bad seek terminator at {p}")
        p += 1
        posts = []
        for _ in range(use):
            first, nb = _ref_decode_one(data, p)
            posts.append(first)
            p += nb
            if data[p] != 0x20:
                raise ValueError(f"post not space-terminated at {p}")
            p += 1
        records.append((key, use, dc, typ, lastloc, seeks, posts))
    if data[n - 1] != 0x0A:
        raise ValueError("missing trailing newline")
    return header, records, bare
