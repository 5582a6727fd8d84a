"""Reference-format chunk export round trip (plans/export.py): our
build -> export -> the same structural walk the golden tests run
against the reference's shipped testPL — plus a value round trip
(decoded posts reconstruct the corpus token stream exactly)."""

import numpy as np
import pytest

from index_spark.operators.build import build_index
from index_spark.plans.export import (export_all_chunks,
                                      export_reference_chunk,
                                      walk_reference_chunk)

TEXTS = [
    "alpha beta beta gamma",
    "beta delta epsilon alpha alpha",
    "gamma gamma zeta",
    "alpha beta gamma delta epsilon zeta eta theta",
    "solo",
]


@pytest.fixture(scope="module")
def built(spark):
    corpus = spark.createDataFrame(
        [("repo1", f"src/f{i}.py", t) for i, t in enumerate(TEXTS)],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=64)
    index = index.persist()
    index.count()
    return docs, index, stats


@pytest.fixture(scope="module")
def exported(built, tmp_path_factory):
    docs, index, _ = built
    path = str(tmp_path_factory.mktemp("refchunk") / "chunk_0")
    meta = export_reference_chunk(index, docs, path, shard=0,
                                  corpus_tag="http://t.example.com")
    return path, meta


def test_walk_accepts_our_artifact(exported):
    path, meta = exported
    header, records, bare = walk_reference_chunk(path)
    assert header[0] == meta["n_docs"] == len(TEXTS)
    # WordsInIndex counts every append: body tokens + '%' + '##url'
    n_body = sum(len(t.split()) for t in TEXTS)
    assert header[1] == meta["words_in_index"] == n_body + 2 * len(TEXTS)
    assert bare == [b"http://t.example.com"]
    assert len(records) == meta["n_records"]


def test_record_types_and_counts(exported):
    _, records, _ = walk_reference_chunk(exported[0])
    by_typ = {}
    for key, use, dc, typ, *_ in records:
        by_typ.setdefault(typ, []).append((key, use, dc))
    assert len(by_typ["e"]) == 1                  # one '%' record
    assert by_typ["e"][0][1] == len(TEXTS)
    assert len(by_typ["u"]) == len(TEXTS)         # one '##url' per doc
    assert all(use == 1 for _, use, _ in by_typ["u"])
    assert {k.decode() for k, _, _ in by_typ["b"]} == \
        {w for t in TEXTS for w in t.split()}
    # useCount == cf, docCount == df per body term
    got = {k.decode(): (use, dc) for k, use, dc in by_typ["b"]}
    toks = [t.split() for t in TEXTS]
    for term in got:
        cf = sum(d.count(term) for d in toks)
        df = sum(term in d for d in toks)
        assert got[term] == (cf, df), term


def test_seek_tables_follow_update_seek(exported):
    """Thresholds are consecutive powers of two; each recorded location
    crossed its threshold; idx/loc strictly increase — the same
    assertions the golden walk makes of testPL (index.h:276-281),
    including the post-increment quirk (loc = post location + 1)."""
    _, records, _ = walk_reference_chunk(exported[0])
    for key, use, dc, typ, lastloc, seeks, posts in records:
        for i, (thr, idx, loc) in enumerate(seeks):
            assert thr == 1 << i, key
            assert loc >= thr, key
        assert all(a[1] < b[1] for a, b in zip(seeks, seeks[1:])), key
        assert all(a[2] < b[2] for a, b in zip(seeks, seeks[1:])), key


def test_post_values_are_location_deltas(exported):
    """'u'/'e' gap sums telescope to lastLocation; body values carry
    the style channel (2 x gap, Normal) so they sum to 2 x
    lastLocation — testPL's own invariants, on our artifact."""
    _, records, _ = walk_reference_chunk(exported[0])
    for key, use, dc, typ, lastloc, seeks, posts in records:
        if typ in ("u", "e"):
            assert sum(posts) == lastloc, key
        else:
            assert sum(posts) == 2 * lastloc, key


def test_value_round_trip_reconstructs_corpus(exported):
    """Decode the exported chunk back into per-doc token streams and
    compare with the source corpus exactly."""
    _, records, _ = walk_reference_chunk(exported[0])
    eod = next(r for r in records if r[3] == "e")
    eod_locs = np.cumsum(eod[6])
    bases = np.concatenate(([0], eod_locs[:-1] + 2))
    slot = {}
    for key, use, dc, typ, lastloc, seeks, posts in records:
        if typ != "b":
            continue
        locs = np.cumsum(np.asarray(posts) >> 1)    # strip style bit
        for loc in locs:
            slot[int(loc)] = key.decode()
    rebuilt = []
    for d in range(len(TEXTS)):
        dl = eod_locs[d] - bases[d]
        rebuilt.append(" ".join(slot[int(bases[d] + i)]
                                for i in range(int(dl))))
    assert rebuilt == TEXTS


def test_export_requires_positions(spark, built):
    docs, _, _ = built
    corpus = spark.createDataFrame(
        [("r", "p", "alpha beta")], "repo string, path string, content string")
    d2, idx2, _ = build_index(corpus, stem=False, camel=False,
                              positions=False, shard_size=64)
    with pytest.raises(ValueError, match="positions"):
        export_reference_chunk(idx2, d2, "/tmp/_nope_chunk", shard=0)


def test_export_all_chunks_multi_shard(spark, tmp_path):
    corpus = spark.createDataFrame(
        [("r", f"f{i:03d}", f"tok{i % 3} common w{i}") for i in range(12)],
        "repo string, path string, content string")
    docs, index, _ = build_index(corpus, stem=False, camel=False,
                                 positions=True, shard_size=4)
    metas = export_all_chunks(index, docs, str(tmp_path / "chunks"))
    assert len(metas) == 3                         # 12 docs / shard 4
    assert sum(m["n_docs"] for m in metas) == 12
    for m in metas:
        header, records, _ = walk_reference_chunk(
            str(tmp_path / "chunks" / f"chunk_{m['shard']}"))
        assert header[0] == m["n_docs"]


@pytest.mark.skipif(not __import__("os").path.exists("/root/reference/testPL"),
                    reason="reference golden blob not present")
def test_walker_reads_reference_artifact():
    """The SAME verifying reader consumes the reference's shipped
    chunk — our writer and the reference artifact share one grammar."""
    header, records, bare = walk_reference_chunk("/root/reference/testPL")
    assert header[0] == 1454
    assert header[1] == 896800
    assert len(records) == 1455
    assert bare == [b"https://crawler-test.com"]
