"""Multi-format ingestion: WARC framing + JSONL/CSV/text normalizers."""

import json

import pytest
from pyspark.sql import functions as F

from index_spark.sources.ingest import (normalize_docs, read_csv_docs,
                                        read_jsonl_docs, read_text_dir,
                                        read_warc_docs)
from index_spark.sources.warc import (build_warc_files, build_warc_records,
                                      parse_warc, read_warc_dir)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# ----------------------------------------------------------------- warc

def test_warc_roundtrip_exact(spark):
    texts = ["hello web", "second doc café ☃", "", "x" * 500]
    docs = _docs(spark, texts)
    parsed = parse_warc(build_warc_files(docs, docs_per_file=3))
    rows = {int(r.target_uri[-8:]): r for r in parsed.collect()}
    assert len(rows) == 4
    for i, t in enumerate(texts):
        assert rows[i].text == t
        assert rows[i].content_length == len(t.encode())  # BYTES, not chars
        assert rows[i].rec_type == "resource"
        assert rows[i].record_id == f"<urn:doc:{i}>"


def test_warc_content_length_frames_magic_in_payload(spark):
    # a payload CONTAINING the record magic must not desync the parser
    evil = "fake\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\ninner"
    docs = _docs(spark, [evil, "after"])
    parsed = parse_warc(build_warc_files(docs, docs_per_file=10))
    got = sorted(r.text for r in parsed.collect())
    assert got == sorted([evil, "after"])


def test_warc_tolerates_truncation_and_garbage(spark, tmp_path):
    docs = _docs(spark, [f"doc number {i}" for i in range(5)])
    blob = b"".join(bytes(r.payload) for r in
                    build_warc_files(docs, docs_per_file=5).collect())
    (tmp_path / "a.warc").write_bytes(blob[:-8])       # truncated tail
    (tmp_path / "b.warc").write_bytes(b"not a warc")   # garbage file
    (tmp_path / "c.txt").write_bytes(blob)             # wrong extension
    got = read_warc_dir(spark, str(tmp_path)).count()
    assert got == 4  # last record of a.warc dropped; b unreadable; c skipped


def test_warc_records_are_spec_shaped(spark):
    rec = build_warc_records(_docs(spark, ["body"])).collect()[0].record
    head, _, rest = rec.partition("\r\n\r\n")
    assert head.startswith("WARC/1.0\r\n")
    assert "Content-Length: 4" in head
    assert rest == "body\r\n\r\n"


def test_read_warc_docs_normalizes(spark, tmp_path):
    docs = _docs(spark, ["alpha", "beta"])
    blob = b"".join(bytes(r.payload) for r in
                    build_warc_files(docs, docs_per_file=2).collect())
    (tmp_path / "x.warc").write_bytes(blob)
    out = read_warc_docs(spark, str(tmp_path))
    rows = out.collect()
    assert sorted(r.text for r in rows) == ["alpha", "beta"]
    assert all(r.source == "warc" for r in rows)
    assert len({r.doc_id for r in rows}) == 2


# ------------------------------------------------------- jsonl / csv / text

def test_read_jsonl_docs(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps({"id": f"k{i}", "text": f"t{i}",
                                       "extra": i}) for i in range(3)))
    out = read_jsonl_docs(spark, str(p)).collect()
    assert sorted(r.text for r in out) == ["t0", "t1", "t2"]
    assert len({r.doc_id for r in out}) == 3
    assert out[0].source == "jsonl"


def test_read_csv_docs_quoted(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text('id,text\nk1,"a, quoted"\nk2,plain\n')
    got = {r.text for r in read_csv_docs(spark, str(p)).collect()}
    assert got == {"a, quoted", "plain"}


def test_read_text_dir_one_doc_per_file(spark, tmp_path):
    (tmp_path / "a.txt").write_text("file a")
    (tmp_path / "b.txt").write_text("file b\nsecond line")
    (tmp_path / "skip.dat").write_text("nope")
    out = read_text_dir(spark, str(tmp_path)).collect()
    assert sorted(r.text for r in out) == ["file a", "file b\nsecond line"]


def test_normalize_docs_id_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(f"k{i}", f"t{i}") for i in range(50)],
                               "k string, t string")
    a = {r.doc_id for r in normalize_docs(df, "t", "k").collect()}
    b = {r.doc_id for r in
         normalize_docs(df.repartition(7), "t", "k").collect()}
    assert a == b and len(a) == 50


# ------------------------------------------------------------------ sinks

def test_write_warc_dir_manifest_and_roundtrip(spark, tmp_path):
    docs = _docs(spark, [f"body {i}" for i in range(10)])
    out = str(tmp_path / "warc")
    from index_spark.sources.warc import write_warc_dir
    mrows = write_warc_dir(docs, out, docs_per_file=4).collect()
    assert len(mrows) == 3  # ceil(10/4)
    back = read_warc_docs(spark, out)
    assert sorted(r.text for r in back.collect()) == \
        sorted(f"body {i}" for i in range(10))


def test_write_docs_jsonl_roundtrip(spark, tmp_path):
    from index_spark.sources.ingest import write_docs
    docs = _docs(spark, ["alpha", "beta"]).withColumn("source", F.lit("x"))
    out = str(tmp_path / "j")
    write_docs(docs, out, fmt="jsonl")
    back = read_jsonl_docs(spark, out, text_field="text",
                           key_field="doc_id")
    assert sorted(r.text for r in back.collect()) == ["alpha", "beta"]


def test_write_docs_rejects_unknown_format(spark, tmp_path):
    from index_spark.sources.ingest import write_docs
    with pytest.raises(ValueError):
        write_docs(_docs(spark, ["x"]), str(tmp_path / "o"), fmt="xml")


def test_warc_negative_content_length_resyncs(spark, tmp_path):
    # a negative Content-Length must not loop forever or emit rows
    evil = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Target-URI: http://x/e\r\nContent-Length: -60\r\n\r\n")
    docs = _docs(spark, ["good doc"])
    good = b"".join(bytes(r.payload) for r in
                    build_warc_files(docs, docs_per_file=1).collect())
    (tmp_path / "m.warc").write_bytes(evil + good)
    rows = read_warc_dir(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0].text == "good doc"
