"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl container.

A 100-TB web corpus arrives as WARC archives.  The scale contract here
is the one Common Crawl pipelines actually use: the ARCHIVE FILE is the
unit of parallelism (one ~1 GB file per task via
``spark.read.format("binaryFile")``), and records within a file parse
sequentially against their Content-Length framing — the format is a
byte-framed stream, so newline-split text readers cannot parse it.

``build_warc_records`` / ``build_warc_files`` assemble spec-shaped
archives from a document relation entirely JVM-side (string concat +
sorted array_join; Content-Length is ``octet_length`` — BYTES, not
chars), which gives tests and the driver oracle a deterministic
roundtrip: documents -> archive blobs -> ``parse_warc`` -> the same
rows.  ``parse_warc`` is an Arrow-batched mapInPandas over archive
blobs, tolerant of malformed/truncated trailing records (skipped, not
fatal), never loading more than one archive per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["build_warc_records", "build_warc_files", "parse_warc",
           "read_warc_dir"]

_CRLF = "\r\n"


def build_warc_records(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       uri_fmt: str = "http://corpus.example/doc%08d",
                       uri_col: str | None = None,
                       content_type: str = "text/plain") -> DataFrame:
    """(doc_id, record) — one WARC/1.0 resource record STRING per doc
    (Content-Length in bytes via octet_length; encode at file assembly).

    ``uri_col``: take the target URI from a column instead of
    formatting ``uri_fmt`` over the id (HTML page archives carry the
    page's own URL); ``content_type`` labels the payload (text/html
    for page records)."""
    uri = (F.col(uri_col) if uri_col is not None
           else F.format_string(uri_fmt, F.col(id_col)))
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: resource" + _CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.format_string("WARC-Record-ID: <urn:doc:%d>" + _CRLF, F.col(id_col)),
        F.lit(f"Content-Type: {content_type}" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(F.col(text_col)).cast("string"), F.lit(_CRLF),
        F.lit(_CRLF),
        F.col(text_col), F.lit(_CRLF + _CRLF))
    return docs.select(F.col(id_col).alias("doc_id"), rec.alias("record"))


def build_warc_files(docs: DataFrame, docs_per_file: int = 50,
                     text_col: str = "text", id_col: str = "doc_id",
                     uri_fmt: str = "http://corpus.example/doc%08d",
                     uri_col: str | None = None,
                     content_type: str = "text/plain") -> DataFrame:
    """(file_id, payload) — archive blobs of ``docs_per_file`` records
    concatenated in doc_id order (sorted array_join, then one encode)."""
    recs = (build_warc_records(docs, text_col=text_col, id_col=id_col,
                               uri_fmt=uri_fmt, uri_col=uri_col,
                               content_type=content_type)
            .withColumn("file_id", (F.col("doc_id")
                                    / F.lit(docs_per_file)).cast("long")))
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list(
            F.struct(F.col("doc_id"), F.col("record")))),
            lambda s: s["record"]), "")
    return (recs.groupBy("file_id")
            .agg(F.encode(body, "utf-8").alias("payload")))


_PARSE_SCHEMA = T.StructType([
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("rec_type", T.StringType(), True),
    T.StructField("content_length", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
])


def _parse_one(buf: bytes) -> list[tuple]:
    out = []
    pos = 0
    magic = b"WARC/"
    n = len(buf)
    while True:
        start = buf.find(magic, pos)
        if start < 0:
            break
        hdr_end = buf.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break  # truncated header
        headers: dict[str, str] = {}
        for line in buf[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue  # malformed: resync at next magic
        if clen < 0:
            # negative length would move pos BACKWARD and loop forever
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated payload
        body = buf[body_start:body_start + clen]
        out.append((headers.get("warc-target-uri"),
                    headers.get("warc-record-id"),
                    headers.get("warc-type"),
                    clen,
                    body.decode("utf-8", "replace")))
        pos = body_start + clen
    return out


def parse_warc(blobs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """One row per WARC record across all archive blobs: (target_uri,
    record_id, rec_type, content_length, text)."""
    def fn(it):
        for pdf in it:
            rows = [rec for buf in pdf[payload_col]
                    for rec in _parse_one(bytes(buf))]
            yield pd.DataFrame(rows, columns=[f.name for f in _PARSE_SCHEMA])

    return blobs.select(payload_col).mapInPandas(fn, schema=_PARSE_SCHEMA)


def write_warc_dir(docs: DataFrame, out_dir: str, docs_per_file: int = 50,
                   text_col: str = "text", id_col: str = "doc_id"
                   ) -> DataFrame:
    """Distributed WARC sink: every task writes its own archive files
    (``part-<file_id>.warc``) and the returned MANIFEST relation
    (file_id, path, n_bytes) is the only thing that crosses the wire —
    archive bytes never touch the driver.  ``out_dir`` must be
    executor-reachable (shared filesystem on a real cluster)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    files = build_warc_files(docs, docs_per_file=docs_per_file,
                             text_col=text_col, id_col=id_col)

    def fn(it):
        for pdf in it:
            rows = []
            for fid, payload in zip(pdf["file_id"], pdf["payload"]):
                p = os.path.join(out_dir, f"part-{int(fid):08d}.warc")
                with open(p, "wb") as f:
                    f.write(bytes(payload))
                rows.append((int(fid), p, len(payload)))
            yield pd.DataFrame(rows,
                               columns=["file_id", "path", "n_bytes"])

    return files.mapInPandas(fn, "file_id long, path string, n_bytes long")


def read_warc_dir(spark, path: str) -> DataFrame:
    """Parse every ``*.warc`` archive under ``path`` — one file per task
    (the Common Crawl parallelism unit)."""
    blobs = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(path)
             .select(F.col("content").alias("payload")))
    return parse_warc(blobs)
