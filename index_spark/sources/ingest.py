"""Multi-format corpus ingestion -> the canonical documents relation.

Every reader normalizes to (doc_id, text, source) so the rest of the
engine (build/dedup/curation/analytics) is format-agnostic.  Scale
contract: every reader takes an EXPLICIT schema — schema inference is a
full extra pass over 100 TB — and assigns ids deterministically from
content position (xxhash64 of the natural key), never from
``monotonically_increasing_id`` (partition-layout-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl_docs", "read_csv_docs", "read_text_dir",
           "read_warc_docs", "normalize_docs"]


def normalize_docs(df: DataFrame, text_col: str, key_col: str,
                   source: str | None = None,
                   source_col: str | None = None) -> DataFrame:
    """Project any relation to (doc_id, text, source): doc_id =
    xxhash64 of the natural key — deterministic under any partitioning
    and stable across reruns (unlike monotonically_increasing_id)."""
    src = (F.col(source_col) if source_col
           else F.lit(source if source is not None else "ingest"))
    return df.select(
        F.xxhash64(F.col(key_col).cast("string")).alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
        src.cast("string").alias("source"))


def read_jsonl_docs(spark: SparkSession, path: str, text_field: str = "text",
                    key_field: str = "id",
                    source: str = "jsonl") -> DataFrame:
    """JSON-lines corpus with an explicit two-field schema (no inference
    pass; extra fields are simply never parsed — column pruning at the
    reader)."""
    schema = T.StructType([
        T.StructField(key_field, T.StringType(), True),
        T.StructField(text_field, T.StringType(), True)])
    raw = spark.read.schema(schema).json(path)
    return normalize_docs(raw, text_field, key_field, source=source)


def read_csv_docs(spark: SparkSession, path: str, text_field: str = "text",
                  key_field: str = "id", source: str = "csv",
                  header: bool = True, sep: str = ",") -> DataFrame:
    """CSV corpus; explicit schema, RFC-4180 quoting/escaping left to
    Spark's reader (multiLine off — newline-in-quotes corpora should
    arrive as JSONL or parquet instead; a multiline CSV file cannot be
    split across tasks)."""
    schema = T.StructType([
        T.StructField(key_field, T.StringType(), True),
        T.StructField(text_field, T.StringType(), True)])
    raw = (spark.read.schema(schema)
           .option("header", str(header).lower()).option("sep", sep)
           .csv(path))
    return normalize_docs(raw, text_field, key_field, source=source)


def read_text_dir(spark: SparkSession, path: str, glob: str = "*.txt",
                  source: str = "text") -> DataFrame:
    """One document per file (wholetext): the file path is the natural
    key.  File-per-doc only scales to file counts the driver's listing
    can hold — prefer container formats beyond ~10^6 files."""
    raw = (spark.read.option("pathGlobFilter", glob)
           .text(path, wholetext=True)  # kwarg — the option form is a no-op
           .withColumn("path", F.input_file_name()))
    return normalize_docs(raw, "value", "path", source=source)


def write_docs(docs: DataFrame, out: str, fmt: str = "parquet") -> None:
    """Canonical-relation sink: parquet (default), jsonl, or csv —
    Spark-native distributed writers; WARC export lives in
    sources/warc.py write_warc_dir (manifest-returning)."""
    if fmt == "parquet":
        docs.write.mode("overwrite").parquet(out)
    elif fmt == "jsonl":
        docs.write.mode("overwrite").json(out)
    elif fmt == "csv":
        (docs.write.mode("overwrite")
         .option("header", "true").option("quoteAll", "true").csv(out))
    else:
        raise ValueError(f"unsupported sink format: {fmt}")


def read_warc_docs(spark: SparkSession, path: str,
                   source: str = "warc") -> DataFrame:
    """WARC archives -> documents (one archive file per task; see
    sources/warc.py for the framing contract)."""
    from index_spark.sources.warc import read_warc_dir

    recs = read_warc_dir(spark, path).where(F.col("target_uri").isNotNull())
    return normalize_docs(recs, "text", "target_uri", source=source)
