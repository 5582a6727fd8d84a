"""Document chunking — fixed-size token windows with overlap.

The training/RAG pipeline stage between curation and embedding: split
each document into ``chunk_size``-token windows advancing by
``chunk_size - overlap`` tokens, so consecutive chunks share ``overlap``
tokens of context. Only windows that contribute at least one NEW token
emit: a window at offset s > 0 with s + overlap >= n would consist
entirely of tokens already covered by the previous window, so it is
suppressed (every token still appears in some chunk, and every
non-final chunk is exactly ``chunk_size`` tokens — the last may be
short, but never overlap-only). Documents with zero tokens emit no
chunks.

Spark-first shape: the whole operator is catalyst expressions (split /
sequence / slice / array_join) — no UDF, no shuffle, whole-stage
codegen end to end. Each input row fans out to ceil(n / step) rows, so
at 100 TB the operator is a map-side explode whose output volume is
input x (1 + overlap/step); partition sizing is inherited from the
scan (chunking never re-partitions).

Tokenization is the engine's SQL-parity spec (lower -> [a-z0-9]+ runs,
``index_spark.functions.text.simple_tokens``) so chunk boundaries are
reproducible in any ANSI dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(df: DataFrame, chunk_size: int = 128, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Returns (doc_id, chunk_id, n_tokens, chunk_text): ``chunk_id`` is
    the 0-based window ordinal, ``n_tokens`` the window's actual token
    count (== chunk_size except the tail), ``chunk_text`` the window's
    tokens joined with single spaces (normalized surface form — the
    embedding/packing stages downstream consume tokens, not raw bytes).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap}")
    step = chunk_size - overlap
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != "")
    n = F.size(toks)
    # window start offsets 0, step, 2*step, ... < n, suppressing
    # overlap-only tails (s > 0 with s + overlap >= n)  (sequence() is
    # inclusive of its bound, so over-generate to n-1 and filter; a
    # 0-token doc generates [0] which the s < n filter drops)
    starts = F.filter(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                                 F.lit(step)),
                      lambda s: (s < n)
                      & ((s == 0) | (s + overlap < n)))
    out = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                     toks.alias("_toks"),
                     F.explode(starts).alias("_start"))
           .select("doc_id",
                   (F.col("_start") / step).cast("long").alias("chunk_id"),
                   F.slice("_toks", F.col("_start") + 1,
                           F.lit(chunk_size)).alias("_w"))
           .select("doc_id", "chunk_id",
                   F.size("_w").cast("long").alias("n_tokens"),
                   F.array_join("_w", " ").alias("chunk_text")))
    return out
