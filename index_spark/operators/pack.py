"""Sequence packing — concat-and-split for LLM training batches.

The standard pretraining layout (GPT-style): concatenate every
document's token stream in a fixed global order and split the stream
into sequences of exactly ``seq_len`` tokens; documents straddle
sequence boundaries, and only the final sequence may be short. The
output here is the PLACEMENT relation — one row per (sequence,
document) intersection with offsets — from which a materialization
stage can gather the actual token slices.

Distributed shape — the global prefix sum is the whole problem, and a
single unpartitioned window over 10^12 rows is not a plan. It is
computed in two DETERMINISTIC, partition-layout-independent levels
keyed by the data itself (never by ``spark_partition_id``):

  1. docs group by ``doc_id // group_size``; per-group token totals are
     a map-side-combinable aggregate (one row per group);
  2. the exclusive prefix over the (small) group relation is one
     ordered window over n_docs / group_size rows — pick ``group_size``
     so that relation fits one task (2^20 at 10^12 docs -> ~10^6 rows;
     recurse the same trick if it ever doesn't);
  3. within-group exclusive cumsums are windows PARTITIONED by group —
     bounded by ``group_size`` rows each, all groups in parallel.

Every step is expressions + windows (no UDF); output order/values are
identical for any input partitioning, so the packing is reproducible
across reruns and engines — restated verbatim as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, seq_len: int = 2048,
                   text_col: str = "text", id_col: str = "doc_id",
                   group_size: int = 1 << 16) -> DataFrame:
    """Placement relation (seq_id, doc_id, doc_off, seq_off, n_tokens).

    ``seq_id`` is the 0-based training-sequence ordinal; the row says
    "tokens [doc_off, doc_off + n_tokens) of ``doc_id`` land at
    [seq_off, seq_off + n_tokens) of sequence ``seq_id``". Documents
    are concatenated in ascending ``id_col`` order; zero-token
    documents place nothing. Every sequence except the last holds
    exactly ``seq_len`` tokens (tiling pinned by tests).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != "")
    t = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.size(toks).cast("long").alias("n"))
    t = t.withColumn("grp", F.floor(F.col("doc_id") / group_size))

    # level 1+2: per-group totals, then the exclusive prefix over the
    # small group relation (the ONLY unpartitioned window — one row per
    # group, not per doc)
    gtot = t.groupBy("grp").agg(F.sum("n").alias("gn"))
    wg = (Window.orderBy("grp")
          .rowsBetween(Window.unboundedPreceding, -1))
    goff = gtot.withColumn(
        "goff", F.coalesce(F.sum("gn").over(wg), F.lit(0)).cast("long")) \
        .select("grp", "goff")

    # level 3: within-group exclusive cumsum, parallel across groups
    wd = (Window.partitionBy("grp").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    placed = (t.join(goff, "grp")
              .withColumn("start",
                          (F.col("goff")
                           + F.coalesce(F.sum("n").over(wd), F.lit(0)))
                          .cast("long"))
              .filter(F.col("n") > 0))

    L = F.lit(int(seq_len))
    first = F.floor(F.col("start") / L).cast("long")
    last = F.floor((F.col("start") + F.col("n") - 1) / L).cast("long")
    x = placed.select(
        "doc_id", "n", "start",
        F.explode(F.sequence(first, last)).alias("seq_id"))
    lo = F.greatest(F.col("start"), F.col("seq_id") * L)
    hi = F.least(F.col("start") + F.col("n"), (F.col("seq_id") + 1) * L)
    return (x.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        (lo - F.col("start")).cast("long").alias("doc_off"),
        (lo - F.col("seq_id") * L).cast("long").alias("seq_off"),
        (hi - lo).cast("long").alias("n_tokens")))
