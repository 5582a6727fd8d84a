"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score raw-corpus documents by how target-like they
are under hashed n-gram language models, the standard pretraining
data-selection recipe ("select web text that looks like Wikipedia/
books").

Mechanics, kept deterministic and engine-restatable:

  * features = word unigrams + bigrams, hashed into ``n_buckets``
    counters via the dialect-shared md5-nibble bucket (the same hash
    family as operators/sketch.py — reproducible in any engine, so the
    driver oracle value-checks the whole pipeline);
  * two bucket-count aggregates estimate the feature distributions of
    the TARGET corpus (p) and the RAW corpus (q), add-``alpha``
    smoothed so empty buckets stay finite;
  * per raw doc, the importance log-weight
    ``log w(d) = sum over feature occurrences f of ln p[b(f)] - ln q[b(f)]``
    — DSIR then resamples proportionally to w; the deterministic
    selection surface here is the ranked log-ratio (gate by threshold
    or top-k; Gumbel-noise resampling is a seeded post-step left to
    callers).

Scale shape: both distribution estimates are map-side-combinable
counts collapsing to ``n_buckets`` rows; the per-doc score is one
explode → broadcast-join against the 2*``n_buckets``-row log-ratio
table → one groupBy(doc_id) sum. Nothing collects; the target corpus
is typically small but nothing requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.operators.contamination import doc_grams
from index_spark.operators.sketch import hll_bucket_sql

DSIR_BUCKETS = 64


def dsir_bucket_sql(col: str, n_buckets: int = DSIR_BUCKETS) -> str:
    """Feature-hash bucket (0..n_buckets-1) from the first two md5
    nibbles — shared verbatim with the DuckDB oracle."""
    return f"({hll_bucket_sql(col)} % {n_buckets})"


def doc_feature_buckets(df: DataFrame, n_buckets: int = DSIR_BUCKETS,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """One row per hashed feature OCCURRENCE: (doc_id, bucket) over
    word unigrams and bigrams."""
    uni = doc_grams(df, 1, text_col, id_col)
    bi = doc_grams(df, 2, text_col, id_col)
    return (uni.unionByName(bi)
            .select("doc_id",
                    F.expr(dsir_bucket_sql("gram", n_buckets))
                    .alias("bucket")))


def _bucket_logprobs(feats: DataFrame, n_buckets: int,
                     alpha: float, out: str) -> DataFrame:
    """(bucket, <out>): ln((cnt_b + alpha) / (total + alpha * B)) with
    every bucket materialized (absent buckets get the smoothed floor).
    Two tiny aggregates; the bucket spine is a literal sequence."""
    spark = feats.sparkSession
    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    spine = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"))
    cnt = feats.groupBy("bucket").agg(F.count("*").alias("_c"))
    tot = feats.agg(F.count("*").alias("_t"))
    return (spine.join(cnt, "bucket", "left").crossJoin(tot)
            .select("bucket", F.expr(
                f"ln((CAST(coalesce(_c, 0) AS DOUBLE) + {a}) / "
                f"(CAST(_t AS DOUBLE) + {a} * {n_buckets}.0e0))")
                .alias(out)))


def dsir_logratios(raw: DataFrame, target: DataFrame,
                   n_buckets: int = DSIR_BUCKETS, alpha: float = 1.0,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per raw doc: (doc_id, n_feats, log_ratio) — the DSIR importance
    log-weight under hashed unigram+bigram models of ``target`` (p)
    vs ``raw`` (q). Positive = more target-like than the raw average.
    Empty docs keep a row with n_feats=0, log_ratio=0.0."""
    if not alpha > 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    raw_feats = doc_feature_buckets(raw, n_buckets, text_col, id_col)
    tgt_feats = doc_feature_buckets(target, n_buckets, text_col, id_col)
    lp = _bucket_logprobs(tgt_feats, n_buckets, alpha, "lp")
    lq = _bucket_logprobs(raw_feats, n_buckets, alpha, "lq")
    ratio = lp.join(lq, "bucket").select(
        "bucket", (F.col("lp") - F.col("lq")).alias("lr"))
    scored = (raw_feats.join(F.broadcast(ratio), "bucket")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_feats"),
                   F.sum("lr").alias("log_ratio")))
    ids = raw.select(F.col(id_col).cast("long").alias("doc_id"))
    return (ids.join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_feats", F.lit(0)).cast("long")
                    .alias("n_feats"),
                    F.coalesce("log_ratio", F.lit(0.0))
                    .alias("log_ratio")))


def dsir_select(raw: DataFrame, target: DataFrame, keep: int,
                n_buckets: int = DSIR_BUCKETS, alpha: float = 1.0,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """The ``keep`` most target-like raw docs by
    (log_ratio desc, doc_id asc) — the deterministic selection gate
    over :func:`dsir_logratios`. TakeOrderedAndProject cut (k-row heap
    per task); join back for full rows if needed."""
    lr = dsir_logratios(raw, target, n_buckets, alpha, text_col, id_col)
    return (lr.orderBy(F.desc("log_ratio"), F.asc("doc_id"))
            .limit(int(keep)))
