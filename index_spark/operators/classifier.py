"""Distributed linear-classifier quality gating (hashed bag-of-words).

The supervised quality filter of the GPT-3/WebText lineage: train a
linear classifier on hashed token features against a trusted/untrusted
label relation, score every document, keep the high-probability tail.
Here it is logistic regression by full-batch gradient descent with a
FIXED, pinned schedule (w0 = 0, constant lr, ``iters`` steps), so the
whole computation is deterministic and restates as unrolled SQL CTEs.

Pinned contract (shared verbatim with the driver oracle):

- features: token -> bucket via four md5 nibbles -> pmod(dim) (md5 is
  the one hash both engines compute identically; xxhash64 vs DuckDB's
  hash() differ); val = bucket token count / doc token count.
- margin_d = sum_f val*w (absent features contribute 0, a featureless
  doc scores sigmoid(0) = 0.5); p = 1/(1+exp(-margin)).
- grad_f = sum_d val*(p_d - y_d) / n_labeled;  w' = w - lr*grad.

Scale shape (100 TB): the weight relation is dim-bounded (broadcast
side of every join); one feats-x-weights join + doc groupBy and one
residual scatter + feat groupBy per iteration — the same two-shuffle
round as PageRank; labels join only the labeled subset.  Nothing ever
collects to the driver; localCheckpoint truncates the iterative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions.text import TOKENS_SQL as _TOKS

__all__ = ["hashed_features", "train_logreg", "score_logreg"]

_HEX = "0123456789abcdef"


def _bucket_sql(term_expr: str, dim: int) -> str:
    """Dialect-shared md5-nibble bucket: 16 bits of md5 -> pmod(dim)."""
    nib = [f"(instr('{_HEX}', substr(md5({term_expr}), {i}, 1)) - 1)"
           for i in (1, 2, 3, 4)]
    word = f"({nib[0]} * 4096 + {nib[1]} * 256 + {nib[2]} * 16 + {nib[3]})"
    return f"pmod({word}, {dim})"


def hashed_features(docs: DataFrame, dim: int = 256, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, feat, val) — hashed bag-of-words, val = bucket token
    count / doc token count (L1-normalized tf)."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode_outer(F.expr(_TOKS.format(col=text_col)))
                        .alias("t"))
            .filter(F.col("t").isNotNull()))
    toks = toks.withColumn("feat", F.expr(_bucket_sql("t", dim)))
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    return (toks.groupBy("doc_id", "feat")
            .agg(F.count(F.lit(1)).alias("c"))
            .join(dlen, "doc_id")
            .select("doc_id", "feat",
                    (F.col("c") / F.col("dlen")).alias("val")))


def _margins(feats: DataFrame, weights: DataFrame) -> DataFrame:
    """(doc_id, m) for every doc present in feats; absent weights = 0."""
    return (feats.join(F.broadcast(weights), "feat", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.col("val") * F.coalesce(F.col("w"), F.lit(0.0)))
                 .alias("m")))


def train_logreg(feats: DataFrame, labels: DataFrame, iters: int = 2,
                 lr: float = 1.0) -> DataFrame:
    """(feat, w) after ``iters`` full-batch GD steps from w = 0.
    ``labels`` is (doc_id, y) with y in {0.0, 1.0}; only labeled docs
    contribute gradient (score anything afterwards with
    :func:`score_logreg`)."""
    spark = feats.sparkSession
    lab = labels.select("doc_id", F.col("y").cast("double").alias("y"))
    n = lab.agg(F.count(F.lit(1)).cast("double").alias("n"))
    weights = spark.createDataFrame([], "feat int, w double")
    for _ in range(iters):
        p = _margins(feats, weights).select(
            "doc_id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))))
            .alias("p"))
        grad = (feats.join(p, "doc_id").join(lab, "doc_id").crossJoin(n)
                .groupBy("feat")
                .agg((F.sum(F.col("val") * (F.col("p") - F.col("y")))
                      / F.first("n")).alias("g")))
        weights = (weights.join(grad, "feat", "full")
                   .select("feat",
                           (F.coalesce(F.col("w"), F.lit(0.0))
                            - F.lit(lr) * F.coalesce(F.col("g"), F.lit(0.0))
                            ).alias("w"))
                   .localCheckpoint())
    return weights


def score_logreg(docs: DataFrame, feats: DataFrame, weights: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, prob) for EVERY document — featureless docs score the
    prior sigmoid(0) = 0.5."""
    m = _margins(feats, weights)
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(m, "doc_id", "left")
            .select("doc_id",
                    (F.lit(1.0) / (F.lit(1.0)
                                   + F.exp(-F.coalesce(F.col("m"),
                                                       F.lit(0.0)))))
                    .alias("prob")))
