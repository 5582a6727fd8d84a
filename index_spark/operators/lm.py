"""N-gram language-model quality scoring (CCNet-style perplexity gate).

The canonical LLM-pipeline quality filter (Wenzek et al., "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data", LREC
2020) scores each document by the perplexity of a language model trained
on a trusted reference corpus and drops the high-perplexity tail.  Here
the model is an add-alpha-smoothed bigram LM trained as two
map-side-combinable count aggregates, so the whole gate is pure Catalyst:

  P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V)

with c(w1) the count of w1 *as a bigram context* (both counts come from
the same bigram relation, so the model is self-consistent: for every
observed context, sum_w2 P(w2|w1) == 1) and V the corpus vocabulary size.

Scale shape (100 TB): token explode -> one groupBy per count table
(partial aggregation map-side); scoring joins each doc bigram to the
counts on (w1, w2) / (w1) — term-keyed shuffle joins whose right side is
vocabulary-bounded (<< corpus-bounded), broadcastable for bounded vocabs;
V rides a one-row cross join.  Nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_bigrams", "bigram_lm_scores"]

# SQL-parity tokenizer spec (functions/text.py simple_tokens):
# lower -> split on [^a-z0-9]+ -> drop empties
from index_spark.functions.text import TOKENS_SQL as _TOKS  # noqa: E402


def doc_bigrams(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, JVM-side
    (array transform + explode, no Python)."""
    l = F.expr(_TOKS.format(col=text_col))
    # explode_outer + IS NOT NULL, not plain explode: the inferred
    # size()>0 filter of a plain explode substitutes the bigram
    # transform (with tokenization inside its lambda) through the
    # projection and re-evaluates it per element — O(tokens^2) per doc
    # (see doc_grams in contamination.py for the measured case)
    return (docs.select(F.col(id_col).alias("doc_id"), l.alias("l"))
            .where(F.size("l") >= 2)
            .select("doc_id", F.explode_outer(F.transform(
                F.sequence(F.lit(0), F.size("l") - 2),
                lambda i: F.struct(F.get("l", i).alias("w1"),
                                   F.get("l", i + F.lit(1)).alias("w2"))
            )).alias("bg"))
            .filter(F.col("bg").isNotNull())
            .select("doc_id", "bg.w1", "bg.w2"))


def bigram_lm_scores(docs: DataFrame, reference: DataFrame | None = None,
                     alpha: float = 1.0, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, xent) for every document: cross-entropy under
    an add-alpha bigram LM trained on ``reference`` (default: the scored
    corpus itself — the self-scoring form used for repetition/outlier
    gating).  xent = -avg ln P(w2|w1), rounded at 4; docs with fewer than
    2 tokens score NULL with n_bigrams = 0.  Gate usage: keep docs below
    a corpus-quantile xent cut."""
    if not alpha > 0:
        # alpha=0 would turn unseen bigrams into log(0) = NULL, which
        # avg() silently DROPS — junk documents would score low xent
        raise ValueError(f"alpha must be > 0, got {alpha}")
    ref = docs if reference is None else reference
    train = doc_bigrams(ref, text_col=text_col, id_col=id_col)
    c12 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12"))
    c1 = train.groupBy("w1").agg(
        F.count(F.lit(1)).cast("double").alias("c1"))
    vocab = (ref.select(F.explode_outer(
                F.expr(_TOKS.format(col=text_col))).alias("t"))
             .filter(F.col("t").isNotNull())
             .agg(F.countDistinct("t").cast("double").alias("v")))

    # self-scoring reuses the training bigram relation (one definition;
    # Catalyst can reuse the exchange instead of re-tokenizing)
    score = train if reference is None else \
        doc_bigrams(docs, text_col=text_col, id_col=id_col)
    # left joins: a bigram / context unseen in the reference smooths to
    # count 0 (P = alpha / (c1 + alpha*V)) instead of being dropped
    per_doc = (score.join(c12, ["w1", "w2"], "left")
               .join(c1, "w1", "left")
               .crossJoin(vocab)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    (-F.avg(F.log((F.coalesce(F.col("c12"), F.lit(0.0)) + F.lit(alpha))
                                  / (F.coalesce(F.col("c1"), F.lit(0.0))
                                     + F.lit(alpha) * F.col("v"))))
                     ).alias("xent")))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
                    F.round(F.col("xent"), 4).alias("xent")))
