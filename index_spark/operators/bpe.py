"""BPE tokenizer-vocabulary induction at corpus scale.

Byte-pair encoding merge learning (Sennrich, Haddow, Birch, ACL 2016)
over the word-frequency relation — the vocabulary-induction stage of an
LLM data pipeline.  Pinned deterministic contract (shared verbatim with
the SQL oracle):

- words: the engine's simple-token spec (lower, split [^a-z0-9]+);
  frequency = corpus occurrence count.
- a word's symbol state is a DOUBLE-space-delimited, double-space-
  padded string (`"  c  a  t  "`), one symbol per char initially.
- per round: count EVERY adjacent symbol position weighted by word
  frequency (overlapping counts, as in the reference implementation's
  get_stats); best pair = max count, ties to (left asc, right asc);
  merge application is `replace(s, ' l  r ', ' lr ')`.  The pattern
  takes ONE space from each double-space gap, so the scan resumes ON
  the following delimiter and an immediately repeated pair still
  matches: `a  a  a  a` -> `aa  aa`, exactly reference BPE's
  left-to-right merge-and-skip.  (A single-space encoding would eat
  the shared delimiter and silently skip every second occurrence of a
  repeated pair — pinned by test.)

Scale shape (100 TB): the state lives on the word-frequency relation
(vocabulary-bounded, millions of rows — not the corpus), each round is
one map-side-combinable pair-count aggregate plus a 1-row argmax
(driver sees one row per merge, the same bounded collect as k-means
centroids) and one map-only replace; localCheckpoint per round keeps
the plan linear in merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

__all__ = ["word_freqs", "learn_bpe", "apply_bpe"]

from index_spark.functions.text import TOKENS_SQL as _TOKS  # noqa: E402
# one symbol per char, DOUBLE-space-delimited and double-space-padded
_CHARS = ("concat('  ', array_join(transform(sequence(1, length(word)), "
          "i -> substring(word, i, 1)), '  '), '  ')")


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — corpus occurrence counts over the simple-token
    spec; the vocabulary-bounded relation all BPE rounds run on."""
    return (docs.select(F.explode_outer(
                F.expr(_TOKS.format(col=text_col))).alias("word"))
            .filter(F.col("word").isNotNull())
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = words.select("freq", F.split(F.trim("s"), " +").alias("syms"))
    return (syms.where(F.size("syms") >= 2)
            .select("freq", F.explode_outer(F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(F.get("syms", i).alias("lhs"),
                                   F.get("syms", i + F.lit(1)).alias("rhs"))
            )).alias("p"))
            .filter(F.col("p").isNotNull())
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("c")))


def learn_bpe(docs: DataFrame, n_merges: int = 10,
              text_col: str = "text") -> DataFrame:
    """(rank, lhs, rhs, pair_count) — the first ``n_merges`` BPE merge
    rules in training order (fewer if the corpus runs out of pairs)."""
    spark = docs.sparkSession
    words = (word_freqs(docs, text_col=text_col)
             .withColumn("s", F.expr(_CHARS))
             .localCheckpoint())
    rules: list[Row] = []
    for rank in range(1, n_merges + 1):
        best = (_pair_counts(words)
                .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
                .first())
        if best is None:
            break
        if not (best["lhs"].isalnum() and best["rhs"].isalnum()):
            # unreachable under the token spec ([a-z0-9]+ words), but the
            # symbols are spliced into a SQL literal below — never trust
            raise ValueError(f"non-alphanumeric symbol: {best}")
        rules.append(Row(rank=rank, lhs=best["lhs"], rhs=best["rhs"],
                         pair_count=int(best["c"])))
        pat = f" {best['lhs']}  {best['rhs']} "
        rep = f" {best['lhs']}{best['rhs']} "
        words = (words.withColumn(
                    "s", F.expr(f"replace(s, '{pat}', '{rep}')"))
                 .localCheckpoint())
    schema = "rank long, lhs string, rhs string, pair_count long"
    return spark.createDataFrame(rules, schema=schema)


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens) — tokenize with a learned merge list: per word,
    char symbols then every merge rule in training order.  The whole
    rule chain compiles into ONE nested codegen expression applied
    inside a per-word lambda, so tokenization is map-only (no explode,
    no shuffle) and token order is the document's word order."""
    for lhs, rhs in merges:
        if not (lhs.isalnum() and rhs.isalnum()):
            raise ValueError(f"non-alphanumeric merge symbol: {(lhs, rhs)}")
    s = _CHARS.replace("word", "w")
    for lhs, rhs in merges:
        s = f"replace({s}, ' {lhs}  {rhs} ', ' {lhs}{rhs} ')"
    toks = _TOKS.format(col=text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"flatten(transform({toks}, w -> split(trim({s}), ' +')))"
               ).alias("tokens"))
