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
    # outer explode: a plain explode's inferred size-filter re-inlines
    # the starts expression (whose lambda references size(toks)) and
    # re-evaluates tokenization per start offset — O(len^2/step)
    out = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                     toks.alias("_toks"),
                     F.explode_outer(starts).alias("_start"))
           .filter(F.col("_start").isNotNull())
           .select("doc_id",
                   (F.col("_start") / step).cast("long").alias("chunk_id"),
                   F.slice("_toks", F.col("_start") + 1,
                           F.lit(chunk_size)).alias("_w"))
           .select("doc_id", "chunk_id",
                   F.size("_w").cast("long").alias("n_tokens"),
                   F.array_join("_w", " ").alias("chunk_text")))
    return out


# --------------------------------------------------------------------- FIM

_FIM_HEX = "0123456789abcdef"


def _hex_word_sql(key_expr: str, salt: str) -> str:
    """A deterministic 32-bit uniform word from md5(key ':' salt) — the
    dialect-shared nibble decode (``instr`` of the hex alphabet; md5 is
    the one hash Spark and DuckDB both expose, cf.
    ``classifier._bucket_sql``). Pure SQL string so the driver oracle
    restates it verbatim."""
    h = f"md5(concat({key_expr}, ':{salt}'))"
    # bigint per nibble: the high-nibble multiplier (16^7) overflows
    # 32-bit int arithmetic in both dialects otherwise
    nibs = [f"cast(instr('{_FIM_HEX}', substr({h}, {i}, 1)) - 1 as bigint)"
            for i in range(1, 9)]
    terms = " + ".join(f"{n} * {16 ** (7 - j)}" for j, n in enumerate(nibs))
    return f"({terms})"


def fim_exprs(rate: float = 0.5, salt: str = "fim", text_col: str = "text",
              id_col: str = "doc_id", pre_tok: str = "<PRE>",
              suf_tok: str = "<SUF>", mid_tok: str = "<MID>"
              ) -> tuple[str, str]:
    """The (fim_predicate, fim_sample) SQL expression pair — shared
    between :func:`fim_split` and the driver's DuckDB oracle, so the
    value check covers the draw, the cuts, and the re-serialization
    with one source of truth."""
    from index_spark.operators.sample import rate_threshold

    key = f"cast({id_col} as string)"
    n = f"length({text_col})"
    c1 = f"({_hex_word_sql(key, salt + ':c1')} % ({n} + 1))"
    c2 = f"({_hex_word_sql(key, salt + ':c2')} % ({n} + 1))"
    lo, hi = f"least({c1}, {c2})", f"greatest({c1}, {c2})"
    fim = (f"substr(md5(concat({key}, ':{salt}:apply')), 1, 8)"
           f" < '{rate_threshold(rate)}'")
    sample = (f"concat('{pre_tok}', substr({text_col}, 1, {lo}), "
              f"'{suf_tok}', substr({text_col}, {hi} + 1), "
              f"'{mid_tok}', substr({text_col}, {lo} + 1, {hi} - {lo}))")
    return fim, sample


def fim_split(df: DataFrame, rate: float = 0.5, salt: str = "fim",
              text_col: str = "text", id_col: str = "doc_id",
              pre_tok: str = "<PRE>", suf_tok: str = "<SUF>",
              mid_tok: str = "<MID>") -> DataFrame:
    """Fill-in-the-middle training-sample construction (Bavarian et al.
    2022, PSM form): each selected document splits at two deterministic
    character offsets into (prefix, middle, suffix) and re-serializes as
    ``<PRE>prefix<SUF>suffix<MID>middle`` — the middle moves to the end
    so an autoregressive LM learns infilling; unselected documents pass
    through unchanged (``fim=false``).

    Determinism contract (the :mod:`sample` md5 policy, not RNG): the
    apply decision is the 8-hex md5 draw vs ``rate_threshold(rate)``;
    the two cut offsets are independent 32-bit md5 words mod
    ``len+1`` (order-normalized, so prefix/middle/suffix tile the
    document exactly). Reruns, engines, and partitionings agree
    byte-for-byte; everything is a map-only catalyst expression — no
    UDF, no shuffle, no RNG. Returns (id, fim, sample)."""
    fim, sample = fim_exprs(rate, salt, text_col, id_col,
                            pre_tok, suf_tok, mid_tok)
    return df.select(
        F.col(id_col),
        F.expr(fim).alias("fim"),
        F.expr(f"CASE WHEN {fim} THEN {sample} ELSE {text_col} END")
        .alias("sample"))


# ------------------------------------------------- T5 span corruption

def span_corrupt(df: DataFrame, rate: float = 0.15, salt: str = "t5",
                 text_col: str = "text", id_col: str = "doc_id"
                 ) -> DataFrame:
    """T5-style span-corruption training-sample construction (Raffel et
    al., JMLR 2020 §3.1.4) — the denoising counterpart of
    :func:`fim_split`: masked token spans are replaced by sentinel
    tokens in the input, and the target enumerates each sentinel
    followed by the tokens it hid.

    Determinism contract (the :mod:`sample` md5 policy, no RNG): token
    position ``i`` of a document masks iff
    ``substr(md5('{doc_id}:{i}:{salt}'), 1, 8) <
    rate_threshold(rate)`` — per-token independent draws, so the
    expected corruption rate is ``rate`` and maximal runs of masked
    positions form the spans (geometric span lengths, vs the paper's
    fixed mean-3; documented divergence that keeps every draw
    SQL-restatable). Span ordinal K (0-based, in document order) gets
    sentinel ``<extra_id_K>``:

        input_text  = tokens with each masked run -> '<extra_id_K>'
        target_text = for each span: '<extra_id_K>' + its tokens

    both joined with single spaces; no trailing sentinel is appended
    (divergence from the paper's closing ``<extra_id_N>``, documented).
    Tokenization is the SQL-parity spec (lower -> [a-z0-9]+ runs).
    Returns (doc_id, n_tokens, n_masked, n_spans, input_text,
    target_text); 0-token documents emit zeros and empty strings.

    Scale shape: tokenization and every mask draw are map-only JVM
    codegen (md5 inside a ``transform`` lambda). Only the span
    grouping — a per-document prefix scan, which Catalyst has no
    linear-time expression for (an expression fold over arrays copies
    its accumulator: O(len^2)) — runs in ONE vectorized Arrow pass
    (cumsum over the precomputed boolean mask). No shuffle anywhere:
    the operator is a mapInPandas over scan partitions."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from index_spark.operators.sample import rate_threshold

    if not 0.0 < rate < 1.0:
        raise ValueError(f"rate must be in (0, 1), got {rate}")
    thr = rate_threshold(rate)
    toks = F.coalesce(
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda x: x != ""),
        F.array().cast("array<string>"))
    did = F.col(id_col).cast("long")
    # per-position draws, JVM-side. The index array comes from a
    # conditional sequence() over the ALREADY-PROJECTED token column —
    # never a per-element lambda that references the tokenization
    # expression (Catalyst inlines such references into the lambda and
    # re-splits the text once PER POSITION: the O(tokens^2)
    # InferFiltersFromGenerate-class trap measured in
    # contamination.doc_grams; a filter(seq, i -> i < size(toks)) here
    # benched 63 docs/s vs ~2k after this restructure)
    base = df.select(did.alias("doc_id"), toks.alias("toks"))
    n = F.size(F.col("toks"))
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
           .otherwise(F.array().cast("array<int>"))
    msk = F.transform(
        idx,
        lambda i: F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                           i.cast("string"), F.lit(":" + salt))),
            1, 8) < F.lit(thr))
    prepared = base.select("doc_id", "toks", msk.alias("msk"))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("n_masked", T.LongType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("input_text", T.StringType()),
        T.StructField("target_text", T.StringType()),
    ])

    def fn(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                t = list(row.toks)
                m = np.asarray(row.msk, dtype=bool)
                if not t:
                    out.append((row.doc_id, 0, 0, 0, "", ""))
                    continue
                prev = np.concatenate(([False], m[:-1]))
                starts = m & ~prev
                sid = np.cumsum(starts) - 1  # span ordinal at each pos
                inp, tgt = [], []
                for i, tok in enumerate(t):
                    if not m[i]:
                        inp.append(tok)
                    elif starts[i]:
                        s = f"<extra_id_{sid[i]}>"
                        inp.append(s)
                        tgt.append(s)
                        tgt.append(tok)
                    else:
                        tgt.append(tok)
                out.append((row.doc_id, len(t), int(m.sum()),
                            int(starts.sum()), " ".join(inp),
                            " ".join(tgt)))
            yield pd.DataFrame(out, columns=[f.name for f in schema])

    return prepared.mapInPandas(fn, schema=schema)
