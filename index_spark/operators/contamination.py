"""Exact n-gram contamination operators for training-data hygiene:
benchmark decontamination (train/test overlap) and duplicated-span
coverage (exact substring dedup, Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

Both operators run on word-level n-grams built ENTIRELY inside the JVM
(split -> filter -> transform/slice/concat_ws over the token array; no
Python in the plan), so gram construction stays in whole-stage codegen
and the only shuffles are the gram-keyed aggregate/join — the natural
cost shape for these ops at 100 TB:

- ``decontaminate``: the benchmark side is tiny relative to the corpus
  (an eval set, not another corpus), so its distinct gram relation is
  BROADCAST by default and the scan-side semi-join never shuffles the
  training corpus.  The per-doc overlap count is a map-side-combinable
  aggregate on doc_id.
- ``duplicated_spans``: the gram-frequency aggregate shuffles on the
  gram string — near-unique keys, no skew (a stop-gram cap bounds the
  few genuinely hot grams).  Coverage union is computed per doc by
  exploding each duplicated gram occurrence into its token indexes and
  counting distinct — bounded by doc length, never by corpus size.

Grams are grouped by their *string* so results are SQL-restatable (the
driver oracle recomputes them in DuckDB); at production scale pass
``hashed=True`` to shuffle 8-byte ``xxhash64(gram)`` keys instead of
strings (same verdicts up to 64-bit collisions, ~an order of magnitude
less shuffle IO for wide grams).

Tokenization matches the engine's SQL-parity spec
(functions/text.py simple_tokens: lower -> [a-z0-9]+ runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions.text import TOKENS_SQL as _TOKS  # noqa: E402


def _grams_expr(n: int, toks: str = "_toks") -> str:
    """SQL expr: array of n-gram strings over a token-array column
    (empty array when the doc has < n tokens — sequence() would count
    DOWN for a negative span, so the short case is guarded)."""
    return (f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
            f"ELSE array() END")


def doc_grams(df: DataFrame, n: int, text_col: str = "text",
              id_col: str = "doc_id", with_pos: bool = False) -> DataFrame:
    """One row per word n-gram occurrence: (doc_id, gram[, pos]).

    ``pos`` is the 1-based token ordinal of the gram's first word (the
    gram covers tokens [pos, pos+n-1]). All JVM: split/filter/
    transform/slice/concat_ws, then (pos)explode."""
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.expr(_TOKS.format(col=text_col)).alias("_toks"))
    d = d.select("doc_id", F.expr(_grams_expr(n)).alias("_grams"))
    # OUTER explode on purpose: a plain explode triggers Catalyst's
    # InferFiltersFromGenerate, whose size(...)>0 filter substitutes the
    # WHOLE gram expression through the projections — tokenization lands
    # inside the transform lambda and re-evaluates PER ELEMENT, turning
    # gram generation O(tokens^2) per doc (measured 20x on 1.5k-token
    # docs). Outer generates infer no filter; the empty/null rows are
    # dropped by a cheap post-generate IS NOT NULL instead.
    if with_pos:
        return (d.select("doc_id", F.posexplode_outer("_grams")
                         .alias("_p", "gram"))
                .filter(F.col("gram").isNotNull())
                .select("doc_id",
                        (F.col("_p") + 1).cast("long").alias("pos"),
                        "gram"))
    return (d.select("doc_id", F.explode_outer("_grams").alias("gram"))
            .filter(F.col("gram").isNotNull()))


def remove_duplicated_spans(df: DataFrame, n: int = 16, min_count: int = 2,
                            text_col: str = "text", id_col: str = "doc_id",
                            hashed: bool = False,
                            max_gram_df: int | None = None) -> DataFrame:
    """Exact duplicated-span REMOVAL (Lee et al. 2022 §4 — the rewrite
    their coverage statistic gates): drop every token covered by a word
    n-gram occurring >= ``min_count`` times corpus-wide, and
    re-serialize the survivors.

    Returns (doc_id, n_tokens, kept_tokens, clean_text): ``clean_text``
    is the doc's remaining tokens joined by single spaces (the
    normalized surface form the curation pipeline already emits);
    ``kept_tokens = len(clean)``. Empty docs and fully-duplicated docs
    yield ``clean_text = ''`` — pair with a min-length gate downstream.

    Scale shape: same gram-frequency shuffle as
    :func:`duplicated_spans` (near-unique keys; ``hashed=True`` for
    8-byte shuffle keys, ``max_gram_df`` to exempt boilerplate), one
    covered-position set per affected doc (bounded by the doc's own
    length), and an O(len) rewrite: ``array_except`` of the position
    range (hash-set membership, NOT a per-token linear scan over the
    drop list) followed by constant-time gathers.
    """
    occ = doc_grams(df, n, text_col, id_col, with_pos=True)
    key = F.xxhash64("gram").alias("k") if hashed else F.col("gram").alias("k")
    occ = occ.select("doc_id", "pos", key)
    freq = occ.groupBy("k").agg(F.count("*").alias("_c"))
    dup_keys = freq.filter(F.col("_c") >= min_count)
    if max_gram_df is not None:
        dup_keys = dup_keys.filter(F.col("_c") <= max_gram_df)
    dup_occ = occ.join(dup_keys.select("k"), "k")
    # 1-based covered-position sets, one row per affected doc
    drops = (dup_occ
             .select("doc_id", F.explode(
                 F.expr(f"sequence(pos, pos + {n - 1})")).alias("tok_ix"))
             .distinct()
             .groupBy("doc_id")
             .agg(F.collect_list("tok_ix").alias("_drop")))
    toks = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.expr(_TOKS.format(col=text_col)).alias("_toks"))
    # explicit empty guard: sequence(1, 0) DESCENDS in Spark; BIGINT
    # bounds keep array_except's element types aligned with _drop
    keep_expr = ("IF(size(_toks) = 0, CAST(array() AS ARRAY<BIGINT>), "
                 "array_except(sequence(CAST(1 AS BIGINT), "
                 "CAST(size(_toks) AS BIGINT)), _drop))")
    return (toks.join(drops, "doc_id", "left")
            .withColumn("_drop", F.coalesce(
                "_drop", F.expr("CAST(array() AS ARRAY<BIGINT>)")))
            .withColumn("_keep", F.expr(keep_expr))
            .select(
                "doc_id",
                F.size("_toks").cast("long").alias("n_tokens"),
                F.size("_keep").cast("long").alias("kept_tokens"),
                F.expr("array_join(transform(_keep, i -> _toks[int(i) - 1]),"
                       " ' ')").alias("clean_text")))


def decontaminate(train: DataFrame, bench: DataFrame, n: int = 8,
                  min_overlap: int = 1, text_col: str = "text",
                  id_col: str = "doc_id",
                  broadcast_bench: bool = True) -> DataFrame:
    """Benchmark decontamination: per TRAINING doc, how many of its
    distinct word n-grams appear anywhere in the benchmark set.

    Returns one row per train doc: (doc_id, n_overlap, contaminated)
    with ``contaminated = n_overlap >= min_overlap`` — the standard
    n-gram-collision test-set filter (GPT-3 app. C uses 13-grams; the
    default 8 matches the engine's shingle width). Docs with zero
    overlap keep a row (n_overlap=0) so the relation is a verdict per
    doc, same contract as curate_corpus.

    Scale shape: bench grams deduplicate to a small relation and are
    broadcast (set ``broadcast_bench=False`` if the "benchmark" is
    itself corpus-sized); the train side is a semi-join + one
    map-side-combinable count per doc_id."""
    bg = doc_grams(bench, n, text_col, id_col).select("gram").distinct()
    if broadcast_bench:
        bg = F.broadcast(bg)
    tg = doc_grams(train, n, text_col, id_col).distinct()
    hits = (tg.join(bg, "gram")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_overlap")))
    ids = train.select(F.col(id_col).cast("long").alias("doc_id"))
    return (ids.join(hits, "doc_id", "left")
               .select("doc_id",
                       F.coalesce("n_overlap", F.lit(0)).cast("long")
                        .alias("n_overlap"))
               .withColumn("contaminated",
                           F.col("n_overlap") >= min_overlap))


def duplicated_spans(df: DataFrame, n: int = 16, min_count: int = 2,
                     text_col: str = "text", id_col: str = "doc_id",
                     hashed: bool = False,
                     max_gram_df: int | None = None) -> DataFrame:
    """Exact duplicated-span coverage (Lee et al. 2022 §3, word-level):
    per doc, how many of its tokens sit inside some word n-gram that
    occurs >= ``min_count`` times across the whole corpus.

    Returns (doc_id, n_tokens, dup_tokens, dup_ratio): ``dup_tokens``
    is the size of the UNION of [pos, pos+n-1] over the doc's
    duplicated-gram occurrences (overlapping spans counted once), and
    ``dup_ratio = dup_tokens / n_tokens`` (0.0 for empty docs) — the
    per-doc statistic a span-removal / doc-drop policy thresholds on.

    ``hashed=True`` swaps the shuffle key for xxhash64(gram) (8 bytes
    instead of the gram string; not SQL-restatable). ``max_gram_df``
    caps pathological grams (boilerplate repeated millions of times):
    grams above the cap still count as duplicated but their occurrence
    lists are already bounded per doc, so no reducer sees corpus-sized
    state either way."""
    occ = doc_grams(df, n, text_col, id_col, with_pos=True)
    key = F.xxhash64("gram").alias("k") if hashed else F.col("gram").alias("k")
    occ = occ.select("doc_id", "pos", key)
    freq = occ.groupBy("k").agg(F.count("*").alias("_c"))
    dup_keys = freq.filter(F.col("_c") >= min_count)
    if max_gram_df is not None:
        dup_keys = dup_keys.filter(F.col("_c") <= max_gram_df)
    dup_occ = occ.join(dup_keys.select("k"), "k")
    covered = (dup_occ
               .select("doc_id", F.explode(
                   F.expr(f"sequence(pos, pos + {n - 1})")).alias("tok_ix"))
               .distinct()
               .groupBy("doc_id")
               .agg(F.count("*").cast("long").alias("dup_tokens")))
    lens = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.expr(_TOKS.format(col=text_col))).cast("long")
         .alias("n_tokens"))
    return (lens.join(covered, "doc_id", "left")
                .select("doc_id", "n_tokens",
                        F.coalesce("dup_tokens", F.lit(0)).cast("long")
                         .alias("dup_tokens"))
                .withColumn("dup_ratio", F.when(
                    F.col("n_tokens") > 0,
                    F.round(F.col("dup_tokens") / F.col("n_tokens"), 4))
                    .otherwise(F.lit(0.0))))


def remove_duplicated_lines(df: DataFrame, min_docs: int = 2,
                            text_col: str = "text", id_col: str = "doc_id",
                            sep: str = "\n",
                            hashed: bool = False) -> DataFrame:
    """Line-wise deduplication (CCNet / RefinedWeb "line-level dedup"):
    drop every line whose EXACT text appears in >= ``min_docs`` distinct
    documents, and re-serialize the survivors in order.  The classic
    boilerplate filter — navigation bars, license headers, cookie
    banners repeat verbatim across pages while real prose does not.

    Returns one row per input doc: (doc_id, text, n_lines, n_kept,
    n_dropped) where ``text`` is the kept lines re-joined with ``sep``
    (a fully-deduplicated doc keeps its row with text = '' — pair with
    a min-length gate downstream, same contract as
    :func:`remove_duplicated_spans`).

    Matching is exact (no trim/casefold), so the operator is
    SQL-restatable and the driver oracle recomputes it verbatim;
    normalize upstream if fuzzier matching is wanted.  Empty lines
    count like any other line (blank-line runs shared by >= min_docs
    docs are boilerplate by this definition).

    Scale shape: one explode + line-keyed aggregate (near-unique keys;
    ``hashed=True`` shuffles 8-byte xxhash64 keys instead of line
    strings — same verdicts up to 64-bit collisions), one anti-join,
    and a per-doc ordered reassembly bounded by the doc's own line
    count.  No Python anywhere in the plan.
    """
    import re as _re

    # ``sep`` is a LITERAL separator: F.split takes a Java regex, so
    # escape it — an unescaped "|" would split on the regex alternation
    # while array_join re-joins literally, corrupting the rebuild
    sp = F.split(F.col(text_col), _re.escape(sep), -1)
    # OUTER explode: same InferFiltersFromGenerate O(n^2) guard as
    # doc_grams (the split would re-evaluate per element otherwise)
    lines = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.posexplode_outer(sp).alias("pos", "line"))
             .filter(F.col("line").isNotNull()))
    key = F.xxhash64("line").alias("k") if hashed else F.col("line").alias("k")
    lines = lines.select("doc_id", "pos", key, "line")
    dup = (lines.groupBy("k")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= min_docs)
           .select("k"))
    kept = lines.join(dup, "k", "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "line"))),
                           lambda x: x["line"]), sep).alias("_kept_text"),
                    F.count("*").cast("long").alias("n_kept")))
    # size(split(NULL)) is -1, not 0 — a NULL-text doc has zero lines
    base = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.when(F.col(text_col).isNull(), F.lit(0))
                      .otherwise(F.size(sp)).cast("long").alias("n_lines"))
    return (base.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("_kept_text", F.lit("")).alias(text_col),
                    "n_lines",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                     .alias("n_kept"),
                    (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
                    .cast("long").alias("n_dropped")))


def bloom_decontaminate(train: DataFrame, bench: DataFrame, n: int = 8,
                        min_overlap: int = 1, text_col: str = "text",
                        id_col: str = "doc_id",
                        m_bits: int | None = None,
                        k: int = 5) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter — the 100-TB form.
    Broadcasting the benchmark GRAM SET scales with the benchmark
    (10^8 grams ≈ gigabytes on every executor); broadcasting its BLOOM
    BITS is a fixed ~1 MiB closure whatever the benchmark size.  Train
    grams probe the bits first (vectorized Arrow bit lookups, JVM
    hashes identical to the build), and only the bloom-POSITIVE grams
    — true overlaps plus the ~(1-e^{-kn/m})^k false-positive sliver —
    reach the exact semi-join, so the join input shrinks to roughly
    the contamination rate.  False positives are removed by the exact
    join; the VERDICTS ARE IDENTICAL to :func:`decontaminate`
    (test-pinned), which is why the oracle is the plain exact-overlap
    restatement.

    ``m_bits`` defaults to the next power of two ≥ 16× the benchmark
    gram count (k=5 → ~2% FP rate), computed from one count on the
    already-needed distinct gram relation."""
    from index_spark.operators.sketch import bloom_bits, bloom_maybe_filter

    bg = doc_grams(bench, n, text_col, id_col).select("gram").distinct()
    bg = bg.persist()
    if m_bits is None:
        n_grams = max(bg.count(), 1)
        m_bits = 1 << max(int(n_grams * 16 - 1).bit_length(), 6)
    bits = bloom_bits(bg, "gram", m_bits=m_bits, k=k)
    tg = doc_grams(train, n, text_col, id_col).distinct()
    cand = bloom_maybe_filter(tg, "gram", bits, k=k)
    # NO broadcast hint on the exact verify join: the whole point of
    # the bloom tier is that the benchmark gram relation is too large
    # to ship to every executor — shuffle both (small) sides on gram
    # and let AQE pick; only bloom-positive grams reach this join
    hits = (cand.join(bg, "gram")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_overlap")))
    ids = train.select(F.col(id_col).cast("long").alias("doc_id"))
    out = (ids.join(hits, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("n_overlap", F.lit(0)).cast("long")
                   .alias("n_overlap"))
           .withColumn("contaminated",
                       F.col("n_overlap") >= min_overlap))
    return out


def fuzzy_decontaminate(train: DataFrame, bench: DataFrame, n: int = 3,
                        threshold: float = 0.5, text_col: str = "text",
                        id_col: str = "doc_id",
                        mode: str = "auto") -> DataFrame:
    """NEAR-duplicate benchmark decontamination: per TRAIN doc, the
    maximum token n-gram Jaccard to ANY benchmark doc at or above
    ``threshold`` — the fuzzy companion to :func:`decontaminate`'s
    exact n-gram collision test, which misses a benchmark item that
    was lightly paraphrased or reformatted into the crawl.

    Returns one row per train doc (the verdict-per-doc contract of
    the hygiene tier): (doc_id, bench_id, jaccard, contaminated) —
    ``bench_id`` the argmax-J benchmark doc (ties -> smallest id) and
    ``jaccard`` its similarity when ``contaminated``, NULL otherwise
    (pairs below threshold are never generated, so sub-threshold
    maxima are unknowable by design — that is what keeps the join
    bounded).

    Scale shape: candidate generation is the PPJoin-prefix R-S
    similarity join (:func:`~index_spark.operators.dedup.
    cross_jaccard_pairs` — shared-order prefix filtering, no quadratic
    stop-gram join); the per-doc argmax is a lexicographic struct-max
    aggregate, never a window over train docs."""
    from index_spark.operators.dedup import cross_jaccard_pairs

    pairs = cross_jaccard_pairs(train, bench, n=n, threshold=threshold,
                                text_col=text_col, id_col=id_col,
                                mode=mode)
    best = (pairs.groupBy(F.col("left_id").alias("doc_id"))
            .agg(F.max(F.struct(F.col("jaccard"),
                                (-F.col("right_id")).alias("neg"),
                                F.col("right_id").alias("bench_id")))
                 .alias("m"))
            .select("doc_id", F.col("m.bench_id").alias("bench_id"),
                    F.col("m.jaccard").alias("jaccard")))
    ids = train.select(F.col(id_col).cast("long").alias("doc_id"))
    return (ids.join(best, "doc_id", "left")
            .select("doc_id", "bench_id", "jaccard")
            .withColumn("contaminated", F.col("jaccard").isNotNull()))
