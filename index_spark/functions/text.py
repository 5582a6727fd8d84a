"""Text normalization + tokenization (build-side and query-side share this).

Mirrors the capability of the reference normalizer
(/root/reference/stemmer/stemmer.cpp:89-113: utf8proc NFKD + compatibility
+ casefold + strip combining marks, then keep only [a-z0-9]) re-expressed
for Python/Arrow:

- ``normalize_text``: NFKD -> casefold -> drop combining marks (so
  ``café`` -> ``cafe``, ``Größe`` -> ``grosse``).
- ``tokenize``: split camelCase / snake_case identifiers (source-code
  corpus; FIXTURES.md §1 requires identifier splitting), then extract
  ``[a-z0-9]+`` runs.
- ``tokenize_simple``: the SQL-parity tokenizer — ``lower(text)`` split on
  ``[^a-z0-9]+`` — used by the DuckDB-oracle harness where both engines
  must agree exactly (no unicode folding, expressible in ANSI SQL).

The pandas UDF wrappers operate Series -> Series over Arrow batches; the
per-unique-vocabulary trick in :mod:`index_spark.functions.porter` keeps
stemming off the per-token path.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_TOKEN_RE = re.compile(r"[a-z0-9]+")

# The SQL-parity tokenizer spec (simple_tokens: lower -> split on
# [^a-z0-9]+ -> drop empties) as a Spark SQL expression template.  The
# ONE definition every pure-SQL operator (lm, bpe, contamination, the
# driver oracles) formats with its text column — change it here or
# engine/oracle parity silently breaks.
TOKENS_SQL = "filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"
# single-pass equivalent of camel-split + lower + [a-z0-9]+ extraction,
# valid on ASCII text: an acronym run, a Capitalized run, or a lower run
_FAST_RE = re.compile(
    r"[A-Z]{2,}[0-9][a-z0-9]*|[A-Z]{2,}(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")


_COMBINING_TABLE: dict | None = None


def _combining_table() -> dict:
    """str.translate deletion table of every combining codepoint, built
    once per process: mark-stripping then runs at C speed instead of a
    per-character ``unicodedata.combining`` generator (which dominated
    profiles on corpora with a non-ASCII sprinkle)."""
    global _COMBINING_TABLE
    if _COMBINING_TABLE is None:
        _COMBINING_TABLE = {
            cp: None for cp in range(0x110000)
            if unicodedata.combining(chr(cp))}
    return _COMBINING_TABLE


def normalize_text(s: str) -> str:
    """NFKD + casefold + strip combining marks (pinned normalizer).

    ASCII fast path: on ASCII input the full pipeline reduces to
    ``str.lower`` (NFKD and mark-stripping are identity, casefold ==
    lower), and source code is overwhelmingly ASCII — this skips the
    combining scan for the common case."""
    if s.isascii():
        return s.lower()
    d = unicodedata.normalize("NFKD", s).casefold()
    return d.translate(_combining_table())


def tokenize(text: str, stem: bool = False, camel: bool = True) -> list[str]:
    """Full build tokenizer: identifier split -> normalize -> [a-z0-9]+ runs.

    ASCII fast path does it in one findall (source code is ~all ASCII);
    rows with non-ASCII take the full camel-split -> NFKD -> extract
    pipeline so ``café``/``Größe`` fold correctly.

    ``camel=False`` disables identifier splitting — the tokenization then
    equals the SQL-parity spec (``lower`` -> ``[a-z0-9]+`` runs,
    :func:`simple_tokens` + unicode folding), which DuckDB/ANSI SQL can
    reproduce exactly; the engine-path oracle entries build with it."""
    from index_spark.functions.porter import stem_word

    if text.isascii():
        if camel:
            toks = [t.lower() for t in _FAST_RE.findall(text)]
        else:
            toks = _TOKEN_RE.findall(text.lower())
    else:
        split = _CAMEL_RE.sub(" ", text) if camel else text
        norm = normalize_text(split)
        toks = _TOKEN_RE.findall(norm)
    if stem:
        toks = [stem_word(t) for t in toks]
    return toks


def tokenize_flat(texts, stem: bool = True, camel: bool = True):
    """Tokenize a batch -> (flat_tokens ndarray[object], lens ndarray).

    Normalization runs per row (regex/str ops); stemming runs once per
    *unique* token of the whole batch via hash-based ``pd.factorize``
    (Zipf dedup — O(n), unlike sort-based np.unique which goes
    superlinear on multi-million-string object arrays)."""
    token_lists = [tokenize(t or "", camel=camel) for t in texts]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for lst in token_lists:
        flat[pos : pos + len(lst)] = lst
        pos += len(lst)
    if stem and flat.size:
        from index_spark.functions.porter import stem_word

        codes, uniques = pd.factorize(flat)
        stemmed = np.array([stem_word(w) for w in uniques], dtype=object)
        flat = stemmed[codes]
    return flat, lens


def tokenize_series(texts: pd.Series, stem: bool = True,
                    camel: bool = True) -> pd.Series:
    """Series[str] -> Series[list[str]] — body of the build pandas UDF."""
    flat, lens = tokenize_flat(texts, stem=stem, camel=camel)
    bounds = np.cumsum(lens)[:-1]
    out = [list(chunk) for chunk in np.split(flat, bounds)]
    return pd.Series(out, index=texts.index)


# ---------------------------------------------------------------------------
# Byte-level vectorized tokenizer (the build hot path).
#
# CPython string tokenization allocates one PyObject per token; at millions
# of tokens per Arrow batch the allocator/GC churn dominates and — worse —
# serializes across worker processes (page-fault and mmap syscalls are
# globally contended in sandboxed kernels), killing N->4N scaling. This
# path never materializes per-token strings: the batch's documents are
# joined into ONE ascii byte buffer, token boundaries are computed with
# shifted boolean masks (exactly the _FAST_RE camelCase semantics), and
# term identity comes from a fixed-width byte matrix + np.unique (exact —
# no hashing). Only the per-batch *unique vocabulary* (Zipf-small) ever
# becomes Python strings, for Porter stemming (lru-cached per worker).
# ---------------------------------------------------------------------------

# one LUT gather yields all four char classes as bit flags:
# 1 = alnum, 2 = upper, 4 = lower letter, 8 = lower-or-digit
_B_CLS = np.zeros(256, dtype=np.uint8)
for _c in range(ord("a"), ord("z") + 1):
    _B_CLS[_c] = 1 | 4 | 8
for _c in range(ord("A"), ord("Z") + 1):
    _B_CLS[_c] = 1 | 2
for _c in range(ord("0"), ord("9") + 1):
    _B_CLS[_c] = 1 | 8
_B_TOLOWER = np.arange(256, dtype=np.uint8)
_B_TOLOWER[ord("A"): ord("Z") + 1] += 32


def _prep_doc(s, camel: bool = True) -> str:
    """Normalize one document to an ascii-safe string whose byte-level
    tokenization equals ``tokenize(s)``.

    ascii docs pass through (camel splitting happens in the byte kernel);
    NUL bytes become spaces (both are non-alnum separators — token-
    equivalent — but NUL is reserved as the document joiner). non-ascii
    docs get the python path's exact pipeline prefix: camel-split FIRST
    (case information), then NFKD+casefold+strip-marks; any remaining
    non-ascii chars encode to '?' later — a separator, same as the python path
    dropping non-[a-z0-9] runs."""
    if not isinstance(s, str):
        s = "" if s is None else str(s)
    if s.isascii():
        return s.replace("\x00", " ") if "\x00" in s else s
    out = normalize_text(_CAMEL_RE.sub(" ", s) if camel else s)
    # NUL is the document joiner downstream; as a non-alnum separator the
    # swap to space is token-equivalent
    return out.replace("\x00", " ") if "\x00" in out else out


def _token_spans(buf: np.ndarray, force_starts: np.ndarray | None = None,
                 camel: bool = True):
    """Token (start, length) spans + camelCase boundaries over a byte buf.

    Reproduces _FAST_RE: a token starts at i when alnum[i] and either
    (a) i==0 or not alnum[i-1], (b) upper[i] and lower-or-digit[i-1]
    (camel boundary), or (c) upper[i] and upper[i-1] and lower[i+1]
    (acronym -> Word boundary, e.g. HTTPServer -> HTTP|Server).
    All masks are 0/1 uint8 bit arithmetic over one class-LUT gather.
    ``camel=False`` keeps only rule (a) — the SQL-parity tokenizer."""
    cls = _B_CLS[buf]
    a = cls & 1
    prev = np.empty_like(cls)  # reused shift workspace
    start = np.empty_like(cls)
    # start = a & ~prev_a
    prev[0] = 0
    prev[1:] = a[:-1]
    np.subtract(1, prev, out=start)
    if camel:
        u = (cls >> 1) & 1
        lo = (cls >> 2) & 1
        ld = (cls >> 3) & 1
        # |= u & prev_ld
        prev[1:] = ld[:-1]
        start |= u & prev
        # |= u & prev_u & next_lo
        prev[1:] = u[:-1]
        nxt = ld  # ld no longer needed; reuse as next_lo workspace
        nxt[-1] = 0
        nxt[:-1] = lo[1:]
        if force_starts is not None and force_starts.size:
            # a doc's last byte must not see the NEXT doc's first byte as
            # lookahead (acronym rule would split "...ABC"|"d..." wrongly)
            nxt[force_starts - 1] = 0
        start |= u & prev & nxt
    start &= a
    if force_starts is not None and force_starts.size:
        # document boundaries in a separator-less stream: force a token
        # break at each doc start so tokens never span documents
        start[force_starts] |= a[force_starts]
    starts = np.flatnonzero(start)
    if starts.size == 0:
        return starts, starts
    np.subtract(1, a, out=prev)  # non-alnum
    start |= prev
    stops = np.flatnonzero(start)
    pos = np.searchsorted(stops, starts, side="right")
    ends = np.where(pos < stops.size, stops[np.minimum(pos, stops.size - 1)],
                    buf.size)
    return starts, ends - starts


def _win8(buf_pad: np.ndarray, starts: np.ndarray, tok_len: np.ndarray,
          offset: int) -> np.ndarray:
    """u64 key = bytes [offset, offset+8) of each token, zero-padded.

    One strided-window fancy-index gather (no index matrix); equality of
    keys == equality of those 8 bytes, exactly."""
    from numpy.lib.stride_tricks import as_strided

    win = as_strided(buf_pad, shape=(buf_pad.size - 7, 8), strides=(1, 1))
    g = win[starts + offset] if offset else win[starts]
    rel = np.arange(offset, offset + 8, dtype=np.int64)
    g[rel[None, :] >= tok_len[:, None]] = 0
    return g.view("<u8").ravel()


def _term_codes(buf_lower: np.ndarray, starts: np.ndarray,
                tok_len: np.ndarray):
    """Exact per-token term codes + vocab, no per-token Python strings
    in the hot path.

    Short tokens (<= 8 bytes — ~99% of the stream once camelCase /
    snake_case splitting has run) are coded by their zero-padded little-
    endian u64 value via ONE hash factorize: no sort, no byte matrix,
    and the vocab string decodes straight from the key value. The rare
    longer tokens are materialized as bytes objects (a <1% subset) and
    factorized exactly; they can never collide with a short token since
    their lengths differ.
    """
    buf_pad = np.concatenate([buf_lower, np.zeros(8, dtype=np.uint8)])
    k1 = _win8(buf_pad, starts, tok_len, 0)
    codes, u1 = pd.factorize(k1)
    codes = codes.astype(np.int64, copy=False)
    vocab_parts = [b.decode("ascii", "replace")
                   for b in u1.astype("<u8").view("S8").tolist()]
    long_idx = np.flatnonzero(tok_len > 8)
    if long_idx.size:
        raw = buf_lower.tobytes()
        l_starts = starts[long_idx]
        l_len = tok_len[long_idx]
        long_keys = np.empty(long_idx.size, dtype=object)
        long_keys[:] = [raw[s:s + l] for s, l in zip(l_starts.tolist(),
                                                     l_len.tolist())]
        sub, ulong = pd.factorize(long_keys)
        codes[long_idx] = len(u1) + sub
        vocab_parts += [b.decode("ascii", "replace") for b in ulong.tolist()]
    return np.array(vocab_parts, dtype=object), codes


def _stem_vocab(vocab: np.ndarray, codes: np.ndarray):
    """Stem the unique vocab once (Zipf dedup), remap token codes."""
    from index_spark.functions.porter import stem_word

    stemmed = np.array([stem_word(w) for w in vocab.tolist()], dtype=object)
    vocab, smap = np.unique(stemmed, return_inverse=True)
    return vocab, smap[codes]


def _aggregate_counts(doc_of: np.ndarray, codes: np.ndarray,
                      vocab: np.ndarray, lens: np.ndarray,
                      positions: bool = False):
    """(per-token doc/code) -> per-(doc, term) counts, optionally with the
    flat occurrence-position stream.

    With ``positions``: ``pos`` holds, for each output (doc, term) pair in
    order, that pair's token ordinals within the document, ascending,
    concatenated (``count`` gives the per-pair lengths). Valid because
    every document's tokens form ONE contiguous run of the stream in
    appearance order, so a stable sort by (doc, term) keeps positions
    ascending within each pair.
    """
    v = np.int64(vocab.size)
    key = doc_of * v + codes
    if not positions:
        uk, cnt = np.unique(key, return_counts=True)
        return (vocab, (uk // v).astype(np.int64),
                (uk % v).astype(np.int64), cnt.astype(np.int64), lens)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    gs = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
    uk = ks[gs]
    cnt = np.diff(np.concatenate((gs, [ks.size]))).astype(np.int64)
    runs = np.concatenate(([0], np.flatnonzero(np.diff(doc_of) != 0) + 1))
    run_of = np.searchsorted(runs, np.arange(doc_of.size), side="right") - 1
    tok_pos = np.arange(doc_of.size, dtype=np.int64) - runs[run_of]
    return (vocab, (uk // v).astype(np.int64), (uk % v).astype(np.int64),
            cnt, lens, tok_pos[order])


def term_counts_batch(texts, stem: bool = True, camel: bool = True):
    """Batch kernel: documents -> (vocab, doc_idx, term_code, count, lens).

    The build's fused tokenize+count stage, fully vectorized:
      - ``vocab``: object ndarray of (stemmed) unique terms of the batch
      - ``doc_idx``/``term_code``/``count``: one row per (document, term)
        with the term frequency; term_code indexes ``vocab``
      - ``lens``: per-document token counts (BM25 doc_len)

    Token/stem semantics are byte-identical to ``tokenize(text, stem,
    camel)`` (property-tested); documents may be None/non-ascii/NUL-bearing.
    """
    n = len(texts)
    lens = np.zeros(n, dtype=np.int64)
    empty = (np.empty(0, dtype=object), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64), lens)
    if n == 0:
        return empty
    joined = "\x00".join(_prep_doc(t, camel=camel) for t in texts)
    buf = np.frombuffer(joined.encode("ascii", "replace"), dtype=np.uint8)
    starts, tok_len = _token_spans(buf, camel=camel)
    if starts.size == 0:
        return empty
    sep_idx = np.flatnonzero(buf == 0)
    doc_of = np.searchsorted(sep_idx, starts).astype(np.int64)
    lens = np.bincount(doc_of, minlength=n).astype(np.int64)
    vocab, codes = _term_codes(_B_TOLOWER[buf], starts, tok_len)
    if stem and vocab.size:
        vocab, codes = _stem_vocab(vocab, codes)
    return _aggregate_counts(doc_of, codes, vocab, lens)


def term_counts_stream(buf: np.ndarray, bounds: np.ndarray,
                       stem: bool = True, camel: bool = True,
                       positions: bool = False):
    """Like :func:`term_counts_batch`, but over a raw UTF-8 byte stream —
    the zero-copy Arrow path.

    ``buf`` is the concatenation of n documents' UTF-8 bytes (exactly an
    Arrow StringArray data buffer); ``bounds`` is int64[n+1] document
    boundaries (the Arrow offsets). No separators exist between docs, so
    token starts are forced at every document boundary. Documents
    containing non-ascii bytes or NUL (rare in source code) are detected
    vectorized, zeroed out of the stream, and re-appended through the
    normalizing python path — semantics stay byte-identical to
    ``tokenize``.

    ``positions=True`` appends a 6th element: the flat occurrence-
    position stream (see :func:`_aggregate_counts`) powering
    phrase/proximity postings.
    """
    n = bounds.size - 1
    zero_lens = np.zeros(n, dtype=np.int64)
    empty = (np.empty(0, dtype=object), np.empty(0, np.int64),
             np.empty(0, np.int64), np.empty(0, np.int64), zero_lens)
    if positions:
        empty = empty + (np.empty(0, np.int64),)
    if n == 0 or buf.size == 0:
        return empty
    bad_pos = np.flatnonzero((buf >= 0x80) | (buf == 0))
    main_len = buf.size
    if bad_pos.size:
        bad_docs = np.unique(
            np.searchsorted(bounds, bad_pos, side="right") - 1)
        work = buf.copy()
        fb_texts = []
        for b in bad_docs.tolist():
            lo, hi = int(bounds[b]), int(bounds[b + 1])
            fb_texts.append(bytes(buf[lo:hi]).decode("utf-8", "replace"))
            work[lo:hi] = 0
        fb_buf = np.frombuffer(
            ("\x00".join(_prep_doc(t, camel=camel) for t in fb_texts))
            .encode("ascii", "replace"), dtype=np.uint8)
        full = np.concatenate([work, np.zeros(1, dtype=np.uint8), fb_buf])
    else:
        bad_docs = None
        full = buf
    force = bounds[1:-1][(bounds[1:-1] > 0) & (bounds[1:-1] < main_len)]
    starts, tok_len = _token_spans(full, force_starts=force.astype(np.int64),
                                   camel=camel)
    if starts.size == 0:
        return empty
    if bad_docs is None:
        doc_of = (np.searchsorted(bounds, starts, side="right") - 1).astype(np.int64)
    else:
        split = int(np.searchsorted(starts, main_len))
        doc_of = np.empty(starts.size, dtype=np.int64)
        doc_of[:split] = np.searchsorted(bounds, starts[:split],
                                         side="right") - 1
        fb_seps = np.flatnonzero(full[main_len:] == 0) + main_len
        doc_of[split:] = bad_docs[
            np.searchsorted(fb_seps, starts[split:], side="right") - 1]
    lens = np.bincount(doc_of, minlength=n).astype(np.int64)
    vocab, codes = _term_codes(_B_TOLOWER[full], starts, tok_len)
    if stem and vocab.size:
        vocab, codes = _stem_vocab(vocab, codes)
    return _aggregate_counts(doc_of, codes, vocab, lens, positions=positions)


def simple_tokens(text: str) -> list[str]:
    """SQL-parity tokenizer: lower, split on non-[a-z0-9], drop empties.

    Equivalent Spark SQL:  filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')
    Equivalent DuckDB SQL: list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
    """
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


# ---------------------------------------------------------------------------
# CJK bigram tokenization (Lucene CJKAnalyzer)
# ---------------------------------------------------------------------------

#: Combined Han + Hiragana + Katakana + Hangul class.  CJK scripts have
#: no whitespace word boundaries, so the [a-z0-9] tokenizer silently
#: DROPS these runs; the classic recall-preserving treatment (Lucene
#: ``CJKAnalyzer`` / ES ``cjk_bigram`` token filter) indexes every
#: overlapping character bigram instead.  The class is a literal
#: codepoint range shared verbatim with the DuckDB oracles (both
#: engines' regex handles unicode ranges identically — pinned by test).
CJK_CLASS = "[一-鿿぀-ゟ゠-ヿ가-힯]"


def cjk_bigrams_expr(col):
    """Array-of-terms Column: every overlapping character bigram of
    each maximal CJK run in ``col`` (a run of length 1 emits its single
    character — the isolated-unigram rule).  Pure Catalyst
    (regexp_extract_all + transform + substr) — no UDF, no shuffle;
    ``substr`` is character-based in both Spark and DuckDB, so the
    SQL restatement is mechanical."""
    from pyspark.sql import functions as F

    runs = F.regexp_extract_all(col, F.lit(CJK_CLASS + "+"), 0)
    return F.flatten(F.transform(
        runs,
        lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(r) - 1),
                        lambda i: F.substr(r, i, F.lit(2))))))


def cjk_term_counts(df, text_col: str = "text",
                    id_col: str = "doc_id"):
    """(doc_id, term, tf) over the CJK bigram terms of each document —
    the per-doc postings shape of :func:`cjk_bigrams_expr`.  Docs with
    no CJK text produce no rows.  One explode + one map-side-combinable
    groupBy; integrates with the engine as a SECONDARY token stream
    (index CJK bigrams alongside the [a-z0-9] stream, the CJKAnalyzer
    composition) rather than changing the pinned latin tokenizer."""
    from pyspark.sql import functions as F

    return (df.select(F.col(id_col).cast("long").alias("doc_id"),
                      F.explode(cjk_bigrams_expr(F.col(text_col)))
                      .alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("tf")))


_CJK_RUN_RE = re.compile("[一-鿿぀-ゟ゠-ヿ가-힯]+")


def cjk_query_terms(query: str, stem: bool = True,
                    camel: bool = True) -> list[str]:
    """Mixed-analyzer query tokenization: the latin tokens of
    :func:`tokenize` PLUS the CJK bigrams of every CJK run (isolated
    chars stay unigrams) — the query-side twin of
    :func:`cjk_bigrams_expr`, for searching an index built by
    ``build_cjk_index``.  Sorted-distinct."""
    lat = tokenize(query, stem=stem, camel=camel)
    cjk: list[str] = []
    for r in _CJK_RUN_RE.findall(query):
        if len(r) == 1:
            cjk.append(r)
        else:
            cjk.extend(r[i:i + 2] for i in range(len(r) - 1))
    return sorted(set(lat) | set(cjk))
