"""Trigram-indexed substring search over raw document text — "grep at
corpus scale", the classic code-search design (R. Cox, "Regular
Expression Matching with a Trigram Index", 2012; Google Code Search /
Zoekt use the same shape).

Token inverted indexes cannot answer substring queries: ``strcpy(``
or ``tableName.`` cross token boundaries and the tokenizer's [a-z0-9]
normalization destroys the bytes being grepped. The trigram index is
the complement:

  * index side: one row per DISTINCT character 3-gram per doc —
    ``(gram, doc_id)``. Text is indexed byte-exact (no lowercasing,
    no tokenization), so the verify step is plain ``contains``;
  * query side: a pattern of length >= 3 must contain ALL of its
    character trigrams, so candidates = docs containing every distinct
    pattern gram (count gate over an IN-probed equi-join — only the
    pattern's gram postings are read, same pushdown shape as
    plans/trigram.py); the exact ``contains(text, pattern)`` predicate
    then verifies candidates only;
  * regex side: a regex's REQUIRED literal runs (literals every match
    must contain, extracted conservatively) gate candidates the same
    way before the ``rlike`` verify. A regex with no literal run >= 3
    chars falls back to the full scan — same contract as Cox's
    "trigram query = ANY".

Scale shape: the index is a distinct-gram relation (bounded by
text bytes), range-partitioned + sorted by gram at rest so the
query-side IN-list row-group-prunes; the candidate gate is one
map-side-combinable count; verification joins the (small) candidate
id set back to the corpus — a semi-join, never a full-text scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QGRAM = 3


def char_trigrams(s: str) -> list[str]:
    """Driver-side distinct character trigrams of a pattern, in first-
    occurrence order."""
    seen: dict[str, None] = {}
    for i in range(len(s) - QGRAM + 1):
        seen.setdefault(s[i:i + QGRAM])
    return list(seen)


def build_substring_index(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """(gram, doc_id): one row per distinct character 3-gram per doc,
    byte-exact. Outer explode (a plain explode's inferred size-filter
    would re-evaluate the gram transform per element — the
    InferFiltersFromGenerate trap measured in contamination.doc_grams).
    Docs shorter than 3 chars contribute no rows (they can never match
    a >=3-char pattern through the index; the <3 fallback scans)."""
    grams = F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - "
        f"{QGRAM - 1}, 0)), i -> substring({text_col}, i, {QGRAM}))"))
    return (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        F.explode_outer(grams).alias("gram"))
            .filter(F.col("gram").isNotNull()))


def write_substring_index(trgm: DataFrame, path: str,
                          n_partitions: int | None = None) -> None:
    """Sorted-by-gram at rest: every file covers a contiguous gram
    range, so a pattern's IN-list probe row-group-prunes."""
    out = (trgm.repartitionByRange(F.col("gram"), F.col("doc_id"))
           if n_partitions is None
           else trgm.repartitionByRange(n_partitions, F.col("gram"),
                                        F.col("doc_id")))
    out.sortWithinPartitions("gram", "doc_id") \
       .write.mode("overwrite").parquet(path)


def substring_candidates(trgm: DataFrame, pattern: str) -> DataFrame:
    """doc_ids containing EVERY distinct trigram of ``pattern`` — the
    necessary-condition gate (may over-generate across gram
    boundaries; never misses a true match). Pattern must be >= 3
    chars."""
    grams = char_trigrams(pattern)
    if not grams:
        raise ValueError(
            f"pattern shorter than {QGRAM} chars has no trigrams; "
            "use substring_search (it falls back to a scan)")
    return (trgm.filter(F.col("gram").isin(grams))
            .groupBy("doc_id")
            .agg(F.count_distinct("gram").alias("_n"))
            .filter(F.col("_n") == len(grams))
            .select("doc_id"))


def substring_search(docs: DataFrame, pattern: str,
                     trgm: DataFrame | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact substring (grep) match set:
    (doc_id, n_occurrences) for every doc whose text contains
    ``pattern`` byte-exactly.

    With ``trgm`` (the at-rest gram index) and a pattern >= 3 chars,
    only candidate docs are verified — the corpus text column is read
    for the candidate semi-join only. Without it (or for short
    patterns) the verify runs as a full scan filter."""
    if not pattern:
        raise ValueError("empty pattern")
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("_t"))
    if trgm is not None and len(pattern) >= QGRAM:
        cand = substring_candidates(trgm, pattern)
        d = d.join(cand, "doc_id")
    p = F.lit(pattern)
    return (d.filter(F.contains(F.col("_t"), p))
            .select("doc_id",
                    ((F.length("_t")
                      - F.length(F.replace(F.col("_t"), p, F.lit(""))))
                     / len(pattern)).cast("long").alias("n_occurrences"))
            .orderBy("doc_id"))


def regex_literal_runs(pattern: str) -> list[str]:
    """Conservative REQUIRED literal runs of a regex: maximal runs of
    plain characters outside classes/groups, truncated at any
    metacharacter; a run followed by ``* ? {`` drops its last char
    (that char is optional/repeated). Returns runs >= QGRAM chars.
    Alternation at top level defeats the requirement entirely (either
    branch may match), so a bare ``|`` returns []."""
    if re.search(r"(?<!\\)\|", pattern):
        return []
    runs: list[str] = []
    cur: list[str] = []
    i, n = 0, len(pattern)
    metas = set(".^$*+?{}[]()|\\")
    while i < n:
        c = pattern[i]
        if c == "\\":
            # escaped char: literal, but class escapes (\d \w \s...)
            # are not fixed literals — end the run
            if i + 1 < n and pattern[i + 1] in metas:
                cur.append(pattern[i + 1])
                i += 2
                continue
            cur = []
            i += 2
            continue
        if c in metas:
            if c in "*?{" and cur:
                cur.pop()  # the preceding char is optional/repeated
            if cur:
                runs.append("".join(cur))
            cur = []
            # skip bracket classes wholesale
            if c == "[":
                j = pattern.find("]", i + 1)
                i = (j if j != -1 else n) + 1
                continue
            i += 1
            continue
        cur.append(c)
        i += 1
    if cur:
        runs.append("".join(cur))
    return [r for r in runs if len(r) >= QGRAM]


def grep_search(docs: DataFrame, pattern: str, regex: bool = False,
                trgm: DataFrame | None = None, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """grep/egrep over the corpus: (doc_id) rows whose text matches.
    Literal mode delegates to :func:`substring_search`; regex mode
    gates candidates on the pattern's required literal runs (each run
    gives an independent all-grams condition; a doc must satisfy every
    run) before the exact ``rlike`` verify — a regex with no >=3-char
    literal run scans (documented Cox fallback)."""
    if not regex:
        return substring_search(docs, pattern, trgm, text_col,
                                id_col).select("doc_id")
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("_t"))
    if trgm is not None:
        for run in regex_literal_runs(pattern):
            d = d.join(substring_candidates(trgm, run), "doc_id")
    return (d.filter(F.col("_t").rlike(pattern))
            .select("doc_id").orderBy("doc_id"))


def grep_lines(docs: DataFrame, pattern: str, regex: bool = False,
               trgm: DataFrame | None = None, text_col: str = "text",
               id_col: str = "doc_id", context: int = 0) -> DataFrame:
    """``grep -n`` over the corpus: (doc_id, line_no, line) for every
    LINE matching the pattern — the code-search result shape (Zoekt /
    Sourcegraph return line matches, not documents; ``line_no`` is
    1-based). ``context=N`` is ``grep -C N``: lines within N of a
    match also emit, with an ``is_match`` column separating hits from
    context (a context line that itself matches reports is_match).

    Candidate docs gate through the trigram index exactly like
    :func:`grep_search` — a line match implies a doc match, so
    doc-level gram pruning is lossless — and only candidates' text
    splits into lines (outer posexplode, the InferFiltersFromGenerate
    guard) before the exact per-line predicate verifies. At corpus
    scale the expensive part (line explode + predicate) therefore runs
    over the gram-pruned candidate set, not the corpus; patterns too
    short for the gram gate (< 3 chars, or a regex with no >=3-char
    literal run) scan — the documented Cox fallback.

    Context shape: line numbers are DENSE per doc (every line emits),
    so "within N lines of a match" is a per-doc window —
    ``max(is_match) over rowsBetween(-N, N)`` — ONE pass over the
    line relation with no self-join, no distinct, and the predicate
    evaluated exactly once per line (the join formulation re-scanned
    the exploded relation on both sides)."""
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("_t"))
    if trgm is not None:
        if regex:
            for run in regex_literal_runs(pattern):
                d = d.join(substring_candidates(trgm, run), "doc_id")
        elif len(pattern) >= QGRAM:
            d = d.join(substring_candidates(trgm, pattern), "doc_id")
    lines = (d.select("doc_id",
                      F.posexplode_outer(F.split("_t", "\n", -1))
                      .alias("_p", "line"))
             .filter(F.col("line").isNotNull())
             .select("doc_id",
                     (F.col("_p") + 1).cast("long").alias("line_no"),
                     "line"))
    pred = (F.col("line").rlike(pattern) if regex
            else F.col("line").contains(pattern))
    if context < 0:
        raise ValueError(f"context must be >= 0, got {context}")
    if context == 0:
        return lines.filter(pred).orderBy("doc_id", "line_no")
    from pyspark.sql import Window

    w = (Window.partitionBy("doc_id").orderBy("line_no")
         .rowsBetween(-context, context))
    tagged = lines.withColumn("is_match", pred)
    return (tagged
            .withColumn("_near",
                        F.max(F.col("is_match").cast("int")).over(w))
            .filter(F.col("_near") == 1)
            .select("doc_id", "line_no", "line", "is_match")
            .orderBy("doc_id", "line_no"))


# ------------------------------------------------------------- symbols

# ctags-lite definition patterns: (kind, regex with the symbol in
# group 1). Kept to syntax shared by Java regex (Spark) and RE2-style
# engines (DuckDB) — no backrefs, no lookbehind — so an oracle can
# restate extraction with the SAME pattern strings. Order is the
# emission order for equal symbols of different kinds.
SYMBOL_PATTERNS: list[tuple[str, str]] = [
    # python / coffeescript-style
    ("function", r"\bdef\s+([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    # js / ts / php
    ("function", r"\bfunction\s+([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    # go (plain and method-receiver forms)
    ("function", r"\bfunc\s+(?:\([^)]*\)\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\("),
    # python / java / scala / js classes
    ("class", r"\bclass\s+([A-Za-z_][A-Za-z0-9_]*)"),
    # c / go / rust structs
    ("struct", r"\bstruct\s+([A-Za-z_][A-Za-z0-9_]*)"),
]


def extract_symbols(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    patterns: list[tuple[str, str]] | None = None
                    ) -> DataFrame:
    """Regex symbol-definition extraction — the ctags pass behind
    Zoekt/Sourcegraph symbol search (``type:symbol`` queries), reduced
    to the shared-regex kinds above. Returns one row per distinct
    (doc, kind, symbol) with its occurrence count:
    ``(doc_id, kind, symbol, n_defs)``.

    Scale shape: extraction is MAP-ONLY JVM codegen —
    ``regexp_extract_all`` per pattern, each wrapped into (kind,
    symbol) structs, concatenated, then ONE outer explode (plain
    explode's inferred size-filter re-evaluates the concat per element
    — the InferFiltersFromGenerate trap). The count is one combinable
    aggregate on (doc, kind, symbol); at 10^12 files nothing shuffles
    except the (bounded, defs-per-file) symbol rows themselves."""
    pats = SYMBOL_PATTERNS if patterns is None else patterns

    def _tag(kind: str):
        # a 2-arg transform lambda would receive (element, INDEX) —
        # bind the kind via closure, not a default parameter
        return lambda s: F.struct(F.lit(kind).alias("kind"),
                                  s.alias("symbol"))

    arrays = [
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(1)),
            _tag(kind))
        for kind, rx in pats
    ]
    exploded = (docs
                .select(F.col(id_col).cast("long").alias("doc_id"),
                        F.explode_outer(F.concat(*arrays)).alias("s"))
                .filter(F.col("s").isNotNull()))
    return (exploded
            .groupBy("doc_id", F.col("s.kind").alias("kind"),
                     F.col("s.symbol").alias("symbol"))
            .agg(F.count("*").cast("long").alias("n_defs")))


SYMBOL_KIND_WEIGHTS = {"class": 3.0, "struct": 3.0, "function": 2.0}


def symbol_search(symbols: DataFrame, query: str, k: int = 10,
                  weights: dict[str, float] | None = None,
                  prefix: bool = False) -> DataFrame:
    """Rank documents by symbol-DEFINITION matches — the code-search
    ranking rule that a file defining ``parse_config`` beats files
    merely mentioning it (Zoekt scores symbol matches above content
    matches). Query tokens match symbols exactly (or as prefixes with
    ``prefix=True``, the IDE go-to-symbol form); each matching
    definition contributes its kind's weight (class/struct above
    function — a type definition is the stronger navigation target):

        score(d) = sum over matching (kind, symbol) defs:
                   weight(kind) * n_defs

    Matching is case-insensitive on the symbol (queries are typed
    lowercase; definitions aren't). Scale shape: the symbol relation
    is the small derived artifact (defs-per-file rows, not tokens);
    the match predicate is a bounded disjunction pushed to its scan,
    prefix mode stays a ``StartsWith`` push; one combinable aggregate
    + TakeOrderedAndProject."""
    w = SYMBOL_KIND_WEIGHTS if weights is None else weights
    toks = [t for t in query.lower().split() if t]
    if not toks:
        spark = symbols.sparkSession
        return spark.createDataFrame(
            [], "doc_id long, score double")
    sym = F.lower(F.col("symbol"))
    if prefix:
        cond = F.lit(False)
        for t in toks:
            cond = cond | sym.startswith(t)
    else:
        cond = sym.isin(toks)
    wmap = F.create_map(*[F.lit(x) for kv in w.items() for x in kv])
    matched = symbols.filter(cond)
    return (matched
            .withColumn("_w", F.coalesce(wmap[F.col("kind")], F.lit(1.0)))
            .groupBy("doc_id")
            .agg(F.sum(F.col("_w") * F.col("n_defs")).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


# --------------------------------------------------------- import graph

IMPORT_PATTERNS: list[str] = [
    # python "import a.b" / java "import a.b.C;" (group = first segment)
    r"(?m)^\s*import\s+([A-Za-z_][A-Za-z0-9_]*)",
    # python "from a.b import x"
    r"(?m)^\s*from\s+([A-Za-z_][A-Za-z0-9_]*)",
]


def import_edges(docs: DataFrame, repo_col: str = "repo",
                 text_col: str = "text",
                 patterns: list[str] | None = None) -> DataFrame:
    """Repo-level dependency edges from import statements — the
    extraction behind dependency-graph ranking (a Sourcegraph-style
    "repos that import you" signal). Each document contributes its
    containing repo as the edge source and every imported TOP-LEVEL
    module name as a destination; self-imports drop; output is the
    DISTINCT ``(src, dst)`` edge relation, ready for
    :func:`index_spark.operators.graph.pagerank` (rank repos by who
    imports them) or reverse-dependency queries.

    Scale shape: map-only ``regexp_extract_all`` + one outer explode
    (InferFiltersFromGenerate guard), then a distinct on the edge pair
    — the only shuffle, over edge rows (imports-per-file, not tokens)."""
    pats = IMPORT_PATTERNS if patterns is None else patterns
    arrays = [F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(1))
              for rx in pats]
    return (docs
            .select(F.col(repo_col).alias("src"),
                    F.explode_outer(F.concat(*arrays)).alias("dst"))
            .filter(F.col("dst").isNotNull())
            .filter(F.col("dst") != F.col("src"))
            .distinct())
