"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Materializes the input table fixed by BASELINE.json's ``input_hint``:
``(repo string, path string, commit string, lang string, content string)``
— one row per source file — plus the sha256 manifest used for the per-row
content-integrity invariant. Seed=42, no wall clock: every call with the
same ``n_files`` reproduces byte-identical content.

Content is a zipfian mix of (a) hot language keywords (deliberately skewed
so hot-term salting is exercised), (b) a 5,000-identifier vocabulary with
camelCase/snake_case (so identifier splitting matters), (c) rare one-doc
tokens, (d) a few non-ASCII words (NFKD/casefold/strip-mark coverage).
2%% of files are near-duplicates (<10%% tokens replaced — must be caught
by MinHash/LSH at the 0.90 threshold) and 2%% are ~50%%-replaced
"mutants" (must be admitted).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

KEYWORDS = [
    "import", "return", "def", "class", "if", "else", "for", "while",
    "public", "private", "static", "void", "int", "string", "float",
    "func", "var", "const", "let", "function", "package", "struct",
    "interface", "try", "except", "catch", "raise", "new", "self", "this",
]
NON_ASCII = ["café", "naïve", "Größe", "résumé"]
LANGS = ["python", "java", "c", "go", "js"]
EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js"}

_SYL = [
    "get", "set", "run", "load", "save", "parse", "emit", "node", "list",
    "map", "tree", "hash", "byte", "word", "term", "doc", "post", "index",
    "query", "score", "rank", "merge", "split", "read", "write", "scan",
    "build", "flush", "chunk", "block", "token", "text", "data", "file",
]


def _identifier_vocab(rng: np.random.Generator, n: int = 5000) -> list[str]:
    """camelCase / snake_case identifiers from syllable pairs/triples."""
    vocab = []
    for i in range(n):
        k = 2 + (i % 2)
        parts = [_SYL[int(x)] for x in rng.integers(0, len(_SYL), k)]
        if i % 2 == 0:  # camelCase
            ident = parts[0] + "".join(p.capitalize() for p in parts[1:])
        else:  # snake_case
            ident = "_".join(parts)
        vocab.append(ident + str(i % 97))
    return vocab


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def generate_corpus(n_files: int = 500, seed: int = SEED) -> pd.DataFrame:
    """Build the corpus as a pandas frame (driver-side; scales to the test
    sizes — the 100 TB analog is an Iceberg/parquet table with the same
    schema, read with ``spark.read``)."""
    rng = np.random.default_rng(seed)
    ident_vocab = np.array(_identifier_vocab(rng), dtype=object)

    # token pool: keywords get a big zipf boost; identifiers zipf-tail
    kw = np.array(KEYWORDS, dtype=object)
    kw_probs = _zipf_probs(len(kw), 1.2)
    id_probs = _zipf_probs(len(ident_vocab), 1.07)
    nonascii = np.array(NON_ASCII, dtype=object)

    lang_probs = _zipf_probs(len(LANGS), 1.0)
    langs = rng.choice(len(LANGS), size=n_files, p=lang_probs)
    doc_lens = rng.integers(50, 2001, size=n_files)

    seps = np.array([" ", " ", " ", "\n", ". ", ", ", "(", ") "], dtype=object)

    contents: list[str] = []
    for i in range(n_files):
        n_tok = int(doc_lens[i])
        n_kw = int(0.45 * n_tok)
        n_id = n_tok - n_kw
        toks = np.concatenate([
            rng.choice(kw, size=n_kw, p=kw_probs),
            rng.choice(ident_vocab, size=n_id, p=id_probs),
        ])
        rng.shuffle(toks)
        # sprinkle rare unique tokens + occasional non-ASCII
        toks[0] = f"uniq{i}token"
        if i % 7 == 0:
            toks[1] = str(rng.choice(nonascii))
        sep = rng.choice(seps, size=n_tok)
        contents.append("".join(t + s for t, s in zip(toks, sep)))

    # near-duplicate injection: 2% close copies (ONE contiguous ~1% block
    # replaced — scattered edits would shred every 8-word shingle window
    # and defeat the 0.90 signature threshold by design), 2% half-mutants
    # (50% scattered — must be admitted)
    n_dup = max(1, n_files // 50)
    dup_targets = rng.choice(n_files, size=2 * n_dup, replace=False)
    for j, tgt in enumerate(dup_targets):
        src = int(rng.integers(0, n_files))
        if src == tgt:
            continue
        words = contents[src].split(" ")
        if j < n_dup:  # near-dup: one contiguous 1% block
            n_mut = max(1, len(words) // 100)
            start = int(rng.integers(0, max(1, len(words) - n_mut)))
            pos = range(start, start + n_mut)
        else:  # mutant: 50% scattered
            n_mut = len(words) // 2
            pos = rng.choice(len(words), size=n_mut, replace=False)
        for p in pos:
            words[p] = f"mut{tgt}w{p}"
        contents[tgt] = " ".join(words)

    rows = []
    for i in range(n_files):
        repo = f"org{i // 50}/repo{i // 10}"
        lang = LANGS[int(langs[i])]
        path = f"src/mod{i % 20}/file{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, contents[i]))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_manifest(corpus: pd.DataFrame) -> pd.DataFrame:
    """(repo, path, content_sha256) — the per-row integrity invariant."""
    sha = corpus["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    return pd.DataFrame(
        {"repo": corpus["repo"], "path": corpus["path"], "content_sha256": sha}
    )


def write_corpus(out_dir: str, n_files: int = 500, seed: int = SEED) -> None:
    """Write corpus.parquet + manifest.parquet under ``out_dir``.

    Small row groups keep the single file splittable for parallel scans.
    """
    import pathlib

    p = pathlib.Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    corpus = generate_corpus(n_files, seed)
    corpus.to_parquet(p / "corpus.parquet", index=False, row_group_size=4096)
    corpus_manifest(corpus).to_parquet(p / "manifest.parquet", index=False)


def verify_corpus(corpus, manifest):
    """Per-row content-integrity check (north_star's sha256 invariant).

    ``corpus`` and ``manifest`` are Spark DataFrames; manifest carries
    (repo, path, content_sha256). Returns the violation set — rows whose
    Spark-side sha256(content) mismatches the manifest, plus rows present
    on only one side. Empty result == corpus verified. JVM-side F.sha2,
    broadcast-or-shuffle hash join — no Python in the plan.
    """
    from pyspark.sql import functions as F

    hashed = corpus.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha"))
    joined = hashed.join(manifest, ["repo", "path"], "full_outer")
    return joined.where(
        F.col("sha").isNull()
        | F.col("content_sha256").isNull()
        | (F.col("sha") != F.col("content_sha256"))
    ).select("repo", "path", "sha", "content_sha256")


def _gen_shard(args) -> None:
    out_path, n, seed = args
    corpus = generate_corpus(n, seed)
    corpus.to_parquet(out_path, index=False, row_group_size=4096)


def write_corpus_sharded(out_dir: str, n_files: int, n_shards: int = 8,
                         seed: int = SEED) -> None:
    """Parallel deterministic corpus: shard i is generate_corpus(n/n_shards,
    seed+i), written as corpus.parquet/part-i.parquet (a directory dataset
    both Spark and DuckDB read). Used for large scaling-bench corpora."""
    import pathlib
    from multiprocessing import Pool

    p = pathlib.Path(out_dir) / "corpus.parquet"
    p.mkdir(parents=True, exist_ok=True)
    per = n_files // n_shards
    sizes = [per + (1 if i < n_files - per * n_shards else 0)
             for i in range(n_shards)]
    jobs = [(str(p / f"part-{i:04d}.parquet"), sizes[i], seed + i)
            for i in range(n_shards) if sizes[i]]
    with Pool(min(n_shards, 8)) as pool:
        pool.map(_gen_shard, jobs)
