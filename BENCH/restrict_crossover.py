"""Crossover microbench: probe-driven vs exhaustive restricted scoring.

Builds one dense in-memory shard (no Spark — the kernels are plain
pandas/numpy), then times `_score_shard_restricted` against
`_score_shard_exhaustive(allowed=...)` across allow-set sizes, and
reports the measured crossover next to the production gate
(`RESTRICT_PROBE_RATIO`). Writes BENCH/restrict_crossover.json.

Usage: python BENCH/restrict_crossover.py [n_docs] [n_terms]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from index_spark.operators.build import _blob_rows  # noqa: E402
from index_spark.operators.maintenance import (  # noqa: E402
    _as_dicts_blocks,
    _as_dicts_skips,
)
from index_spark.operators.query import (  # noqa: E402
    RESTRICT_PROBE_RATIO,
    _score_shard_exhaustive,
    _score_shard_restricted,
)


def make_shard(n_docs: int, n_terms: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_terms):
        density = 0.9 if t == 0 else rng.uniform(0.2, 0.7)
        docs = np.flatnonzero(rng.random(n_docs) < density).astype(np.int64)
        if docs.size == 0:
            continue
        tfs = rng.integers(1, 8, docs.size).astype(np.int64)
        dls = rng.integers(50, 400, docs.size).astype(np.int64)
        r = _blob_rows(np.array([f"t{t:03d}"], dtype=object),
                       np.zeros(docs.size, np.int64), docs, tfs, dls, 0)
        r["idf"] = float(np.log(n_docs / docs.size + 1.0))
        # struct columns arrive as dicts from arrow; _blob_rows emits
        # tuples — convert like the vacuum path does
        r["skips"] = _as_dicts_skips(r["skips"])
        r["blocks"] = _as_dicts_blocks(r["blocks"])
        rows.append(r)
    return pd.concat(rows, ignore_index=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_terms = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pdf = make_shard(n_docs, n_terms)
    total_df = int(pdf["df"].sum())
    avgdl = 225.0
    results = []
    for frac in (0.0005, 0.002, 0.01, 0.05, 0.2, 0.5):
        size = max(4, int(n_docs * frac))
        rng = np.random.default_rng(11)
        allowed = np.sort(rng.choice(n_docs, size, replace=False)
                          ).astype(np.int64)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            a = _score_shard_restricted(pdf, avgdl, 10, allowed)
        t_probe = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            b = _score_shard_exhaustive(pdf, avgdl, 10, allowed=allowed)
        t_full = (time.perf_counter() - t0) / reps
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert all(x == y for x, y in zip(a["score"], b["score"]))
        gate_picks = ("probe" if size * RESTRICT_PROBE_RATIO < total_df
                      else "exhaustive")
        results.append({
            "allowed": size,
            "allowed_x_ratio_vs_df": round(size * RESTRICT_PROBE_RATIO
                                           / total_df, 3),
            "probe_ms": round(t_probe * 1e3, 2),
            "exhaustive_ms": round(t_full * 1e3, 2),
            "speedup": round(t_full / t_probe, 2),
            "gate_picks": gate_picks,
            "gate_correct": (t_probe <= t_full) == (gate_picks == "probe")
            or abs(t_full - t_probe) / max(t_full, t_probe) < 0.25,
        })
        print(results[-1])
    out = {"n_docs": n_docs, "n_terms": n_terms, "total_df": total_df,
           "ratio_gate": RESTRICT_PROBE_RATIO, "results": results}
    with open(os.path.join(REPO, "BENCH", "restrict_crossover.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
