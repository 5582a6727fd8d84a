"""Measurement-window gate for this sandbox's episodic host pathology.

The host intermittently makes guest minor page faults expensive; wide
(32-proc) allocation-heavy runs then burn >90% CPU in SYSTEM time and
slow 5-30x (see machine_noise_probe.json and BASELINE.md). A scaling
measurement taken in such a window measures the host, not the engine.

This probe runs the build's own hot kernel (term_counts_stream) 32-wide
for a few seconds and reports the window's sys fraction + throughput.
Exit 0 ("good window") iff sys_frac < 0.25 — gate scaling.py reruns on
it:

    python BENCH/window_probe.py && python BENCH/scaling.py ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def _work(args):
    import numpy as np
    import pyarrow as pa

    from index_spark.functions.text import term_counts_stream

    texts, per = args
    arr = pa.array(texts[:per], type=pa.large_string())
    buf = np.frombuffer(arr.buffers()[2], np.uint8)
    bounds = np.frombuffer(arr.buffers()[1], np.int64)
    term_counts_stream(buf, bounds, stem=True, camel=True)
    return per


def main() -> int:
    from multiprocessing import Pool

    from index_spark.sources.corpus import generate_corpus

    nproc = int(os.environ.get("PROBE_PROCS", "32"))
    per = int(os.environ.get("PROBE_DOCS", "600"))
    texts = generate_corpus(n_files=per)["content"].tolist()
    with Pool(nproc) as p:
        p.map(_work, [(texts, 50)] * nproc)  # warm pool + imports
        s0 = _stat()
        t0 = time.time()
        p.map(_work, [(texts, per)] * nproc)
        wall = time.time() - t0
        s1 = _stat()
    d = [b - a for a, b in zip(s0, s1)]
    tot = max(sum(d), 1)
    res = {
        "nproc": nproc,
        "docs_per_sec": round(nproc * per / wall, 1),
        "user_frac": round(d[0] / tot, 4),
        "sys_frac": round(d[2] / tot, 4),
        "good_window": d[2] / tot < 0.25,
    }
    print(json.dumps(res))
    return 0 if res["good_window"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
