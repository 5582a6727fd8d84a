"""Scaling-efficiency evidence: the same build job at two parallelism
levels (local[8] vs local[32]) on the same input — the sandbox proxy for
the north_rule's N -> 4N executor criterion (no real cluster here).

Each level runs in a FRESH process/JVM (no warm-cache contamination).
The measured job is the real build: corpus (cached, read excluded) ->
doc_id range exchange -> fused tokenize+stem+count+compress mapInPandas
-> index blob rows written to parquet (the honest sink — a previous
version "materialized" with ``foreach(lambda r: None)``, which pickles
every row into Python one at a time and measures serialization, not the
build). A cold pass (python-worker spawn + JIT) is recorded separately;
efficiency is computed on the warm pass — the regime of long-lived
executors at 10^12-file scale.

Usage: python BENCH/scaling.py [corpus_dir] [repeats] [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from index_spark.session import get_spark
from index_spark.operators.build import build_index, release_build
from index_spark.operators.query import QueryEngine

cores = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark(cores=cores, shuffle_partitions=cores, driver_memory="48g")
if os.path.exists(f"{{sf_dir}}/corpus.parquet"):
    corpus = spark.read.parquet(f"{{sf_dir}}/corpus.parquet") \
                  .select("repo", "path", "content")
else:
    docs_raw = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
    corpus = docs_raw.select(F.col("source").alias("repo"),
                             F.format_string("doc%08d", F.col("doc_id")).alias("path"),
                             F.col("text").alias("content"))
# warm the input; partitions == cores (python-task launch costs ~10ms
# each in this sandbox — more, smaller tasks would tax the 32-core level)
corpus = corpus.repartition(cores).persist()
n = corpus.count()

def one_build(tag):
    t0 = time.time()
    docs, index, stats = build_index(corpus, stem=True, shard_size=4096)
    out = tempfile.mkdtemp(prefix=f"idx_{{tag}}_{{cores}}_")
    index.write.mode("overwrite").parquet(out)
    dt = time.time() - t0
    return index, stats, dt, out

index1, stats1, cold_s, out1 = one_build("cold")
release_build(index1); shutil.rmtree(out1, ignore_errors=True)
warm = []
for w in range(2):
    index2, stats2, bs, out2 = one_build("warm" + str(w))
    shutil.rmtree(out2, ignore_errors=True)
    warm.append(bs)
    if w == 0:
        release_build(index2)
build_s = min(warm)

qs = ["data table query", "scan filter", "group agg window", "spark",
      "slow fast", "merge join sort", "customer order", "stream batch",
      "hash value", "row column line"]
eng = QueryEngine(index2, stats2)
eng.warm(qs)
lat = []
for q in qs:
    t0 = time.time()
    eng.search(q, k=10)
    lat.append(time.time() - t0)
lat.sort()
query_s = sum(lat)

print(json.dumps({{"cores": cores, "n_docs": n,
                   "cold_build_s": round(cold_s, 3),
                   "build_s": round(build_s, 3),
                   "docs_per_sec": round(n / build_s, 2),
                   "query_set_s": round(query_s, 3),
                   "query_p95_s": round(lat[int(0.95 * (len(lat) - 1))], 3),
                   "queries_per_sec": round(len(qs) / query_s, 2)}}))
spark.stop()
"""


def _cpu_times() -> list[int]:
    """Jiffy counters from /proc/stat (user nice system idle iowait irq
    softirq steal). On this sandbox the host episodically makes guest
    minor page faults expensive — identical pinned runs then vary 5-30x
    and CPU time goes >90% SYSTEM (BENCH/machine_noise_probe.json).
    Every level therefore records the user/sys/steal fractions of its
    own window: a scaling ratio is only trustworthy when BOTH windows
    are user-dominated (sys_frac low)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return [int(x) for x in parts[1:]]


def run_level(cores: int, sf_dir: str, pin: bool = False) -> dict:
    code = _CHILD.format(repo=REPO)
    env = dict(os.environ)
    # shuffle spill to tmpfs: measure the engine, not the VM's disk
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-bench"
        os.makedirs(shm, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = shm
    cmd = [sys.executable, "-c", code, str(cores), sf_dir]
    if pin:
        # pin the WHOLE process (worker + GC + shuffle + python workers)
        # to exactly `cores` CPUs: an honest N-core box. Unpinned, the
        # low level's auxiliary threads spill onto idle CPUs and inflate
        # its throughput, understating N->4N efficiency.
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    c0 = _cpu_times()
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=2400, check=False,
        env=env)
    c1 = _cpu_times()
    d = [b - a for a, b in zip(c0, c1)]
    tot = max(sum(d), 1)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            res["user_frac"] = round(d[0] / tot, 4)
            res["sys_frac"] = round(d[2] / tot, 4)
            res["steal_frac"] = round((d[7] if len(d) > 7 else 0) / tot, 4)
            return res
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def ensure_corpus(path: str, n_files: int) -> str:
    if not os.path.exists(os.path.join(path, "corpus.parquet")):
        from index_spark.sources.corpus import write_corpus_sharded

        print(f"generating {n_files}-file corpus at {path} ...")
        write_corpus_sharded(path, n_files=n_files, n_shards=16)
    return path


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_corpus200k"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    if "testdata" not in sf_dir:
        sys.path.insert(0, REPO)
        ensure_corpus(sf_dir, n_files)
    levels = tuple(int(x) for x in sys.argv[4].split(",")) if len(sys.argv) > 4 \
        else (8, 32)
    pin = os.environ.get("SCALING_PIN", "1") == "1"
    results = {c: [] for c in levels}
    for r in range(repeats):
        for c in levels:
            res = run_level(c, sf_dir, pin=pin)
            res["pinned"] = pin
            results[c].append(res)
            print(f"run {r} cores={c} pinned={pin}: {res}")
    best = {c: max(runs, key=lambda x: x["docs_per_sec"]) for c, runs in results.items()}
    lo, hi = levels
    ratio = hi / lo
    eff_build = (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / ratio
    eff_query = (best[hi]["queries_per_sec"] / best[lo]["queries_per_sec"]) / ratio
    summary = {
        "sf_dir": sf_dir,
        "levels": best,
        f"build_scaling_efficiency_{lo}_to_{hi}": round(eff_build, 3),
        f"query_scaling_efficiency_{lo}_to_{hi}": round(eff_query, 3),
        "all_runs": results,
    }
    suffix = f"_{lo}_{hi}" if levels != (2, 8) else ""
    if os.environ.get("SCALING_PIN", "1") == "1":
        suffix += "_pinned"
    out_path = os.path.join(REPO, "BENCH", f"scaling_results{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "all_runs"}))


if __name__ == "__main__":
    main()
