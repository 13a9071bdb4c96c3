"""N -> 4N scaling-efficiency benchmark (north rule: >= 0.8).

Sandbox protocol (BASELINE.md §2): the identical build + query jobs
run at two local parallelism levels — local[8] (N) and local[32] (4N)
— over the same pre-generated corpus, in separate Spark processes.
Throughput is measured over the build stages only (the corpus is
already on disk; session startup excluded — on a real cluster both
are amortized constants). Writes BENCH/BASELINE.md + BENCH/scaling.json.

Usage: python scripts/scaling_bench.py [n_docs]  (default 120000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
CORPUS = f"/tmp/bright_scaling_corpus_{N_DOCS}"
LEVELS = [8, 32]
QUERIES = [
    {"q": "user", "k": 10}, {"q": "parse config", "k": 10},
    {"q": "parser AND config", "k": 10}, {"q": "user session token", "k": 10},
    {"q": "config NOT test", "k": 10}, {"q": "getuserid", "k": 10},
    {"q": "quasar_flux_capacitor", "k": 10}, {"q": "pars*", "k": 10},
    {"q": "error OR exception", "k": 10}, {"q": "read AND write AND buffer", "k": 10},
]


def gen_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    print(f"generating {N_DOCS}-doc corpus at {CORPUS} ...", flush=True)
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from bright_spark.session import get_spark
from bright_spark.fixtures import make_repos_spark
spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
make_repos_spark(spark, {N_DOCS}, seed=42, partitions=64).write.mode("overwrite").parquet({CORPUS!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def run_level(cpus: int) -> dict:
    idx = f"/tmp/bright_scaling_idx_{cpus}"
    shutil.rmtree(idx, ignore_errors=True)
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
         "--source", CORPUS, "--index-dir", idx, "--trials", "2",
         "--partitions", str(cpus * 2), "--master", f"local[{cpus}]"],
        env=env, check=True, capture_output=True, text=True)
    build = json.loads(out.stdout.strip().splitlines()[-1])

    qfile = f"/tmp/bright_scaling_queries.jsonl"
    with open(qfile, "w") as f:
        for q in QUERIES:
            f.write(json.dumps(q) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "query.py"),
         "--index-dir", idx, "--bench", qfile, "--reps", "3",
         "--master", f"local[{cpus}]", "--partitions", str(cpus * 2)],
        env=env, check=True, capture_output=True, text=True)
    qbench = json.loads(out.stdout.strip().splitlines()[-1])
    return {"cpus": cpus, "build": build, "query": qbench}


def main() -> None:
    gen_corpus()
    results = {}
    for cpus in LEVELS:
        print(f"=== local[{cpus}] ===", flush=True)
        t0 = time.time()
        results[cpus] = run_level(cpus)
        print(json.dumps(results[cpus]), flush=True)
        print(f"level wall: {time.time()-t0:.0f}s", flush=True)

    n, n4 = LEVELS
    thr_n = results[n]["build"]["docs_per_sec"]
    thr_4n = results[n4]["build"]["docs_per_sec"]
    eff = thr_4n / (4.0 * thr_n)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    payload = {
        "n_docs": N_DOCS,
        "levels": results,
        "throughput_docs_per_sec": {str(n): thr_n, str(n4): thr_4n},
        "scaling_efficiency": round(eff, 4),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(payload, f, indent=2)

    import platform
    md = f"""# BENCH/BASELINE.md — measured performance (bright_spark)

Protocol per BASELINE.md §2: the identical index-build and BM25
query jobs run at two parallelism levels over the same on-disk corpus
(deterministic synthetic source-code table, seed=42), in separate
Spark processes. local[8] vs local[32] is the sandbox stand-in for
N vs 4N executors; corpus generation and session startup are excluded
from the timed window (amortized constants on a real cluster).

- Host: {platform.platform()}, {os.cpu_count()} cores
- Spark: local mode, shuffle partitions = 2 x cores, AQE on, zstd parquet
- Corpus: {N_DOCS:,} synthetic source files (~code-token Zipfian mix)

## Index-build throughput

| level | wall (s) | docs/sec |
|---|---|---|
| local[{n}] (N) | {results[n]['build']['build_sec']} | {thr_n} |
| local[{n4}] (4N) | {results[n4]['build']['build_sec']} | {thr_4n} |

**Scaling efficiency = {thr_4n} / (4 x {thr_n}) = {eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "MISS"})

## BM25 top-k query latency (best of 3, block-max WAND path)

| level | p50 (s) | p95 (s) |
|---|---|---|
| local[{n}] | {results[n]['query']['p50_sec']} | {results[n]['query']['p95_sec']} |
| local[{n4}] | {results[n4]['query']['p50_sec']} | {results[n4]['query']['p95_sec']} |

Per-query best-of-3 latencies are in `BENCH/scaling.json`.

## Reference comparison

The reference repo publishes no absolute numbers (BASELINE.md §1 —
its benchmark_results/ holds only a README; results are produced per
CI run). Its protocol (index 1k/5k/10k docs + 3 queries) is subsumed
by bench.py, which the driver runs per round (BENCH_r{{N}}.json).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(payload["throughput_docs_per_sec"]),
          "efficiency:", round(eff, 4))


if __name__ == "__main__":
    main()
