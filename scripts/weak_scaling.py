"""Weak-scaling evidence: constant per-slot work, 4x the slots, 4x the
corpus — wall time should stay ~flat if the dataflow has no serial
bottleneck (Gustafson's framing; complements the strong-scaling run in
scaling_bench.py). Protocol mirrors scaling_bench: one local[32] JVM,
slots via spark.task.cpus, partitions scaled with the data.

Writes BENCH/weak_scaling.json.
Usage: python scripts/weak_scaling.py [docs_per_slot] [trials]
       (defaults 5000, 2)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PER_SLOT = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
# N vs 4N slots on local[CORES] (see scaling_bench.py: both levels stay
# under-subscribed — the 4N level schedules 24 runnable threads on 32
# cores, matching real executor sizing)
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 24
LEVELS = {CORES // 8: 8, CORES // 2: 2}  # slots -> task.cpus


def gen(n_docs: int) -> str:
    path = f"/tmp/bright_weak_corpus_{n_docs}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from bright_spark.session import get_spark
from bright_spark.fixtures import make_repos_spark
spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
make_repos_spark(spark, {n_docs}, seed=42, partitions=64).write.mode("overwrite").parquet({path!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run(slots: int, corpus: str, partitions: int) -> dict:
    idx = f"/tmp/bright_weak_idx_{slots}"
    shutil.rmtree(idx, ignore_errors=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_index.py"),
         "--source", corpus, "--index-dir", idx,
         "--partitions", str(partitions), "--master", f"local[{CORES}]",
         "--task-cpus", str(LEVELS[slots])],
        env=os.environ, check=True, capture_output=True, text=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo, hi = sorted(LEVELS)
    spec = {lo: (gen(PER_SLOT * lo), 8 * lo), hi: (gen(PER_SLOT * hi), 8 * hi)}
    best: dict[int, dict] = {}
    for _ in range(TRIALS):
        for slots in (lo, hi):
            corpus, parts = spec[slots]
            b = run(slots, corpus, parts)
            print(f"slots={slots} docs={b['n_docs']}: wall {b['build_sec']}s",
                  flush=True)
            if slots not in best or b["build_sec"] < best[slots]["build_sec"]:
                best[slots] = b
    eff = best[lo]["build_sec"] / best[hi]["build_sec"]
    payload = {
        "protocol": f"constant {PER_SLOT} docs per slot; slots via "
                    f"spark.task.cpus on one local[{CORES}] JVM; partitions "
                    f"scaled with the data; best of {TRIALS} alternating",
        "per_slot_docs": PER_SLOT,
        "best": best,
        "weak_scaling_efficiency": round(eff, 4),
        "note": ("1.0 = flat wall time at 4x data on 4x slots; divide by the "
                "cpu-control ceiling in BENCH/scaling.json for the "
                "host-normalized figure"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "weak_scaling.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v["build_sec"] for k, v in best.items()}),
          f"weak_eff={eff:.3f}")


if __name__ == "__main__":
    main()
