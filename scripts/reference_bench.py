"""The reference repo's own benchmark protocol, reproduced 1:1.

`/root/reference/benchmark.sh:97-107,198-222` measures: index 1,000 /
5,000 / 10,000 product documents (JSONL POST), then the mean latency of
three queries — `laptop`, `computer`, `price:>100`. The reference
commits no absolute numbers (results are produced per CI run), so this
script produces OUR side of the comparison table; the product corpus
mirrors `benchmarks/generate_data.go:12-20` but seeded (the reference
generator is wall-clock-seeded).

Writes BENCH/reference_protocol.json. Usage:
    python scripts/reference_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = [1_000, 5_000, 10_000]  # benchmark.sh:130
QUERIES = ["laptop", "computer", "price:>100"]  # benchmark.sh:218-220


def main() -> None:
    from bright_spark.fixtures import make_products
    from bright_spark.index.builder import build_index
    from bright_spark.models import IndexConfig
    from bright_spark.query.engine import SearchEngine
    from bright_spark.session import get_spark

    spark = get_spark("reference_bench", master="local[32]",
                      shuffle_partitions=32)

    def _ident(it):
        yield from it
    spark.range(0, 32, numPartitions=32).mapInPandas(_ident, "id long").count()

    results = {}
    for n in SIZES:
        pdf = make_products(n, seed=42)
        src_path = f"/tmp/ref_bench_products_{n}.jsonl"
        with open(src_path, "w") as f:
            for rec in pdf.to_dict("records"):
                f.write(json.dumps(rec) + "\n")
        src = spark.read.json(src_path)
        idx = f"/tmp/ref_bench_idx_{n}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, src, idx, IndexConfig(id=f"products{n}", tokenizer="simple"),
            content_col="description", key_cols=("id",), lang_col=None,
            attr_cols=("name", "price", "category", "inStock"),
            n_build_partitions=16)
        index_ms = (time.time() - t0) * 1000
        eng = SearchEngine(spark, idx)
        eng.search("laptop")  # warm
        lat = {}
        for q in QUERIES:
            t0 = time.time()
            resp = eng.search(q)
            lat[q] = round((time.time() - t0) * 1000, 1)
            assert resp.total_hits > 0, (n, q)
        results[str(n)] = {
            "index_ms": round(index_ms, 1),
            "docs_per_sec": round(n / (index_ms / 1000), 1),
            "search_ms": lat,
            "avg_search_ms": round(sum(lat.values()) / len(lat), 1),
        }
        print(n, json.dumps(results[str(n)]), flush=True)
        shutil.rmtree(idx, ignore_errors=True)
        os.remove(src_path)

    payload = {
        "protocol": "reference benchmark.sh: index 1k/5k/10k product JSONL, "
                    "3 queries (laptop, computer, price:>100), local[32]",
        "note": "reference commits no absolute numbers "
                "(benchmark_results/README.md); this is our side",
        "results": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "reference_protocol.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload["results"]))
    spark.stop()


if __name__ == "__main__":
    main()
