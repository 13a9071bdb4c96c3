"""Per-round benchmark harness (driver contract).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus build-throughput extras}.

Covers: full inverted-index build over `documents`, BM25 top-k via the
block-max WAND path (single/OR/AND/wildcard/phrase/filter), dedup
(exact + MinHash-LSH + SimHash), quality stats, and vector similarity
(brute force + LSH ANN).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyspark.sql import functions as F

    from bright_spark.index.builder import build_index
    from bright_spark.models import IndexConfig
    from bright_spark.query.engine import SearchEngine
    from bright_spark.session import get_spark
    from bright_spark.text.dedup import exact_duplicates, near_duplicates_minhash, simhash
    from bright_spark.text.quality import quality_scores
    from bright_spark.vectors.similarity import ann_cosine_topk, cosine_topk

    spark = get_spark("bright_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 4)
        return out

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_docs = docs.count()

    idx_dir = f"/tmp/bright_spark_bench_idx_{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    try:
        timed("build_index", lambda: build_index(
            spark, docs, idx_dir,
            IndexConfig(id="bench", tokenizer="simple", n_term_buckets=8),
            content_col="text", id_col="doc_id", lang_col="lang",
            attr_cols=("source", "n_chars"), n_build_partitions=int(cpus)))
        eng = SearchEngine(spark, idx_dir)

        # warm the python workers / parquet footers once
        eng.search_df("spark", k=10).collect()

        timed("q_bm25_single", lambda: eng.search_df("spark", k=10).collect())
        timed("q_bm25_or", lambda: eng.search_df("spark join merge", k=10).collect())
        timed("q_bm25_and", lambda: eng.search_df("spark AND join", k=10).collect())
        timed("q_bm25_hot", lambda: eng.search_df("the data row", k=10).collect())
        timed("q_wildcard", lambda: eng.search_df("s*", k=10).collect())
        timed("q_phrase", lambda: eng.search_df('"the fast"', k=10).collect())
        timed("q_filter", lambda: eng.search_df("lang:en spark", k=10).collect())
        timed("q_fullrequest", lambda: eng.search("spark join"))

        timed("dedup_exact", lambda: exact_duplicates(docs).count())
        timed("dedup_minhash_lsh",
              lambda: near_duplicates_minhash(docs, threshold=0.5).count())
        timed("dedup_simhash", lambda: simhash(docs).count())
        timed("text_quality", lambda: quality_scores(docs).count())
        from bright_spark.text.quality import language_id
        timed("text_lang_id", lambda: language_id(docs).count())

        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
        timed("ann_brute", lambda: cosine_topk(emb, qvec, k=10).collect())
        timed("ann_lsh", lambda: ann_cosine_topk(emb, qvec, k=10, n_planes=6,
                                                 probe_hamming=2).collect())
        from bright_spark.vectors.similarity import near_duplicates_cosine
        timed("ann_near_dup", lambda: near_duplicates_cosine(
            emb, threshold=0.3, n_planes=6, dim=64).count())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    build_sec = timings.get("build_index", 0.0) or 1e-9
    print(json.dumps({
        "metric": "bright_spark build+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_docs": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 2),
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
