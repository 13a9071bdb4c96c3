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
        # store_positions pinned False: the r4 default flip to
        # positional (models.py:75) would otherwise silently add
        # position payloads to THIS headline number and break r1-r4
        # comparability; the positional build is measured separately
        # as build_index_fielded_pos below
        timed("build_index", lambda: build_index(
            spark, docs, idx_dir,
            IndexConfig(id="bench", tokenizer="simple", n_term_buckets=8,
                        store_positions=False),
            content_col="text", id_col="doc_id", lang_col="lang",
            attr_cols=("source", "n_chars"), n_build_partitions=int(cpus)))
        eng = SearchEngine(spark, idx_dir, on_overflow="truncate")

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

        # p50 of the headline BM25 top-k over repeated runs — the
        # north-rule metric is query p50 latency, and one-shot timings
        # on this host are 2-3x noisy
        import statistics
        lat = []
        for _ in range(5):
            t0 = time.time()
            eng.search_df("spark join", k=10).collect()
            lat.append(time.time() - t0)
        timings["q_bm25_p50"] = round(statistics.median(lat), 4)

        # round-2 surfaces: per-field postings namespace (Q5) +
        # positional index, measured on their own build so the r1
        # build_index number stays comparable
        idx_dir2 = idx_dir + "_fielded"
        timed("build_index_fielded_pos", lambda: build_index(
            spark, docs, idx_dir2,
            IndexConfig(id="bench_f", tokenizer="simple", n_term_buckets=8,
                        store_positions=True),
            content_col="text", id_col="doc_id", lang_col="lang",
            attr_cols=("source", "n_chars"), text_cols=("source",),
            n_build_partitions=int(cpus)))
        eng2 = SearchEngine(spark, idx_dir2, on_overflow="truncate")
        eng2.search_df("spark", k=10).collect()  # warm
        timed("q_field_scoped",
              lambda: eng2.search_df("source:src3 spark", k=10).collect())
        timed("q_phrase_pos",
              lambda: eng2.search_df('"the fast"', k=10).collect())
        timed("q_phrase_not",
              lambda: eng2.search_df('spark -"the fast"', k=10).collect())

        # write path: one 50-doc upsert batch (replacements) through
        # the copy-on-write mutation + snapshot commit — the incremental
        # maintenance latency a sync loop pays per batch
        from bright_spark.index.mutations import IndexMutator

        def _mutate():
            batch = (docs.limit(50)
                     .withColumn("text", F.concat(F.col("text"),
                                                  F.lit(" benchmut"))))
            IndexMutator(spark, idx_dir2).upsert(batch)

        timed("mutate_upsert_50", _mutate)

        timed("dedup_exact", lambda: exact_duplicates(docs).count())
        from bright_spark.text.dedup import dedup_paragraphs
        timed("dedup_paragraphs",
              lambda: dedup_paragraphs(docs, sep=" ").count())
        timed("dedup_minhash_lsh",
              lambda: near_duplicates_minhash(docs, threshold=0.5).count())
        timed("dedup_simhash", lambda: simhash(docs).count())
        timed("text_quality", lambda: quality_scores(docs).count())
        from bright_spark.text.quality import language_id, repetition_profile
        timed("text_lang_id", lambda: language_id(docs).count())
        from bright_spark.text.scrub import redact_pii
        timed("text_redact", lambda: redact_pii(docs).count())
        timed("text_repetition",
              lambda: repetition_profile(docs).count())
        from bright_spark.text.quality import (
            lm_perplexity,
            lm_perplexity_bigram,
            vocabulary,
        )
        timed("text_lm_perplexity", lambda: lm_perplexity(docs).count())
        timed("text_lm_bigram", lambda: lm_perplexity_bigram(docs).count())
        timed("text_vocabulary", lambda: vocabulary(docs).count())

        from bright_spark.text.dedup import near_duplicates_simhash
        timed("dedup_simhash64_pairs",
              lambda: near_duplicates_simhash(docs, max_hamming=3).count())

        from bright_spark.text.decontaminate import probe_containment
        probes = docs.filter(F.col("doc_id") % 97 == 0)
        timed("text_decontaminate_fuzzy",
              lambda: probe_containment(
                  docs.filter(F.col("doc_id") % 97 != 0), probes,
                  n=3, min_ratio=0.2).count())

        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
        timed("ann_brute", lambda: cosine_topk(emb, qvec, k=10).collect())
        timed("ann_lsh", lambda: ann_cosine_topk(emb, qvec, k=10, n_planes=6,
                                                 probe_hamming=2).collect())
        from bright_spark.vectors.similarity import (
            ann_topk_indexed,
            build_ann_index,
            near_duplicates_cosine,
        )
        ann_dir = idx_dir + "_ann"
        timed("ann_index_build",
              lambda: build_ann_index(emb, ann_dir, dim=64, n_planes=6))
        timed("ann_lsh_indexed",
              lambda: ann_topk_indexed(spark, ann_dir, qvec, k=10,
                                       probe_hamming=2).collect())
        from bright_spark.vectors.similarity import build_ivf_index, ivf_topk
        ivf_dir = idx_dir + "_ivf"
        timed("ann_ivf_build",
              lambda: build_ivf_index(emb, ivf_dir, n_leaders=32))
        timed("ann_ivf_indexed",
              lambda: ivf_topk(spark, ivf_dir, qvec, k=10,
                               nprobe=4).collect())
        timed("ann_near_dup", lambda: near_duplicates_cosine(
            emb, threshold=0.3, n_planes=6, dim=64).count())
        from bright_spark.text.dedup import duplicate_clusters
        timed("ann_dup_clusters", lambda: duplicate_clusters(
            emb, near_duplicates_cosine(emb, threshold=0.3, n_planes=6,
                                        dim=64),
            id_col="vec_id").count())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(idx_dir + "_fielded", ignore_errors=True)
        shutil.rmtree(idx_dir + "_ann", ignore_errors=True)
        shutil.rmtree(idx_dir + "_ivf", ignore_errors=True)

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
