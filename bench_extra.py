"""Per-operator isolation bench (guide §1.4) — NOT the driver metric.

Times individual operators with the same data/semantics as the frozen
``bench.py`` (same sf dir, same session factory, same call shapes), but
selectable from the command line so a single optimization can be
A/B-timed without paying for the whole suite. Results print one JSON
line per run; use repeats to judge spread.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 \
           python bench_extra.py [op ...] [--repeats N] [--noop]

``--noop``: where an operator is a DataFrame transformation, time the
computation with the noop sink (df.write.format('noop')) instead of the
bench's .count()/.collect() action, so the timing covers every column.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = 1
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
        args = [a for a in args if a != str(repeats)]
    use_noop = "--noop" in sys.argv

    from pyspark.sql import functions as F

    from bright_spark.session import get_spark

    spark = get_spark("bright_spark_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    sc = spark.sparkContext

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs.count()  # warm footers/workers

    def sink(df):
        if use_noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            return df.count()

    def op_ann_near_dup():
        from bright_spark.vectors.similarity import near_duplicates_cosine
        sink(near_duplicates_cosine(emb, threshold=0.3, n_planes=6, dim=64))

    def op_ann_dup_clusters():
        from bright_spark.text.dedup import duplicate_clusters
        from bright_spark.vectors.similarity import near_duplicates_cosine
        sink(duplicate_clusters(
            emb, near_duplicates_cosine(emb, threshold=0.3, n_planes=6,
                                        dim=64), id_col="vec_id"))

    def op_ann_brute():
        from bright_spark.vectors.similarity import cosine_topk
        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0]]
        cosine_topk(emb, qvec, k=10).collect()

    def op_ann_index_build():
        import shutil
        from bright_spark.vectors.similarity import build_ann_index
        d = f"/tmp/bse_ann_{os.getpid()}"
        shutil.rmtree(d, ignore_errors=True)
        build_ann_index(emb, d, dim=64, n_planes=6)
        shutil.rmtree(d, ignore_errors=True)

    def op_dedup_minhash_lsh():
        from bright_spark.text.dedup import near_duplicates_minhash
        sink(near_duplicates_minhash(docs, threshold=0.5))

    def op_dedup_simhash():
        from bright_spark.text.dedup import simhash
        sink(simhash(docs))

    def op_dedup_simhash64_pairs():
        from bright_spark.text.dedup import near_duplicates_simhash
        sink(near_duplicates_simhash(docs, max_hamming=3))

    def op_text_decontaminate_fuzzy():
        from bright_spark.text.decontaminate import probe_containment
        probes = docs.filter(F.col("doc_id") % 97 == 0)
        sink(probe_containment(docs.filter(F.col("doc_id") % 97 != 0),
                               probes, n=3, min_ratio=0.2))

    def op_text_lm_perplexity():
        from bright_spark.text.quality import lm_perplexity
        sink(lm_perplexity(docs))

    def op_text_lm_bigram():
        from bright_spark.text.quality import lm_perplexity_bigram
        sink(lm_perplexity_bigram(docs))

    def op_text_vocabulary():
        from bright_spark.text.quality import vocabulary
        sink(vocabulary(docs))

    def op_text_lang_id():
        from bright_spark.text.quality import language_id
        sink(language_id(docs))

    def op_dedup_paragraphs():
        from bright_spark.text.dedup import dedup_paragraphs
        sink(dedup_paragraphs(docs, sep=" "))

    def op_dedup_exact():
        from bright_spark.text.dedup import exact_duplicates
        sink(exact_duplicates(docs))

    def op_dedup_ngram_jaccard():
        from bright_spark.text.dedup import ngram_jaccard_pairs
        sink(ngram_jaccard_pairs(docs, threshold=0.5, max_df=50))

    ops = {k[3:]: v for k, v in list(locals().items())
           if k.startswith("op_")}
    chosen = args or sorted(ops)
    out: dict[str, list[float]] = {}
    for name in chosen:
        fn = ops[name]
        fn()  # warm once (python workers, parquet footers, broadcast)
        times = []
        for _ in range(repeats):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 4))
        sc.setJobDescription(None)
        out[name] = times
        print(json.dumps({"op": name, "sf_dir": sf_dir, "times": times,
                          "min": min(times)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
