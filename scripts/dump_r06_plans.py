"""Dump .explain('formatted') for the round-6-touched query dataflows.

Usage: python scripts/dump_r06_plans.py <out_dir> <suffix> [op ...]
Writes <out_dir>/<op>_<suffix>.txt for each op. Run it once from the
round-start tree (suffix 'before') and once from the optimized tree
(suffix 'after'); commit the outputs under plans/r06/.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from bright_spark.session import get_spark

    spark = get_spark("r06_plans", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def build():
        from bright_spark.text.decontaminate import probe_containment
        from bright_spark.text.dedup import (dedup_paragraphs,
                                             near_duplicates_minhash,
                                             near_duplicates_simhash, simhash,
                                             simhash64)
        from bright_spark.text.quality import (language_id, lm_perplexity,
                                               lm_perplexity_bigram,
                                               vocabulary)
        from bright_spark.vectors.similarity import (cosine_topk,
                                                     near_duplicates_cosine)
        qvec = [float(x) for x in
                emb.filter(F.col("vec_id") == 0)
                .select("embedding").collect()[0][0]]
        probes = docs.filter(F.col("doc_id") % 97 == 0)
        return {
            "ann_near_dup": lambda: near_duplicates_cosine(
                emb, threshold=0.3, n_planes=6, dim=64),
            "ann_brute": lambda: cosine_topk(emb, qvec, k=10),
            "dedup_minhash_lsh": lambda: near_duplicates_minhash(
                docs, threshold=0.5),
            "dedup_simhash": lambda: simhash(docs),
            "dedup_simhash64": lambda: simhash64(docs),
            "dedup_simhash64_pairs": lambda: near_duplicates_simhash(
                docs, max_hamming=3),
            "text_decontaminate_fuzzy": lambda: probe_containment(
                docs.filter(F.col("doc_id") % 97 != 0), probes,
                n=3, min_ratio=0.2),
            "text_lm_perplexity": lambda: lm_perplexity(docs),
            "text_lm_bigram": lambda: lm_perplexity_bigram(docs),
            # _materialize=False where supported: the checkpoint would
            # otherwise truncate the visible plan to a Scan ExistingRDD
            "text_vocabulary": lambda: vocabulary(
                docs, **({"_materialize": False}
                         if "_materialize" in vocabulary.__code__.co_varnames
                         else {})),
            "text_lang_id": lambda: language_id(docs),
            "dedup_paragraphs": lambda: dedup_paragraphs(docs, sep=" "),
        }

    for name, fn in build().items():
        if only and name not in only:
            continue
        try:
            txt = plan(fn())
        except Exception as e:  # keep going; a missing op is fine pre-change
            txt = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt + "\n")
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
