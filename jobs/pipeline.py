"""spark-submit entrypoint: run one training-data-pipeline operator
over a parquet documents table and write the result as parquet.

    spark-submit --py-files bright_spark.zip jobs/pipeline.py \
        --op dedup_exact --source /data/docs --out /data/dedup

Operators (all over a table with at least (doc_id, text); language-ID
also reads ``lang`` when present):

    dedup_exact      (doc_id, content_hash, canonical_id, group_size)
    dedup_minhash    near-dup pairs (id_a, id_b, jaccard)
    dedup_paragraphs CCNet-style repeated-paragraph removal (keep-first)
    dedup_clusters   connected-component cluster_id per doc
    redact           PII-scrubbed text + per-category counts
    quality          quality features + composite score
    repetition       repeated-3-gram boilerplate ratio
    lm_perplexity    corpus-self-trained unigram-LM perplexity filter
    lm_bigram        interpolated-bigram LM perplexity (word-order aware)
    vocab            corpus vocabulary artifact (term, cf, df, rank)
    tokens           token stats (counts, distinct ratio, lengths)
    bpe_tokens       BPE-ish pre-token counts
    fingerprint      bag-of-words md5 fingerprint
    lang_id          marker-based language prediction
    split            deterministic train/val/test assignment
    sample           deterministic hash sample (--rate)
    stratified_sample per-group rates (--rates lang:0.5,...; domain
                     mix rebalancing — unlisted groups keep --rate)
    pack             sequence packing into --budget-token windows
    decontaminate    docs sharing any n-gram with --probes parquet
    decontaminate_fuzzy per-(doc, probe) n-gram containment >= --min-ratio
    dedup_cross      docs whose exact text appears in --probes parquet
    dedup_semantic   embedding near-dup clusters over (vec_id, embedding)
                     (--threshold cosine floor, --planes LSH planes)

Prints ONE JSON line: {"op", "rows", "out", "wall_sec"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True)
    ap.add_argument("--source", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--probes", default=None,
                    help="decontaminate: probe/benchmark docs parquet")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--weights", default="train:0.9,val:0.05,test:0.05")
    ap.add_argument("--rates", default="en:0.5",
                    help="group:rate list for stratified_sample "
                         "(--rate is the default for unlisted groups)")
    ap.add_argument("--group-col", default="lang")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--min-ratio", type=float, default=0.5,
                    help="decontaminate_fuzzy: probe containment floor")
    ap.add_argument("--planes", type=int, default=16,
                    help="dedup_semantic: LSH hyperplanes")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from bright_spark.session import get_spark
    spark = get_spark(f"pipeline:{args.op}", master=args.master,
                      shuffle_partitions=args.partitions)
    docs = spark.read.parquet(args.source)
    t0 = time.time()

    if args.op == "dedup_exact":
        from bright_spark.text.dedup import exact_duplicates
        out = exact_duplicates(docs)
    elif args.op == "dedup_minhash":
        from bright_spark.text.dedup import near_duplicates_minhash
        out = near_duplicates_minhash(docs, threshold=args.threshold)
    elif args.op == "dedup_clusters":
        from bright_spark.text.dedup import (
            duplicate_clusters,
            near_duplicates_minhash,
        )
        pairs = near_duplicates_minhash(docs, threshold=args.threshold)
        out = duplicate_clusters(docs, pairs)
    elif args.op == "dedup_paragraphs":
        from bright_spark.text.dedup import dedup_paragraphs
        out = dedup_paragraphs(docs)
    elif args.op == "redact":
        from bright_spark.text.scrub import redact_pii
        out = redact_pii(docs)
    elif args.op == "quality":
        from bright_spark.text.quality import quality_scores
        out = quality_scores(docs)
    elif args.op == "repetition":
        from bright_spark.text.quality import repetition_profile
        out = repetition_profile(docs, k=args.ngram)
    elif args.op == "lm_perplexity":
        from bright_spark.text.quality import lm_perplexity
        out = lm_perplexity(docs)
    elif args.op == "lm_bigram":
        from bright_spark.text.quality import lm_perplexity_bigram
        out = lm_perplexity_bigram(docs)
    elif args.op == "vocab":
        from bright_spark.text.quality import vocabulary
        out = vocabulary(docs)
    elif args.op == "tokens":
        from bright_spark.text.quality import token_stats
        out = token_stats(docs)
    elif args.op == "bpe_tokens":
        from bright_spark.text.quality import bpe_token_stats
        out = bpe_token_stats(docs)
    elif args.op == "fingerprint":
        from bright_spark.text.quality import fingerprints
        out = fingerprints(docs)
    elif args.op == "lang_id":
        from bright_spark.text.quality import language_id
        out = language_id(docs)
    elif args.op == "split":
        from bright_spark.text.sampling import deterministic_split
        weights = {k: float(v) for k, v in
                   (p.split(":") for p in args.weights.split(","))}
        out = deterministic_split(docs, weights)
    elif args.op == "sample":
        from bright_spark.text.sampling import sample_by_hash
        out = sample_by_hash(docs, rate=args.rate)
    elif args.op == "stratified_sample":
        from bright_spark.text.sampling import stratified_sample
        rates = {k: float(v) for k, v in
                 (p.split(":") for p in args.rates.split(","))}
        out = stratified_sample(docs, rates=rates, group_col=args.group_col,
                                default_rate=args.rate)
    elif args.op == "pack":
        from bright_spark.text.sampling import pack_sequences
        out = pack_sequences(docs, budget=args.budget, n_shards=args.shards)
    elif args.op == "decontaminate":
        if not args.probes:
            ap.error("--probes required for decontaminate")
        from bright_spark.text.decontaminate import contaminated_docs
        out = contaminated_docs(docs, spark.read.parquet(args.probes),
                                n=args.ngram)
    elif args.op == "decontaminate_fuzzy":
        if not args.probes:
            ap.error("--probes required for decontaminate_fuzzy")
        from bright_spark.text.decontaminate import probe_containment
        out = probe_containment(docs, spark.read.parquet(args.probes),
                                n=args.ngram, min_ratio=args.min_ratio)
    elif args.op == "dedup_semantic":
        from bright_spark.text.dedup import duplicate_clusters
        from bright_spark.vectors.similarity import near_duplicates_cosine
        pairs = near_duplicates_cosine(docs, threshold=args.threshold,
                                       n_planes=args.planes)
        out = (duplicate_clusters(docs, pairs, id_col="vec_id")
               .withColumnRenamed("doc_id", "vec_id"))
    elif args.op == "dedup_cross":
        if not args.probes:
            ap.error("--probes required for dedup_cross")
        from bright_spark.text.dedup import cross_corpus_duplicates
        out = cross_corpus_duplicates(docs, spark.read.parquet(args.probes))
    else:
        ap.error(f"unknown --op {args.op}")
        return

    out.write.mode("overwrite").parquet(args.out)
    rows = spark.read.parquet(args.out).count()
    print(json.dumps({"op": args.op, "rows": rows, "out": args.out,
                      "wall_sec": round(time.time() - t0, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
