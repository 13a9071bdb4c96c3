"""Benchmark decontamination — the training-pipeline stage that finds
corpus documents overlapping an evaluation/probe set, so they can be
dropped before training (n-gram collision is the standard detector).

Shape at 100 TB: the probe side (benchmark suites) is tiny versus the
corpus, so its distinct n-grams BROADCAST; the corpus side is one
shingle explode + broadcast semi-join + groupBy — no shuffle of
corpus text, no cross product, map-side combinable counts. All
built-in DataFrame ops (shares :func:`bright_spark.text.dedup.
shingles_df` with the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bright_spark.text.dedup import shingles_df


def contaminated_docs(corpus: DataFrame, probes: DataFrame, n: int = 5,
                      id_col: str = "doc_id", text_col: str = "text",
                      probe_id_col: str = "doc_id",
                      probe_text_col: str = "text",
                      min_hits: int = 1) -> DataFrame:
    """Corpus docs sharing at least ``min_hits`` distinct n-grams with
    ANY probe document: (doc_id, n_hits, first_ngram), where n_hits
    counts the doc's distinct colliding n-grams and first_ngram is the
    lexicographically smallest collision (the audit breadcrumb)."""
    corpus_sh = shingles_df(corpus, id_col, text_col, k=n)
    probe_sh = (shingles_df(probes, probe_id_col, probe_text_col, k=n)
                .select("shingle").distinct())
    hits = corpus_sh.join(F.broadcast(probe_sh), "shingle")
    return (hits.groupBy("doc_id")
            .agg(F.count("*").alias("n_hits"),
                 F.min("shingle").alias("first_ngram"))
            .filter(F.col("n_hits") >= min_hits))


def probe_containment(corpus: DataFrame, probes: DataFrame, n: int = 5,
                      min_ratio: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      probe_id_col: str = "doc_id",
                      probe_text_col: str = "text") -> DataFrame:
    """Fuzzy decontamination: per (corpus doc, probe doc) containment —
    the fraction of the PROBE's distinct n-grams present in the corpus
    doc. Catches partial/edited benchmark leaks a single-collision
    detector over-flags (one common phrase) or a verbatim check misses
    (a reworded question keeping most of its n-grams). The standard
    contamination rule "drop the doc if >= X% of an eval example's
    n-grams appear in it" (GPT-3 appendix C uses 13-gram collision;
    PaLM/Llama report fractional-overlap variants).

    Returns (doc_id, probe_id, probe_hits, probe_ngrams, containment)
    with containment >= ``min_ratio``, so the caller can drop or audit
    per offending pair.

    100 TB shape: same as :func:`contaminated_docs` — the probe side
    is tiny and BROADCAST twice (grams, then per-probe totals), the
    corpus side is one shingle explode + broadcast join + groupBy on
    (doc_id, probe_id); corpus text never shuffles and the collision
    groupBy is map-side combinable. The pair fan-out is bounded by
    collisions, not |corpus| x |probes|."""
    corpus_sh = shingles_df(corpus, id_col, text_col, k=n)
    probe_sh = (shingles_df(probes, probe_id_col, probe_text_col, k=n)
                .withColumnRenamed("doc_id", "probe_id"))
    totals = probe_sh.groupBy("probe_id").agg(
        F.count("*").alias("probe_ngrams"))
    hits = (corpus_sh.join(F.broadcast(probe_sh), "shingle")
            .groupBy("doc_id", "probe_id")
            .agg(F.count("*").alias("probe_hits")))
    return (hits.join(F.broadcast(totals), "probe_id")
            .select("doc_id", "probe_id", "probe_hits", "probe_ngrams",
                    (F.col("probe_hits") / F.col("probe_ngrams"))
                    .alias("containment"))
            .filter(F.col("containment") >= min_ratio))
