"""End-to-end training-data pipeline composition: the operators chain
as plain DataFrames — exact dedup -> cross-corpus containment ->
benchmark decontamination -> PII redaction -> quality/repetition
filters -> deterministic split -> sequence packing — and the chained
invariants hold (no duplicate survives, no contaminated doc survives,
no unredacted PII in the output, every survivor packed exactly once).
This is the composition a real 100 TB data-prep run executes; each
stage is a narrow map or a bounded join, so the chain inherits every
stage's scale shape.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        body = f"document {i} body with tokens " + " ".join(
            f"w{(i * 7 + j) % 40}" for j in range(18))
        if i % 10 == 0:
            body = "duplicated template body exactly the same every time"
        if i % 17 == 0:
            body += " reach me at spam@example.com or 10.1.2.3"
        if i % 23 == 0:
            body += " the secret benchmark answer is forty two"
        rows.append({"doc_id": i, "text": body})
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def benchmark_probes(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [0],
        "text": ["what is the secret benchmark answer is forty two maybe"]}))


def test_full_prepare_chain(spark, corpus, benchmark_probes):
    from bright_spark.text.decontaminate import contaminated_docs
    from bright_spark.text.dedup import exact_duplicates
    from bright_spark.text.quality import quality_scores, repetition_profile
    from bright_spark.text.sampling import deterministic_split, pack_sequences
    from bright_spark.text.scrub import redact_pii

    from bright_spark.text.dedup import dedup_paragraphs

    n0 = corpus.count()

    # 0. repeated-paragraph removal (word granularity here — the
    # fixture corpus is single-line). Exact-duplicate docs become
    # empty except the first copy, which keeps every first-occurrence
    # word: the later doc-level dedup stage must still converge, and
    # no row may be lost or reordered.
    para = dedup_paragraphs(corpus, sep=" ")
    assert para.count() == n0
    assert para.filter(F.col("n_removed") > 0).count() > 0
    # idempotence at the corpus level
    assert (dedup_paragraphs(para.select("doc_id", "text"), sep=" ")
            .agg(F.sum("n_removed")).collect()[0][0] == 0)

    # 1. exact dedup: keep each group's canonical doc
    canon = (exact_duplicates(corpus)
             .filter(F.col("doc_id") == F.col("canonical_id"))
             .select("doc_id"))
    deduped = corpus.join(canon, "doc_id", "left_semi")
    n1 = deduped.count()
    # docs 10..110 step 10 share the template byte-identically (doc 0
    # diverges via its PII suffix): 11 copies -> 1 survives
    assert n1 == n0 - 10

    # 2. benchmark decontamination (5-gram overlap with the probe set)
    contaminated = contaminated_docs(deduped, benchmark_probes, n=5)
    clean = deduped.join(contaminated.select("doc_id"), "doc_id",
                         "left_anti")
    n_contaminated = contaminated.count()
    assert n_contaminated > 0  # the planted overlap is caught
    assert clean.count() == n1 - n_contaminated

    # 3. PII redaction
    redacted = (redact_pii(clean)
                .join(clean.select("doc_id"), "doc_id", "left_semi"))
    leaked = redacted.filter(
        F.col("text_redacted").rlike("@example|10\\.1\\.2\\.3")).count()
    assert leaked == 0
    assert redacted.filter(F.col("n_email") > 0).count() > 0

    # 4. quality + repetition gates (permissive thresholds — the point
    # is composition, not tuning)
    q = quality_scores(redacted.withColumnRenamed("text_redacted", "text"))
    r = repetition_profile(
        redacted.withColumnRenamed("text_redacted", "text"))
    keep = (q.filter(F.col("quality_score") > 0.2).select("doc_id")
            .join(r.filter(F.col("repetition_ratio") < 0.9)
                  .select("doc_id"), "doc_id"))
    survivors = redacted.join(keep, "doc_id", "left_semi")
    n_surv = survivors.count()
    assert 0 < n_surv <= clean.count()

    # 5. deterministic split + packing over the survivors
    split = deterministic_split(survivors, {"train": 0.8, "val": 0.2})
    assert split.count() == n_surv
    assert set(r["split"] for r in split.select("split")
               .distinct().collect()) <= {"train", "val"}
    packed = pack_sequences(
        survivors.withColumnRenamed("text_redacted", "text"),
        budget=64, n_shards=4)
    assert packed.count() == n_surv  # every survivor packed once
    assert packed.select("doc_id").distinct().count() == n_surv
    # stream accounting: per shard, offsets + lengths tile exactly
    tot = (packed.groupBy("shard")
           .agg(F.sum("n_tokens").alias("s"),
                F.max(F.col("start_offset") + F.col("n_tokens")).alias("m"))
           .collect())
    for row in tot:
        assert row["s"] == row["m"]

    # rerun determinism of the whole chain's membership
    again = (redact_pii(clean).join(keep, "doc_id", "left_semi")
             .select("doc_id"))
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in survivors.select("doc_id").collect())
