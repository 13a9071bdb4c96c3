"""Small cross-module dataflow helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Parallelism floor for per-row-heavy stages: round-robin
    repartition ONLY when the input has fewer partitions than
    ``target`` (default: the session's default parallelism). A small
    corpus arriving as one unsplittable file — or as many tiny files
    that the open-cost packing collapses into one or two splits — would
    otherwise run every narrow tokenize/hash stage on one core (guide
    §2.5 'input skew'). At real scale inputs already exceed the floor
    and this adds NO shuffle. Results are unaffected: callers apply it
    only where downstream logic is partition-assignment-insensitive,
    and the round-robin assignment itself is deterministic
    (sort-before-repartition)."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    # only pay the exchange when it at least doubles parallelism — a
    # 25-vs-32 mismatch is not worth shuffling the input for
    return df.repartition(target) if n * 2 <= target else df
