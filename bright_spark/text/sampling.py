"""Deterministic sampling / split assignment for training-data
pipelines.

Reproducibility is the whole point (the north rule bans RNG state):
membership is a pure function of (salt, key) via md5, so any engine —
Spark at 10^12 rows, DuckDB in the test oracle, a future rerun —
assigns every row identically, rows can be added or removed without
reshuffling everyone else's assignment (unlike df.sample or
randomSplit), and the computation is one JVM-side expression (no
shuffle, no Python, trivially WSCG-able).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6): md5(salt|key) first 8 hex chars as
    an int (engine-portable — the oracle recomputes it in SQL)."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def sample_by_hash(df: DataFrame, rate: float, key_col: str = "doc_id",
                   salt: str = "sample") -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose hash bucket
    falls below rate * 1e6. Stable under reruns and under corpus
    growth (a row's membership never depends on other rows)."""
    return df.filter(hash_bucket(F.col(key_col), salt)
                     < int(rate * BUCKETS))


def deterministic_split(df: DataFrame, weights: dict[str, float],
                        key_col: str = "doc_id",
                        salt: str = "split") -> DataFrame:
    """(key, split): assign each row to a named split with the given
    proportions — the reproducible train/val/test assignment. Weights
    are normalized; boundaries are cumulative bucket thresholds, so
    enlarging one split keeps every row of the earlier splits in
    place."""
    total = float(sum(weights.values()))
    names = list(weights)
    bucket = hash_bucket(F.col(key_col), salt)
    acc = 0.0
    expr = None
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * BUCKETS)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.select(F.col(key_col), expr.alias("split"))


def split_sql(key_expr: str, weights: dict[str, float],
              salt: str = "split") -> str:
    """The DuckDB expression computing the identical split label (for
    differential oracles)."""
    total = float(sum(weights.values()))
    names = list(weights)
    bucket = (f"(('0x' || substr(md5('{salt}|' || CAST({key_expr} AS VARCHAR)), "
              f"1, 8))::BIGINT % {BUCKETS})")
    acc = 0.0
    parts = ["CASE"]
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN {bucket} < {int(acc * BUCKETS)} THEN '{name}'")
    parts.append(f"ELSE '{names[-1]}' END")
    return " ".join(parts)
