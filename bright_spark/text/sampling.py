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


def stratified_sample(df: DataFrame, rates: dict[str, float] | None = None,
                      targets: dict[str, int] | None = None,
                      group_col: str = "lang", key_col: str = "doc_id",
                      salt: str = "strat",
                      default_rate: float = 1.0) -> DataFrame:
    """Per-group deterministic sampling — the domain-mix rebalancing
    step of a pretraining pipeline (downsample the web crawl to 30%,
    keep 100% of code, ...): a row survives iff its hash bucket falls
    below its GROUP's rate. ``rates`` maps group value -> fraction
    (groups not listed keep ``default_rate``); ``targets`` instead
    gives absolute per-group row budgets, converted to rates with one
    per-group count aggregation (rate = min(1, target/count) — the
    realized size is within hash noise of the budget, and membership
    stays a pure function of (salt, key), so reruns and engines
    agree row for row).

    Scale shape: the rate table is a tiny broadcast-joined dim (or a
    CASE literal — either way the text column never shuffles), and
    the membership test is the same JVM md5 expression as
    :func:`sample_by_hash` — no RNG state, no Python, WSCG-able."""
    if (rates is None) == (targets is None):
        raise ValueError("provide exactly one of rates= or targets=")
    if targets is not None:
        counts = {r["g"]: int(r["c"]) for r in
                  df.groupBy(F.col(group_col).alias("g"))
                  .agg(F.count("*").alias("c")).collect()}
        rates = {g: min(1.0, t / counts[g]) for g, t in targets.items()
                 if counts.get(g)}
    spark = df.sparkSession
    rate_dim = spark.createDataFrame(
        [(g, float(r)) for g, r in sorted(rates.items())],
        f"{group_col} STRING, _rate DOUBLE")
    bucket = hash_bucket(F.col(key_col), salt)
    return (df.join(F.broadcast(rate_dim), group_col, "left")
            .withColumn("_rate", F.coalesce(F.col("_rate"),
                                            F.lit(float(default_rate))))
            .filter(bucket < (F.col("_rate") * BUCKETS).cast("bigint"))
            .drop("_rate"))


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


def pack_sequences(df: DataFrame, budget: int = 2048, n_shards: int = 64,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Sequence packing for pretraining batches, concat-and-chunk
    style: shard the corpus deterministically (md5 of the doc id, so
    any engine re-derives the layout), concatenate each shard's docs
    in id order into one token stream, and cut the stream into
    fixed-``budget`` context windows. Per doc:

      (doc_id, shard, start_offset, n_tokens, bin_first, bin_last,
       n_chunks)

    where ``bin_first``/``bin_last`` are the window indices the doc's
    tokens land in (a doc crossing a boundary is split across
    ``n_chunks`` windows — standard GPT-style packing; empty docs
    occupy zero tokens at their offset).

    Scale shape: one hash repartition by shard + a per-shard window
    cumsum — the sequential prefix-sum is confined to a shard, so
    shard count is the parallelism knob (size n_shards ~ cluster
    width; 10^12 docs / 2^16 shards keeps each window partition in
    memory). All JVM expressions, no UDFs."""
    from bright_spark.text.dedup import tokens_col
    from pyspark.sql import Window
    n_tokens = F.when(F.length(F.trim(F.col(text_col))) == 0,
                      F.lit(0)).otherwise(F.size(tokens_col(text_col)))
    shard = hash_bucket(F.col(id_col), "pack") % n_shards
    base = df.select(F.col(id_col).alias("doc_id"),
                     shard.cast("bigint").alias("shard"),
                     n_tokens.cast("bigint").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = base.withColumn("start_offset", start)
    bin_first = F.floor(F.col("start_offset") / budget)
    last_tok = (F.col("start_offset")
                + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
    bin_last = F.floor(last_tok / budget)
    return out.select(
        "doc_id", "shard", "start_offset", "n_tokens",
        bin_first.cast("bigint").alias("bin_first"),
        bin_last.cast("bigint").alias("bin_last"),
        (bin_last - bin_first + 1).cast("bigint").alias("n_chunks"))


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
