"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: all-JVM (``zip_with`` + ``aggregate`` —
  sequential left-to-right fold, deterministic across engines) with a
  ``TakeOrderedAndProject`` top-k (no global sort). The baseline and
  the oracle-parity path.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (planes
  derived from md5, no RNG state), multiprobe within Hamming-adjacent
  buckets. The 100 TB scale path: candidate generation is a bucket
  equi-join instead of a full cross product.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int | None = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_ids: list[int] | None = None) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``:
    (vec_id, cosine) ordered desc, vec_id asc tiebreak. ``k=None``
    returns the FULL scored candidate set unordered (callers that
    re-rank under their own tie policy, e.g. rounded-score parity
    harnesses)."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(
        F.col(id_col).alias("vec_id"),
        (_dot(v, qlit) / (_norm(v) * F.lit(qnorm))).alias("cosine"))
    if exclude_ids:
        out = out.filter(~F.col("vec_id").isin(exclude_ids))
    if k is None:
        return out
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane coefficient in [-1, 1):
    md5-derived, no RNG state (reproducibility requirement)."""
    h = hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:8]
    return int(h, 16) / float(2**31) - 1.0


def lsh_signatures(df: DataFrame, dim: int, n_planes: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, sig): sig bit j = [dot(v, plane_j) >= 0]."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("bigint")
    for j in range(n_planes):
        plane = F.array(*[F.lit(_hyperplane(j, d)) for d in range(dim)])
        bit = F.when(_dot(v, plane) >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0))
        sig = sig + F.shiftleft(bit, j)
    return df.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


def near_duplicates_cosine(df: DataFrame, threshold: float = 0.3,
                           n_planes: int = 6, dim: int | None = None,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs: candidates = vectors sharing an LSH
    hyperplane-signature bucket (equi-join — the 100 TB path: no cross
    product), verified by exact cosine >= threshold. Deterministic
    (md5-derived planes) and engine-portable, so the SQL oracle
    recomputes the identical bucket assignment from the same plane
    constants. Returns (id_a, id_b, cosine), id_a < id_b."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sigs = lsh_signatures(df, dim, n_planes, id_col, vec_col)
    v = df.select(F.col(id_col).alias("vec_id"),
                  F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"))
    sv = v.join(sigs, "vec_id")
    a = sv.select(F.col("vec_id").alias("id_a"), F.col("e").alias("e_a"),
                  F.col("sig").alias("sig_a"))
    b = sv.select(F.col("vec_id").alias("id_b"), F.col("e").alias("e_b"),
                  F.col("sig").alias("sig_b"))
    pairs = a.join(b, (F.col("sig_a") == F.col("sig_b"))
                   & (F.col("id_a") < F.col("id_b")))
    cos = _dot(F.col("e_a"), F.col("e_b")) / (_norm(F.col("e_a")) * _norm(F.col("e_b")))
    return (pairs.select("id_a", "id_b", cos.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def probe_signatures(query_vec: list[float], dim: int, n_planes: int,
                     probe_hamming: int = 1) -> list[int]:
    """The query's LSH signature plus every signature within
    ``probe_hamming`` bits (multiprobe bucket set; driver-side)."""
    qsig = 0
    for j in range(n_planes):
        dot = sum(float(query_vec[d]) * _hyperplane(j, d) for d in range(dim))
        if dot >= 0:
            qsig |= 1 << j
    probes = {qsig}
    if probe_hamming >= 1:
        for j in range(n_planes):
            probes.add(qsig ^ (1 << j))
    if probe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qsig ^ (1 << i) ^ (1 << j))
    return sorted(probes)


def ann_cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    dim: int | None = None, n_planes: int = 12,
                    probe_hamming: int = 1,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k over an UNINDEXED table: computes signatures
    on the fly (one full scan). The scale path is
    :func:`build_ann_index` + :func:`ann_topk_indexed`, where the
    probe set prunes sig partition directories instead."""
    dim = dim or len(query_vec)
    probes = probe_signatures(query_vec, dim, n_planes, probe_hamming)
    sigs = lsh_signatures(df, dim, n_planes, id_col, vec_col)
    cand = (df.join(sigs.filter(F.col("sig").isin(probes)),
                    df[id_col] == sigs.vec_id, "left_semi"))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def build_ann_index(df: DataFrame, index_dir: str, dim: int,
                    n_planes: int = 12, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """Persist the LSH ANN index: (vec_id, embedding) partitioned by
    the hyperplane signature. Queries then touch only the probe set's
    partition directories (``PartitionFilters`` on ``sig``) instead of
    recomputing signatures over the full table per query — at 10^12
    vectors that is the difference between reading ~(probes/2^P) of
    the data and a full scan. 2**n_planes bounds the directory count
    (n_planes=12 -> 4096 dirs; size to the cluster like postings
    buckets)."""
    import json
    import os
    sigs = lsh_signatures(df, dim, n_planes, id_col, vec_col)
    out = (df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))
           .join(sigs, "vec_id"))
    (out.repartition("sig")
        .write.mode("overwrite").partitionBy("sig").parquet(index_dir))
    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as f:
        json.dump({"dim": dim, "n_planes": n_planes}, f)


def _leader_order_cols(id_col: str):
    """Deterministic leader sample order: lowest md5('ivf|' || id)
    first (id tiebreak) — the same ORDER BY re-derives the leader set
    in any engine, no RNG state."""
    key = F.md5(F.encode(
        F.concat(F.lit("ivf|"), F.col(id_col).cast("string")), "UTF-8"))
    return [key, F.col(id_col)]


def build_ivf_index(df: DataFrame, index_dir: str, n_leaders: int = 32,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """IVF (inverted-file) ANN index — the classic coarse-quantizer
    scale path: vectors are bucketed into the list of their nearest
    LEADER vector, and a query probes only the ``nprobe`` nearest
    lists. Leaders are a deterministic pseudo-random sample (lowest
    md5('ivf|' || vec_id), a seeded leader-clustering pick — no
    k-means RNG state, so a SQL oracle re-derives the identical index).
    Assignment cosine is rounded to 6 decimals with a leader-id
    tiebreak before the argmax, making the bucketing float-portable
    across engines. The assignment pass is ONE Arrow-batched
    numpy matmul over the table (leaders broadcast, L x dim tiny);
    lists are partition dirs, so a probe reads ~nprobe/L of the data
    via partition pruning — at 10^12 vectors, L is sized like postings
    buckets (e.g. 2^14 lists) and probes touch a handful of dirs."""
    import json
    import os
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    leaders = (df.select(F.col(id_col).alias("lid"),
                         F.col(vec_col).alias("lv"))
               .orderBy(*_leader_order_cols("lid"))
               .limit(n_leaders).collect())
    leaders = sorted(((int(r["lid"]), [float(x) for x in r["lv"]])
                      for r in leaders))  # ascending leader id = argmax
    leader_ids = np.array([lid for lid, _ in leaders], dtype=np.int64)
    lmat = np.array([v for _, v in leaders], dtype=np.float64)
    lnorm = np.linalg.norm(lmat, axis=1, keepdims=True)
    lnorm[lnorm == 0] = 1.0
    lmat = lmat / lnorm
    dim = lmat.shape[1]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array([np.asarray(x, dtype=np.float64)
                          for x in pdf["embedding"]])
            n = np.linalg.norm(v, axis=1, keepdims=True)
            n[n == 0] = 1.0
            cos = np.round((v / n) @ lmat.T, 6)
            out = pdf[["vec_id", "embedding"]].copy()
            # first max along ascending-leader-id axis == the SQL
            # "ORDER BY round(cos,6) DESC, lid ASC ... rn = 1" row
            out["list_id"] = leader_ids[np.argmax(cos, axis=1)]
            yield out

    src = df.select(F.col(id_col).alias("vec_id"),
                    F.col(vec_col).alias("embedding"))
    assigned = src.mapInPandas(
        assign, schema="vec_id BIGINT, embedding ARRAY<FLOAT>, list_id BIGINT")
    (assigned.repartition("list_id")
     .write.mode("overwrite").partitionBy("list_id").parquet(index_dir))
    # leaders live in an underscore-prefixed parquet sidecar (invisible
    # to the partitioned Spark read) — at the 100 TB sizing (L=2^14,
    # dim ~1k) that is a ~100 MB columnar table, not a JSON blob the
    # driver must parse per query; meta stays O(1)
    import pyarrow as pa
    import pyarrow.parquet as pq
    ldir = os.path.join(index_dir, "_leaders")
    os.makedirs(ldir, exist_ok=True)
    pq.write_table(
        pa.table({"lid": [lid for lid, _ in leaders],
                  "lv": [v for _, v in leaders]}),
        os.path.join(ldir, "part-0.parquet"))
    with open(os.path.join(index_dir, "_ivf_meta.json"), "w") as f:
        json.dump({"dim": dim, "n_leaders": n_leaders}, f)


def ivf_topk(spark, index_dir: str, query_vec: list[float],
             k: int | None = 10,
             nprobe: int = 4,
             exclude_ids: list[int] | None = None) -> DataFrame:
    """Approximate top-k from a persisted :func:`build_ivf_index` dir:
    the driver ranks leaders against the query with ONE numpy matmul
    over the leader parquet sidecar (no per-leader Python loops — at
    L=2^14, dim ~1k that is a single 16M-FLOP BLAS call), and the
    ``nprobe`` nearest lists become a partition-pruning
    ``list_id IN (...)`` predicate — only those dirs are read."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq
    with open(os.path.join(index_dir, "_ivf_meta.json")) as f:
        meta = json.load(f)
    ldir = os.path.join(index_dir, "_leaders")
    if os.path.isdir(ldir):
        t = pq.read_table(ldir)
        lids = np.asarray(t.column("lid"), dtype=np.int64)
        lmat = np.array([np.asarray(v, dtype=np.float64)
                         for v in t.column("lv").to_pylist()])
    else:  # pre-sidecar index dirs embedded leaders in the meta JSON
        lids = np.array([lid for lid, _ in meta["leaders"]], dtype=np.int64)
        lmat = np.array([v for _, v in meta["leaders"]], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    ln = np.linalg.norm(lmat, axis=1)
    ln[ln == 0] = 1.0
    # same round-6 + leader-id ordering the SQL oracle applies
    cos = np.round((lmat @ q) / (ln * qn), 6)
    order = np.lexsort((lids, -cos))[:nprobe]
    probes = sorted(int(lids[i]) for i in order)
    df = spark.read.parquet(index_dir).filter(F.col("list_id").isin(probes))
    return cosine_topk(df, query_vec, k, exclude_ids=exclude_ids)


def ann_topk_indexed(spark, index_dir: str, query_vec: list[float],
                     k: int | None = 10, probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k from a persisted :func:`build_ann_index` dir:
    the probe signatures become a partition-pruning ``sig IN (...)``
    predicate, so only the probed buckets are read."""
    import json
    import os
    with open(os.path.join(index_dir, "_ann_meta.json")) as f:
        meta = json.load(f)
    probes = probe_signatures(query_vec, meta["dim"], meta["n_planes"],
                              probe_hamming)
    df = spark.read.parquet(index_dir).filter(F.col("sig").isin(probes))
    return cosine_topk(df, query_vec, k)
