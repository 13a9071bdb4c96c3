"""On-disk index catalog — the Spark-native analog of a Bleve index dir.

The reference persists one Bleve scorch directory per index under
``<dataDir>/<indexID>`` plus a ``configs.json`` (store/store.go:91,
226-282). Our index is a directory of columnar tables:

    <index_dir>/
      config.json      index + build configuration (configs.json analog)
      meta.json        corpus stats (n_docs, avgdl, ...) — driver-fast copy
      docs/            parquet: doc_id, natural key / attribute columns,
                       content (optional), content_sha256, doc_len
      postings/        parquet, dir-partitioned by bucket=crc32(term)%B:
                       (term, range_id) rows of compressed posting blocks
      term_stats/      parquet by bucket: term -> global df, cf
      index_meta/      single-row parquet mirror of meta.json
      checkpoints/     per-shard build lineage rows (resumability)

On a real deployment these would be Iceberg tables (bucket(term)
partition transform, snapshot commits standing in for Bleve's immutable
segments + merges); the sandbox image has no Iceberg jars, so the
layout is plain partitioned Parquet with the same pruning behavior:
directory pruning on ``bucket``, row-group min/max pruning on ``term``
(rows are written sorted by term within each bucket).
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import asdict
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bright_spark.models import IndexConfig

POSTINGS_SCHEMA = (
    "bucket INT, field STRING, term STRING, range_id BIGINT, "
    "df_chunk INT, cf_chunk BIGINT, "
    "first_doc ARRAY<BIGINT>, max_doc ARRAY<BIGINT>, n ARRAY<INT>, "
    "max_tf ARRAY<INT>, min_dl ARRAY<INT>, "
    "docs ARRAY<BINARY>, tfs ARRAY<BINARY>, dls ARRAY<BINARY>, "
    # per-block absolute-varint positions (empty when the index was
    # built with store_positions=False)
    "pos ARRAY<BINARY>"
)


def term_bucket(term: str, n_buckets: int) -> int:
    """crc32(term) % B — matches Spark's ``F.crc32`` (same polynomial),
    so the driver can compute the partition of a query term without a
    scan, and the build can compute it JVM-side."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col, n_buckets: int):
    return (F.crc32(F.encode(term_col, "UTF-8")) % n_buckets).cast("int")


class IndexCatalog:
    """Paths + config/meta persistence for one index."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.docs_path = os.path.join(index_dir, "docs")
        self.postings_path = os.path.join(index_dir, "postings")
        self.term_stats_path = os.path.join(index_dir, "term_stats")
        self.index_meta_path = os.path.join(index_dir, "index_meta")
        self.checkpoints_path = os.path.join(index_dir, "checkpoints")
        self.config_file = os.path.join(index_dir, "config.json")
        self.meta_file = os.path.join(index_dir, "meta.json")

    # ---------------------------------------------------------- config

    def exists(self) -> bool:
        return os.path.exists(self.config_file)

    def save_config(self, config: IndexConfig, extra: dict[str, Any] | None = None) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        payload = {"config": asdict(config), "extra": extra or {}}
        with open(self.config_file, "w") as f:
            json.dump(payload, f, indent=2, default=list)

    def load_config(self) -> IndexConfig:
        with open(self.config_file) as f:
            payload = json.load(f)
        c = payload["config"]
        c["exclude_attributes"] = tuple(c.get("exclude_attributes") or ())
        return IndexConfig(**c)

    def load_extra(self) -> dict[str, Any]:
        with open(self.config_file) as f:
            return json.load(f).get("extra", {})

    # ------------------------------------------------------------ meta

    def save_meta(self, meta: dict[str, Any]) -> None:
        with open(self.meta_file, "w") as f:
            json.dump(meta, f, indent=2)

    def load_meta(self) -> dict[str, Any]:
        with open(self.meta_file) as f:
            return json.load(f)

    # ----------------------------------------------------------- reads

    def docs(self, spark: SparkSession, include_build_cols: bool = False) -> DataFrame:
        df = spark.read.parquet(self.docs_path)
        if not include_build_cols:
            df = df.drop("_term_arr", "_tf_arr", "_pid")
        return df

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.postings_path)

    @staticmethod
    def _pair_filter(pairs: list[tuple[str, str]]):
        """(field, term) pairs -> a pushable predicate: one term
        IN-list per field (field count is tiny), OR-ed together."""
        by_field: dict[str, list[str]] = {}
        for f, t in pairs:
            by_field.setdefault(f, []).append(t)
        cond = None
        for f in sorted(by_field):
            c = (F.col("field") == f) & F.col("term").isin(sorted(set(by_field[f])))
            cond = c if cond is None else (cond | c)
        return cond

    def postings_for_terms(self, spark: SparkSession,
                           pairs: list[tuple[str, str]]) -> DataFrame:
        """Partition-pruned posting lookup for (field, term) pairs:
        explicit bucket predicate prunes directories; the term IN-list
        prunes row groups via parquet min/max (rows are term-sorted
        within files; field is a secondary sort key). This is the FST
        term-dictionary-seek analog (SURVEY.md §4)."""
        cfg = self.load_config()
        buckets = sorted({term_bucket(t, cfg.n_term_buckets) for _, t in pairs})
        df = self.postings(spark)
        return df.filter(F.col("bucket").isin(buckets) & self._pair_filter(pairs))

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.term_stats_path)

    def term_stats_for_terms(self, spark: SparkSession,
                             pairs: list[tuple[str, str]]) -> DataFrame:
        cfg = self.load_config()
        buckets = sorted({term_bucket(t, cfg.n_term_buckets) for _, t in pairs})
        df = self.term_stats(spark)
        return df.filter(F.col("bucket").isin(buckets) & self._pair_filter(pairs))
