"""Index build pipeline — SURVEY.md §2.4 B1-B6.

The reference's write path (`handlers/documents.go:181-198` ->
`store/store.go:392-426`) hands batches to Bleve, which builds
in-memory segments and background-merges them. Here the same stages
are explicit Spark dataflow with exactly two data shuffles:

  stage 1  docs: deterministic dense doc_id assignment + tokenization
           for doc_len (Arrow-batched), materialized as the ``docs``
           table (attributes + content + sha256 + doc_len — NO token
           arrays: shipping per-doc term arrays through Arrow/parquet
           costs more than the cheap re-tokenize in stage 2)
  stage 2  postings: FUSED tokenize+segment kernel over the source
           (B1: the token arrays never leave the Python worker — they
           go straight into the vectorized map-side combine) ->
           shuffle-merge on ``(term, range_id)`` (B2) -> delta+varint
           blocks with per-block (max_tf, min_dl) skip metadata ->
           bucket(term)-partitioned parquet
  stage 3  term_stats (B4: global df/cf per term) + index_meta
           (N, avgdl, total_tokens)

Scale/skew notes (B5): grouping by ``(term, range_id)`` — not bare
``term`` — structurally bounds every merge group to <= 2**range_bits
entries, so a term appearing in 60% of 10^12 docs still merges as
millions of bounded, parallel groups instead of one straggler. This is
the salting the north rule demands, with a *fixed, query-aligned* salt
(the doc-range), which the query side exploits for shuffle-free
per-range WAND. Global df is recovered by a second, map-side-combined
aggregation over chunk counts (stage 3).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bright_spark.analysis.tokenizer import (count_terms_batch,
                                             count_terms_flat)
from bright_spark.index import codec
from bright_spark.index.catalog import (
    POSTINGS_KERNEL_SCHEMA,
    POSTINGS_SCHEMA,
    IndexCatalog,
    PendingSnapshot,
)
from bright_spark.models import IndexConfig

# shuffle wire format of the tokenize->merge exchange. doc_ids must be
# BIGINT (dense ids are unbounded at 10^12-doc scale); tfs/dls/pos are
# per-doc ordinals/counts (< doc token count < 2^31) and ride as INT —
# at 100 TB the positions array dominates this shuffle's bytes, and
# halving its width halves that traffic. The merge kernel widens back
# to int64 before encoding, so the stored postings bytes are unchanged.
PARTIALS_SCHEMA = ("field STRING, term STRING, range_id BIGINT, "
                   "doc_ids ARRAY<BIGINT>, tfs ARRAY<INT>, "
                   "dls ARRAY<INT>, pos ARRAY<INT>")


# ------------------------------------------------------------ kernels

def _make_tokenize_fn(content_col: str, lang_col: str | None, mode: str,
                      filter_stopwords: bool, passthrough_cols: list[str],
                      id_offsets: dict[int, int] | None = None):
    """mapInPandas kernel: content -> doc_len (token arrays never cross
    the Arrow boundary — postings come from the fused partials kernel).

    Tallying is one factorize + lexsort over the whole record batch
    (count_terms_batch) — the per-doc regex scan is the only
    per-document work (T1-T5 chain from SURVEY.md §2.3).

    When ``id_offsets`` is given (partition id -> starting doc_id) the
    kernel also assigns dense deterministic doc_ids in place: the
    input must be hash-partitioned on the natural key with exactly the
    partition count the offsets were computed for, and sorted within
    partitions — then doc_id = offset[pid] + running row index. This
    fuses identity assignment into the tokenize pass (one data
    materialization instead of staging + window + rewrite)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_id = None
        if id_offsets is not None:
            from pyspark import TaskContext
            next_id = id_offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            texts = pdf[content_col].tolist()
            langs = pdf[lang_col].tolist() if lang_col else [None] * len(texts)
            _, _, dlens = count_terms_batch(texts, mode, langs, filter_stopwords)
            out = pdf[passthrough_cols].copy()
            if next_id is not None:
                out["doc_id"] = pd.Series(
                    range(next_id, next_id + len(pdf)), index=pdf.index,
                    dtype="int64")
                next_id += len(pdf)
            out["doc_len"] = pd.Series(dlens, index=pdf.index, dtype="int32")
            yield out

    return fn


def _emit_partials_flat(doc_ids_flat: np.ndarray, codes: np.ndarray,
                        uniq_terms: np.ndarray, tfs: np.ndarray,
                        dls: np.ndarray, range_bits: int,
                        pos_flat: np.ndarray | None = None
                        ) -> pd.DataFrame | None:
    """FLAT (doc, term) pair arrays -> combined partial posting rows:
    one lexsort + boundary slice, no per-doc or per-entry Python. The
    build hot path feeds this straight from
    :func:`tokenizer.count_terms_flat` (per-batch pair arrays, batch
    dictionaries unified by the caller) — per-doc token arrays never
    exist. ``pos_flat``: per-pair position segments concatenated in
    pair order (segment i holds ``tfs[i]`` values), or None."""
    if codes.size == 0:
        return None
    ranges = doc_ids_flat >> np.int64(range_bits)
    # range_id is monotone in doc_id: (code, doc) order == the full
    # (code, range, doc) order, one lexsort key fewer
    order = np.lexsort((doc_ids_flat, codes))
    codes_o, ranges_o = codes[order], ranges[order]
    tfs_o, dls_o = tfs[order], dls[order]
    doc_ids_o = doc_ids_flat[order]
    boundary = np.flatnonzero(
        np.diff(codes_o).astype(bool) | np.diff(ranges_o).astype(bool)
    ) + 1
    starts = np.concatenate(([0], boundary))
    ends = np.concatenate((boundary, [len(codes_o)]))
    tfs32, dls32 = tfs_o.astype(np.int32), dls_o.astype(np.int32)
    out = {
        "term": np.asarray(uniq_terms, dtype=object)[codes_o[starts]],
        "range_id": ranges_o[starts],
        "doc_ids": [doc_ids_o[s:e] for s, e in zip(starts, ends)],
        "tfs": [tfs32[s:e] for s, e in zip(starts, ends)],
        "dls": [dls32[s:e] for s, e in zip(starts, ends)],
    }
    empty = np.empty(0, dtype=np.int32)
    if pos_flat is None:
        out["pos"] = [empty] * starts.size
    else:
        # ragged gather of per-pair position segments into sorted order
        tf_cum = np.concatenate(([0], np.cumsum(tfs)))
        pair_start = tf_cum[:-1]  # value offset of each pair (input order)
        L = tfs_o
        total = int(L.sum())
        offs = np.concatenate(([0], np.cumsum(L)[:-1]))
        ar = (np.arange(total, dtype=np.int64) - np.repeat(offs, L)
              + np.repeat(pair_start[order], L))
        pos_sorted = pos_flat[ar].astype(np.int32)
        v = np.concatenate(([0], np.cumsum(L)))
        out["pos"] = [pos_sorted[v[s]:v[e]] for s, e in zip(starts, ends)]
    return pd.DataFrame(out)


def _emit_partials(doc_ids: np.ndarray, term_arrs: list, tf_arrs: list,
                   range_bits: int,
                   pos_arrs: list | None = None) -> pd.DataFrame | None:
    """(per-doc ids + token arrays) -> combined partial posting rows.
    Compatibility wrapper over :func:`_emit_partials_flat` for callers
    holding per-doc slices; the build kernel bypasses this and feeds
    flat pair arrays directly. doc_len is derived as Σ tf per doc."""
    lens = np.fromiter((len(t) for t in term_arrs), np.int64, len(term_arrs))
    if lens.sum() == 0:
        return None
    tfs = (np.concatenate([np.asarray(t, dtype=np.int64) for t in tf_arrs])
           if len(tf_arrs) else np.empty(0, dtype=np.int64))
    ends_per_doc = np.cumsum(lens)
    starts_per_doc = ends_per_doc - lens
    tf_cum = np.concatenate(([0], np.cumsum(tfs)))
    dl_per_doc = tf_cum[ends_per_doc] - tf_cum[starts_per_doc]
    doc_ids_flat = np.repeat(np.asarray(doc_ids, dtype=np.int64), lens)
    dls = np.repeat(dl_per_doc, lens)
    terms = np.concatenate([np.asarray(t, dtype=object) for t in term_arrs])
    codes, uniq_terms = pd.factorize(terms, sort=False)
    pos_flat = None
    if pos_arrs is not None:
        pos_flat = (np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pos_arrs])
            if len(pos_arrs) else np.empty(0, dtype=np.int64))
    return _emit_partials_flat(doc_ids_flat, codes, uniq_terms, tfs,
                               dls, range_bits, pos_flat)


def _make_tokenize_partials_fn(field_cols: list[str], lang_col: str | None,
                               mode: str, filter_stopwords: bool,
                               range_bits: int,
                               id_offsets: dict[int, int] | None = None,
                               flush_docs: int = 32768,
                               store_positions: bool = False):
    """FUSED mapInPandas kernel: source rows -> partial posting rows in
    one pass (B1). Token arrays are produced AND combined inside the
    same Python worker — they never cross the Arrow boundary or touch
    parquet, which removes the build's largest data movement.

    Every column in ``field_cols`` is analyzed into its OWN postings
    namespace (Q5 per-field term indexing — Bleve's default mapping
    analyzes each string field, store/store.go:126): one tokenize pass
    per field over the same batch, partial rows tagged with ``field``.
    Per-field doc lengths (Σtf within that field) ride along in the
    partials, so BM25 normalizes against the field's own length.

    With ``id_offsets`` the kernel assigns the same deterministic dense
    doc_ids as the docs stage (same partitioning + sort => same ids);
    without it, input rows carry ``doc_id``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_id = None
        if id_offsets is not None:
            from pyspark import TaskContext
            next_id = id_offsets.get(TaskContext.get().partitionId(), 0)
        # per field: list of per-batch FLAT pair tuples
        # (ids_arr, pair_doc, pair_tid, term_dict, pair_tf, doc_len,
        #  pos_flat) — per-doc token arrays are never materialized
        acc: dict[str, list[tuple]] = {f: [] for f in field_cols}
        n_acc = 0

        def flush() -> Iterator[pd.DataFrame]:
            for f in field_cols:
                parts = [p for p in acc[f] if p[1].size]
                acc[f] = []
                if not parts:
                    continue
                # unify the batch-local term dictionaries: factorize
                # over the (small) concatenated dictionaries only, then
                # remap each batch's codes through its dict offset
                dicts = [p[3] for p in parts]
                union = (np.concatenate(dicts) if len(dicts) > 1
                         else dicts[0])
                ucodes, uniq = pd.factorize(union, sort=False)
                if len(parts) > 1:
                    doffs = np.concatenate(
                        ([0], np.cumsum([d.size for d in dicts])))
                    codes = np.concatenate(
                        [ucodes[doffs[i] + p[2]]
                         for i, p in enumerate(parts)])
                    doc_flat = np.concatenate([p[0][p[1]] for p in parts])
                    tfs = np.concatenate([p[4] for p in parts])
                    dls = np.concatenate([p[5][p[1]] for p in parts])
                    pos_flat = (np.concatenate([p[6] for p in parts])
                                if store_positions else None)
                else:
                    (bids, pair_doc, pair_tid, _, tfs, dl_arr,
                     pos_flat) = parts[0]
                    codes = ucodes[pair_tid]
                    doc_flat, dls = bids[pair_doc], dl_arr[pair_doc]
                    if not store_positions:
                        pos_flat = None
                out = _emit_partials_flat(doc_flat, codes, uniq, tfs,
                                          dls, range_bits, pos_flat)
                if out is not None:
                    out.insert(0, "field", f)
                    yield out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            langs = (pdf[lang_col].tolist() if lang_col
                     else [None] * len(pdf))
            if next_id is not None:
                bids = np.arange(next_id, next_id + len(pdf),
                                 dtype=np.int64)
                next_id += len(pdf)
            else:
                bids = pdf["doc_id"].to_numpy(dtype=np.int64)
            for f in field_cols:
                pair_doc, pair_tid, tdict, pair_tf, dl_arr, pos_flat = \
                    count_terms_flat(pdf[f].tolist(), mode, langs,
                                     filter_stopwords,
                                     positions=store_positions)
                acc[f].append((bids, pair_doc, pair_tid, tdict,
                               pair_tf, dl_arr, pos_flat))
            n_acc += len(pdf)
            if n_acc >= flush_docs:
                yield from flush()
                n_acc = 0
        if n_acc:
            yield from flush()

    return fn


def _make_assign_ids_fn(id_offsets: dict[int, int]):
    """mapInPandas kernel: dense deterministic doc_id assignment from
    per-hash-bucket offsets (U6). Contract as in :meth:`IndexBuilder._keyed`:
    the input carries a ``_pid`` column (pmod(hash(keys), P)), is
    repartitioned on the same keys/P, and sorted by key within
    partitions; doc_id = offset[_pid] + running row index within that
    bucket. Keying on the explicit ``_pid`` column (NOT
    TaskContext.partitionId()) keeps the assignment correct even when a
    downstream union or AQE shifts physical partition indices."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_by_pid = dict(id_offsets)
        for pdf in batches:
            pids = pdf["_pid"].to_numpy()
            ids = np.empty(len(pdf), dtype=np.int64)
            for pid in np.unique(pids):
                m = pids == pid
                base = next_by_pid.get(int(pid), 0)
                ids[m] = np.arange(base, base + int(m.sum()), dtype=np.int64)
                next_by_pid[int(pid)] = base + int(m.sum())
            out = pdf.drop(columns=["_pid"]).copy()
            out["doc_id"] = ids
            yield out

    return fn


def _make_merge_fn(block_size: int, n_buckets: int,
                   store_positions: bool = False):
    """mapInPandas kernel that merges ALL partial posting runs in its
    partition (the preceding ``repartition(n, term, range_id)`` shuffle
    colocates every run of a group). Partition-level merging instead of
    per-group ``applyInPandas`` avoids the per-group Arrow/pandas round
    trip — thousands of tiny (term, range) groups merge as one
    vectorized lexsort + boundary scan (B2)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        lens = pdf["doc_ids"].str.len().to_numpy(dtype=np.int64)
        codes, uniq_terms = pd.factorize(pdf["term"].to_numpy(), sort=False)
        fcodes, uniq_fields = pd.factorize(pdf["field"].to_numpy(), sort=False)
        flat_code = np.repeat(codes, lens)
        flat_fcode = np.repeat(fcodes, lens)
        flat_range = np.repeat(pdf["range_id"].to_numpy(dtype=np.int64), lens)
        flat_doc = np.concatenate(pdf["doc_ids"].to_numpy()).astype(np.int64)
        flat_tf = np.concatenate(pdf["tfs"].to_numpy()).astype(np.int64)
        flat_dl = np.concatenate(pdf["dls"].to_numpy()).astype(np.int64)
        # range_id = doc_id >> bits is monotone in doc_id, so sorting
        # (fcode, code, doc) already lands ranges contiguous+ascending
        # within each (field, term) — the range key would be redundant
        order = np.lexsort((flat_doc, flat_code, flat_fcode))
        flat_code, flat_range = flat_code[order], flat_range[order]
        flat_fcode = flat_fcode[order]
        positions = None
        if store_positions:
            # per-entry position segments, gathered into sorted order
            P = np.concatenate(pdf["pos"].to_numpy()).astype(np.int64)
            ent_start = np.concatenate(([0], np.cumsum(flat_tf)[:-1]))
            L = flat_tf[order]
            total = int(L.sum())
            offs = np.concatenate(([0], np.cumsum(L)[:-1]))
            ar = (np.arange(total, dtype=np.int64) - np.repeat(offs, L)
                  + np.repeat(ent_start[order], L))
            positions = P[ar]
        flat_doc, flat_tf, flat_dl = flat_doc[order], flat_tf[order], flat_dl[order]
        boundary = np.flatnonzero(
            np.diff(flat_code).astype(bool) | np.diff(flat_range).astype(bool)
            | np.diff(flat_fcode).astype(bool)
        ) + 1
        starts = np.concatenate(([0], boundary))
        ends = np.concatenate((boundary, [flat_code.size]))
        blocks, block_group = codec.encode_blocks_bulk(
            flat_doc, flat_tf, flat_dl, starts, block_size,
            positions=positions)
        n_groups = starts.size
        # block index range per group (block_group ascending)
        gb = np.searchsorted(block_group, np.arange(n_groups + 1))
        gcodes = flat_code[starts]
        # one crc32 per UNIQUE term (each term spans many (field,
        # range) groups), fanned out by fancy indexing — no per-group
        # Python loop over group-count-sized lists
        ubucket = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % n_buckets for t in uniq_terms),
            np.int64, len(uniq_terms))
        pairs = list(zip(gb[:-1].tolist(), gb[1:].tolist()))

        def seg(col: list) -> list:
            return [col[s:e] for s, e in pairs]

        cf = np.add.reduceat(flat_tf, starts)
        yield pd.DataFrame({
            "bucket": ubucket[gcodes],
            "field": np.asarray(uniq_fields, dtype=object)[flat_fcode[starts]],
            "term": np.asarray(uniq_terms, dtype=object)[gcodes],
            "range_id": flat_range[starts],
            "df_chunk": (ends - starts).astype(np.int32),
            "cf_chunk": cf,
            "first_doc": seg(blocks["first_doc"]),
            "max_doc": seg(blocks["max_doc"]),
            "n": seg(blocks["n"]),
            "max_tf": seg(blocks["max_tf"]),
            "min_dl": seg(blocks["min_dl"]),
            "docs": seg(blocks["docs"]),
            "tfs": seg(blocks["tfs"]),
            "dls": seg(blocks["dls"]),
            "pos": (seg(blocks["pos"]) if store_positions
                    else [[] for _ in range(n_groups)]),
        })

    return fn


def _staged_part_write(prepared: DataFrame, pending: PendingSnapshot,
                       table: str, part_col: str,
                       delta: bool = False) -> set[int]:
    """Write an already repartitioned/sorted frame into per-partition
    version dirs of ``pending``: one partitionBy job into a staging
    dir, then a driver-side rename of each ``<part_col>=K`` dir into
    its immutable ``data/<table>/<prefix>K/v{N}`` home (rename, not
    copy — same fs). Partitions absent from the output are simply not
    adopted — the caller decides whether they keep their parent
    pointer (untouched) or get dropped (emptied). Returns the set of
    partition keys that received rows."""
    staging = os.path.join(pending.catalog.index_dir, "data", table,
                           f".staging-v{pending.snapshot_id:08d}")
    shutil.rmtree(staging, ignore_errors=True)
    prepared.write.mode("overwrite").partitionBy(part_col).parquet(staging)
    adopt = pending.adopt_part_delta if delta else pending.adopt_part
    written: set[int] = set()
    for name in os.listdir(staging):
        if not name.startswith(part_col + "="):
            continue
        k = int(name.split("=", 1)[1])
        dst = adopt(table, k)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.rmtree(dst, ignore_errors=True)  # crashed prior attempt
        os.rename(os.path.join(staging, name), dst)
        written.add(k)
    shutil.rmtree(staging, ignore_errors=True)
    return written


def stage_postings_write(df: DataFrame, pending: PendingSnapshot,
                         n_buckets: int,
                         files_per_bucket: int = 1,
                         delta: bool = False,
                         width: int | None = None) -> set[int]:
    """Posting rows -> per-bucket version dirs. ``bucket`` stays a
    DATA column in the files (the partition column is a duplicate), so
    reads over explicit bucket dirs keep it.

    ``files_per_bucket`` (S) splits each bucket into deterministic
    doc-range slices (pmod(range_id, S)): write parallelism becomes
    ~n_buckets x S instead of capping at the bucket count, and no
    single file holds a whole bucket. Every file stays term-sorted
    (row-group min/max pruning unchanged) and the per-bucket file
    count stays bounded at S across all mutations. Returns the set of
    buckets that received rows."""
    s = max(1, int(files_per_bucket))
    slot = (F.col("bucket").cast("bigint") * s
            + F.pmod(F.col("range_id"), F.lit(s)))
    prepared = (df.withColumn("pbucket", F.col("bucket"))
                  .repartition(width or (max(1, n_buckets) * s), slot)
                  .sortWithinPartitions("term", "field", "range_id"))
    return _staged_part_write(prepared, pending, "postings", "pbucket",
                              delta=delta)


def stage_docs_write(df: DataFrame, pending: PendingSnapshot,
                     docs_range_bits: int, n_tasks: int) -> set[int]:
    """Doc rows -> per-doc-range version dirs (group = doc_id >>
    docs_range_bits), doc_id-sorted within each group so parquet
    min/max prunes id lookups. Only groups present in ``df`` are
    written/adopted — the mutation copy-on-write unit for the docs
    table. Returns the set of groups that received rows."""
    prepared = (df.withColumn(
                    "dgroup", F.shiftright(F.col("doc_id"),
                                           int(docs_range_bits)))
                  .repartition(max(1, n_tasks), "dgroup")
                  .sortWithinPartitions("dgroup", "doc_id"))
    return _staged_part_write(prepared, pending, "docs", "dgroup")


def stage_term_stats_write(ts: DataFrame, pending: PendingSnapshot,
                           n_buckets: int, n_tasks: int,
                           delta: bool = False) -> set[int]:
    """term_stats rows -> per-bucket version dirs (term-sorted files;
    ``bucket`` stays a data column). Write width: one task per bucket
    is pure scheduling overhead when buckets outnumber the parallel
    slots — several buckets per task still land one term-sorted file
    per bucket dir via partitionBy."""
    prepared = (ts.withColumn("sbucket", F.col("bucket"))
                  .repartition(max(1, min(n_buckets, n_tasks)), "bucket")
                  .sortWithinPartitions("term", "field"))
    return _staged_part_write(prepared, pending, "term_stats", "sbucket",
                              delta=delta)


# ------------------------------------------------------------- driver

class IndexBuilder:
    """Builds one index directory from a source DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        config: IndexConfig,
        index_dir: str,
        *,
        content_col: str = "content",
        key_cols: tuple[str, ...] = ("repo", "path", "commit"),
        id_col: str | None = None,
        lang_col: str | None = "lang",
        attr_cols: tuple[str, ...] = (),
        text_cols: tuple[str, ...] = (),
        n_build_partitions: int | None = None,
        filter_stopwords: bool = False,
    ):
        self.spark = spark
        self.config = config
        self.catalog = IndexCatalog(index_dir)
        self.content_col = content_col
        self.key_cols = key_cols
        self.id_col = id_col
        self.lang_col = lang_col
        # excludeAttributes (models/index.go:6, applied as a disabled
        # field mapping at store/store.go:127-133): excluded columns are
        # neither indexed nor stored — `field:value` on one behaves like
        # an unknown field (no match) and hits never carry it
        excl = set(config.exclude_attributes or ())
        reserved = {content_col, id_col, lang_col, *key_cols} - {None}
        bad = excl & reserved
        if bad:
            raise ValueError(
                f"exclude_attributes cannot cover key/content/lang "
                f"columns: {sorted(bad)}")
        self.attr_cols = tuple(c for c in attr_cols if c not in excl)
        # Q5: extra analyzed text fields, each with its own postings
        # namespace + BM25 stats (Bleve's default mapping analyzes
        # every string field, store/store.go:126; `title:hello` then
        # searches that field's postings, README.md:46)
        self.text_cols = tuple(c for c in text_cols
                               if c != content_col and c not in excl)
        self.n_build_partitions = (n_build_partitions
                                   or spark.sparkContext.defaultParallelism)
        self.filter_stopwords = filter_stopwords
        self._id_offsets: dict[int, int] | None = None
        self._n_docs: int | None = None
        self._docs_schema: str | None = None

    @property
    def field_cols(self) -> list[str]:
        """All analyzed fields; the first is the default search field."""
        return [self.content_col, *self.text_cols]

    # -------------------------------------------------------- stage 1

    def _keyed(self, source: DataFrame,
               cols: list[str]) -> tuple[DataFrame, dict[int, int] | None]:
        """Deterministically partitioned source slice + doc_id offsets.

        id_col path: identity provided by the source (docID =
        stringified PK in the reference, store/store.go:409-414; here a
        numeric PK), hash-partitioned on it.

        natural-key path: deterministic dense doc_ids with ONE cheap
        key-only count pass (the 10^12-row-safe replacement for UUIDv7
        fill, U6) fixing per-partition id offsets; kernels then assign
        doc_id = offset[pid] + local rank over hash(natural key)
        partitions sorted by key. Hash partitioning (not range) because
        Spark's murmur3 bucket is reproducible across jobs/runs — no
        sampled boundaries. The count pass runs once per build (cached
        on self for the second stage).
        """
        src = source.select(*cols)
        p = self.n_build_partitions
        if self.id_col:
            keyed = (src.withColumnRenamed(self.id_col, "doc_id")
                        .withColumn("doc_id", F.col("doc_id").cast("bigint"))
                        .repartition(p, "doc_id"))
            return keyed, None
        if self._id_offsets is None:
            counts = {int(r["_pid"]): int(r["cnt"]) for r in (
                source.select(*self.key_cols)
                      .groupBy(F.pmod(F.hash(*self.key_cols), F.lit(p)).alias("_pid"))
                      .agg(F.count("*").alias("cnt")).collect())}
            offsets, acc = {}, 0
            for pid in sorted(counts):
                offsets[pid] = acc
                acc += counts[pid]
            self._id_offsets = offsets
            self._n_docs = acc
        keyed = (src.repartition(p, *self.key_cols)
                    .sortWithinPartitions(*self.key_cols))
        return keyed, self._id_offsets

    def build_docs(self, source: DataFrame,
                   pending: PendingSnapshot) -> None:
        """Docs table: attributes + content + content_sha256 + doc_len.
        Token arrays are deliberately NOT staged (see module doc).

        Fast path (filter_stopwords=False, the default): doc_len is a
        Catalyst expression (tokenizer.doc_len_sql, parity-tested
        against count_terms), so the stage tokenizes NOTHING in Python —
        the only Python work is the id-assignment kernel on the
        natural-key path, and the id_col path is 100% JVM. The stopword
        path keeps the Arrow tokenize kernel (per-lang sets)."""
        from bright_spark.analysis.tokenizer import doc_len_sql
        cfg = self.config
        cols = list(dict.fromkeys(
            ([self.id_col] if self.id_col else list(self.key_cols))
            + ([self.lang_col] if self.lang_col else [])
            + list(self.attr_cols) + list(self.text_cols)
            + [self.content_col]
        ))
        keyed, id_offsets = self._keyed(source, cols)
        keyed = keyed.withColumn("content_sha256", F.sha2(F.col(self.content_col), 256))
        if not self.filter_stopwords:
            if self.id_col:
                tokenized = keyed
            else:
                p = self.n_build_partitions
                with_pid = keyed.withColumn(
                    "_pid", F.pmod(F.hash(*self.key_cols), F.lit(p)))
                schema = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in keyed.schema.fields) + ", doc_id BIGINT"
                tokenized = with_pid.mapInPandas(
                    _make_assign_ids_fn(id_offsets or {}), schema=schema)
            tokenized = tokenized.withColumn(
                "doc_len",
                F.coalesce(F.expr(doc_len_sql(self.content_col, cfg.tokenizer)),
                           F.lit(0)).cast("int"))
        else:
            passthrough = [c for c in keyed.columns]
            in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                                  for f in keyed.schema.fields)
            id_part = "" if self.id_col else "doc_id BIGINT, "
            out_schema = f"{in_schema}, {id_part}doc_len INT"
            tokenized = keyed.mapInPandas(
                _make_tokenize_fn(self.content_col, self.lang_col, cfg.tokenizer,
                                  self.filter_stopwords, passthrough, id_offsets),
                schema=out_schema,
            )
        if not cfg.store_content:
            tokenized = tokenized.drop(self.content_col)
        # record the docs DDL in this builder (build_stats puts it in
        # the manifest meta): reads then survive empty group dirs and
        # empty corpora, where parquet schema inference fails
        self._docs_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in tokenized.schema.fields)
        # a full build replaces EVERY doc group: forget inherited
        # pointers so groups absent from this corpus drop out
        pending.reset_parts("docs")
        stage_docs_write(tokenized, pending, cfg.docs_range_bits,
                         self.n_build_partitions)

    # -------------------------------------------------------- stage 2

    def build_postings(self, source: DataFrame,
                       pending: PendingSnapshot) -> None:
        """Fused tokenize+segment pass, then the (term, range_id)
        shuffle-merge. When content is stored (default), the pass is a
        shuffle-free columnar scan of the docs table (doc_ids already
        assigned); re-tokenizing is far cheaper than staging per-doc
        token arrays through Arrow + parquet. With store_content=False
        it re-derives the same deterministic doc_ids from the source
        (one extra key shuffle)."""
        cfg = self.config
        fields = self.field_cols
        if cfg.store_content:
            cols = ["doc_id"] + fields + (
                [self.lang_col] if self.lang_col else [])
            scan = self.spark.read.parquet(
                *pending.docs_dirs()).select(*cols)
            # ids are already assigned on this path, so the tokenize
            # kernel is partition-assignment-free — floor its
            # parallelism: the freshly written docs table is many small
            # files that open-cost packing can collapse into one or two
            # scan splits (guide §6), single-threading the heaviest
            # build stage; no-op when the scan is already wide
            from bright_spark.util import fan_out
            scan = fan_out(scan, self.n_build_partitions)
            id_offsets = None
        else:
            cols = list(dict.fromkeys(
                ([self.id_col] if self.id_col else list(self.key_cols))
                + ([self.lang_col] if self.lang_col else []) + fields
            ))
            scan, id_offsets = self._keyed(source, cols)
        partials = scan.mapInPandas(
            _make_tokenize_partials_fn(
                fields, self.lang_col, cfg.tokenizer,
                self.filter_stopwords, cfg.range_bits, id_offsets,
                store_positions=cfg.store_positions),
            schema=PARTIALS_SCHEMA,
        )
        n_merge = self.n_build_partitions
        merged = (partials
                  .repartition(n_merge, "term", "range_id")
                  .mapInPandas(_make_merge_fn(cfg.block_size, cfg.n_term_buckets,
                                              cfg.store_positions),
                               schema=POSTINGS_KERNEL_SCHEMA)
                  .withColumn("ver", F.lit(pending.snapshot_id)))
        # a full build replaces EVERY bucket: forget inherited pointers
        # so buckets absent from this corpus drop out of the snapshot
        pending.tables["postings"] = {}
        # term leads the in-file sort so parquet row-group min/max
        # prunes term lookups; field is a low-cardinality secondary key
        stage_postings_write(merged, pending, cfg.n_term_buckets,
                             cfg.files_per_bucket or 1)

    # -------------------------------------------------------- stage 3

    def _docs_ddl(self, pending: PendingSnapshot) -> str | None:
        """DDL recorded by build_docs, or (resume path, where the docs
        stage was skipped this run) inferred from the pending dirs."""
        if self._docs_schema is None:
            ddirs = pending.docs_dirs()
            if ddirs:
                sch = self.spark.read.parquet(*ddirs).schema
                self._docs_schema = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in sch.fields)
        return self._docs_schema

    @staticmethod
    def _write_index_meta(pending: PendingSnapshot, meta: dict) -> None:
        # single-row table: driver-side pyarrow write (a whole Spark
        # job for one row is pure fixed overhead); nested field_stats
        # stays in the manifest only
        import pyarrow as pa
        import pyarrow.parquet as pq
        im = pending.table_path("index_meta")
        shutil.rmtree(im, ignore_errors=True)
        os.makedirs(im, exist_ok=True)
        flat = {k: v for k, v in meta.items() if not isinstance(v, dict)}
        pq.write_table(pa.Table.from_pylist([flat]),
                       os.path.join(im, "part-0.parquet"))

    def _make_meta(self, n_docs: int, field_tokens: dict[str, int],
                   docs_schema: str | None) -> dict:
        cfg = self.config
        total_tokens = field_tokens.get(self.content_col, 0)
        # per-field BM25 stats: a field absent from a doc contributes
        # length 0, so avgdl_f = Σ dl_f / N over ALL docs
        field_stats = {
            f: {"total_tokens": field_tokens.get(f, 0),
                "avgdl": (field_tokens.get(f, 0) / n_docs) if n_docs else 0.0}
            for f in self.field_cols
        }
        return {
            "n_docs": n_docs,
            # top-level stats are the default (content) field's
            "total_tokens": total_tokens,
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "field_stats": field_stats,
            "k1": cfg.k1,
            "b": cfg.b,
            "tokenizer": cfg.tokenizer,
            "store_positions": cfg.store_positions,
            "filter_stopwords": self.filter_stopwords,
            "range_bits": cfg.range_bits,
            "block_size": cfg.block_size,
            "n_term_buckets": cfg.n_term_buckets,
            "docs_range_bits": cfg.docs_range_bits,
            "docs_schema": docs_schema,
            "version": 4,  # v4: partitioned docs/term_stats CoW
        }

    # below this many bytes of term_stats files, sum the per-field cf
    # totals driver-side with pyarrow instead of scheduling a Spark
    # job — the job itself costs more than reading a few MB; bigger
    # selections (a web-scale vocabulary) stay distributed
    _DRIVER_CF_BYTES = 64 * 1024 * 1024

    def _field_cf_totals(self, dirs: list[str]) -> dict[str, int]:
        """Per-field Σ cf over a set of term_stats dirs — a column-
        pruned scan of the tiny aggregate. Explicit schema: an EMPTY
        selection (delete-everything, emptied buckets) has zero part
        files and inference would fail on the bare _SUCCESS marker."""
        import glob
        from bright_spark.index.catalog import TERM_STATS_SCHEMA
        if not dirs:
            return {}
        files = [f for d in dirs
                 for f in glob.glob(os.path.join(d, "*.parquet"))]
        if (files and sum(os.path.getsize(f) for f in files)
                <= self._DRIVER_CF_BYTES):
            import pyarrow.parquet as pq
            totals: dict[str, int] = {}
            for f in files:
                t = pq.read_table(f, columns=["field", "cf"])
                for fld, cf in zip(t.column("field").to_pylist(),
                                   t.column("cf").to_pylist()):
                    totals[fld] = totals.get(fld, 0) + int(cf or 0)
            return totals
        frows = (self.spark.read.schema(TERM_STATS_SCHEMA).parquet(*dirs)
                 .groupBy("field").agg(F.sum("cf").alias("t")).collect())
        return {r["field"]: int(r["t"] or 0) for r in frows}

    def build_stats(self, pending: PendingSnapshot) -> dict:
        """Stage 3 over the PENDING postings (not yet visible to
        readers): per-bucket term_stats version dirs + index_meta,
        returning the corpus-stats dict the caller commits into the
        manifest. Full-build form — every bucket is (re)computed; the
        mutation path uses :meth:`mutate_stats` (affected buckets
        only)."""
        cfg = self.config
        dirs = pending.postings_dirs()
        # column-pruned read: only (bucket, field, term, df_chunk,
        # cf_chunk) leave the parquet scan
        post = (self.spark.read.schema(POSTINGS_SCHEMA).parquet(*dirs)
                if dirs else
                self.spark.createDataFrame([], POSTINGS_SCHEMA))
        ts = (post.groupBy("bucket", "field", "term")
                  .agg(F.sum("df_chunk").alias("df"), F.sum("cf_chunk").alias("cf")))
        # a full rebuild replaces every stats bucket
        pending.reset_parts("term_stats")
        stage_term_stats_write(ts, pending, cfg.n_term_buckets,
                               self.n_build_partitions)
        # per-field totals: Σ cf (every emitted token lands in exactly
        # one posting run), re-read from the term_stats dirs just
        # written instead of persisting the whole table across jobs;
        # n_docs is tracked during doc_id assignment (no extra scan)
        field_tokens = self._field_cf_totals(
            pending.part_dirs("term_stats"))
        n_docs = getattr(self, "_n_docs", None)
        if n_docs is None:
            # parquet FOOTER row counts of the freshly written docs
            # dirs — exact, O(files) metadata reads, no Spark job (the
            # id_col path never runs the offsets count pass, so this
            # was a full scan+count job per build)
            import glob
            import pyarrow.parquet as pq
            ddirs = pending.docs_dirs()
            n_docs = sum(
                pq.ParquetFile(f).metadata.num_rows
                for d in ddirs
                for f in glob.glob(os.path.join(d, "*.parquet")))
            self._n_docs = n_docs
        meta = self._make_meta(n_docs, field_tokens,
                               self._docs_ddl(pending))
        self._write_index_meta(pending, meta)
        return meta

    def mutate_stats(self, pending: PendingSnapshot, old_meta: dict,
                     delta_df: DataFrame, n_docs: int) -> dict:
        """Stats maintenance for a mutation commit, O(batch): the
        caller derives SIGNED per-(field, term) df/cf deltas from the
        re-tokenized replaced docs (−) and the new batch (+) — no
        postings read at all. The deltas land as append rows in the
        affected buckets' term_stats chains (the reader view sums per
        term; compaction consolidates), and the per-field corpus
        totals advance by the same integer deltas, so results stay
        bit-identical to a full re-aggregation (the mutate==rebuild
        pytest invariant)."""
        cfg = self.config
        from bright_spark.index.catalog import term_bucket_col
        rows = (delta_df
                .withColumn("bucket", term_bucket_col(
                    F.col("term"), cfg.n_term_buckets))
                .select("field", "term", "df", "cf", "bucket"))
        written = stage_term_stats_write(
            rows, pending, cfg.n_term_buckets,
            min(self.n_build_partitions, 8), delta=True)
        # per-field totals delta: Σ of the SIGNED cf rows just written
        # — one tiny directory-pruned read-back (an Observation on the
        # write would save it, but observed metrics do not propagate
        # inside Structured Streaming's foreachBatch, where the sync
        # loop runs this very path)
        new_dirs = [os.path.join(self.catalog.index_dir,
                                 pending.part_rel("term_stats", b))
                    for b in sorted(written)]
        field_delta = self._field_cf_totals(new_dirs)
        old_fs = old_meta.get("field_stats") or {}
        field_tokens = {
            f: (int((old_fs.get(f) or {}).get("total_tokens", 0))
                + field_delta.get(f, 0))
            for f in self.field_cols
        }
        meta = self._make_meta(n_docs, field_tokens,
                               old_meta.get("docs_schema"))
        # the snapshot lineage's bits are authoritative (they shaped
        # the group dirs), not whatever the config file carries
        meta["docs_range_bits"] = old_meta.get("docs_range_bits",
                                               cfg.docs_range_bits)
        self._write_index_meta(pending, meta)
        return meta

    # ----------------------------------------------------------- main

    def resolve_range_bits(self, source: DataFrame) -> None:
        """Auto-size build knobs left as None in the config:

        - range_bits: aim for ~4 doc-ranges per parallel slot so the
          per-range query kernel and the (term, range) merge both fan
          out, with ≥1024-doc spans (bounds postings row counts) and
          ≤2**16-doc spans (the B5 skew bound for web-scale corpora).
        - n_term_buckets: ~the build partition count (bounded [16, 256])
          so the bucket-partitioned postings write parallelizes.
        - docs_range_bits: docs-table CoW group span, ~one group per
          build partition, spans bounded [2**12, 2**22]: small enough
          that a mutation's group rewrite stays proportional to its
          change set, large enough that the manifest's group map stays
          compact at 10^12 docs (~2.4e8/2**22 ≈ 60k entries).
        """
        repl: dict = {}
        if self.config.n_term_buckets is None:
            repl["n_term_buckets"] = min(256, max(16, self.n_build_partitions))
        if self.config.files_per_bucket is None:
            nb = repl.get("n_term_buckets", self.config.n_term_buckets)
            repl["files_per_bucket"] = max(1, self.n_build_partitions
                                           // max(1, nb))
        if (self.config.range_bits is None
                or self.config.docs_range_bits is None):
            if self._n_docs is None:
                self._n_docs = int(source.count())
            n_docs = self._n_docs
            if self.config.range_bits is None:
                slots = self.spark.sparkContext.defaultParallelism
                span = max(1024, n_docs // max(4 * slots, 1))
                repl["range_bits"] = min(16, max(10, int(span).bit_length() - 1))
            if self.config.docs_range_bits is None:
                dspan = max(1024, n_docs // max(1, self.n_build_partitions))
                repl["docs_range_bits"] = min(
                    22, max(10, int(dspan).bit_length() - 1))
        if repl:
            self.config = dataclasses.replace(self.config, **repl)

    def build(self, source: DataFrame) -> IndexCatalog:
        self.resolve_range_bits(source)
        self.catalog.save_config(self.config, extra={
            "content_col": self.content_col,
            "key_cols": list(self.key_cols),
            "id_col": self.id_col,
            "lang_col": self.lang_col,
            "attr_cols": list(self.attr_cols),
            "text_cols": list(self.text_cols),
            "filter_stopwords": self.filter_stopwords,
            "n_build_partitions": self.n_build_partitions,
        })
        import time
        t0 = time.time()
        pending = self.catalog.begin()
        self.build_docs(source, pending)
        self.build_postings(source, pending)
        meta = self.build_stats(pending)
        pending.commit(meta, "build", metrics={
            "n_docs": meta["n_docs"],
            "buckets_written": len(pending.tables["postings"]),
            "wall_ms": int((time.time() - t0) * 1000)})
        return self.catalog


def detect_primary_key(source: DataFrame) -> str:
    """U5 auto-detection (store/store.go:559-594): the single column
    whose name ends with 'id' (case-insensitive). Errors on zero or
    multiple candidates, exactly like the reference."""
    candidates = sorted(c for c in source.columns if c.lower().endswith("id"))
    if not candidates:
        raise ValueError("no primary key candidate found "
                         "(no attribute ending with 'id')")
    if len(candidates) > 1:
        raise ValueError(f"multiple primary key candidates found: {candidates}")
    return candidates[0]


def build_index(spark: SparkSession, source: DataFrame, index_dir: str,
                config: IndexConfig | None = None, **kwargs) -> IndexCatalog:
    cfg = config or IndexConfig(id=os.path.basename(index_dir.rstrip("/")))
    return IndexBuilder(spark, cfg, index_dir, **kwargs).build(source)
