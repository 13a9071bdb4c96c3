"""Document mutations + incremental index maintenance (U1-U4, S5/S6).

Reference semantics:
- upsert: adding a doc with an existing id replaces it
  (handlers/documents.go:181-198, store/store.go:409-426)
- delete by id list (documents.go:231-234) and delete by query filter
  (documents.go:235-248, store/store.go:450-512)
- partial update: fetch stored doc, merge fields, re-index
  (documents.go:280-320)
- incremental source sync applies the same callbacks from a polled
  changeset (ingresses/postgres/poller.go) — here, callers pass the
  changed rows; checkpointing the watermark belongs to the caller's
  ingestion job (see checkpoints.CheckpointStore).

Physical strategy (the Iceberg MERGE INTO analog on plain parquet):
only the term-hash **buckets touched by changed terms are rewritten**
— into NEW immutable version dirs of a pending snapshot; every other
bucket keeps its parent-manifest pointer (pointer copy, zero data
copy). Changed doc ids are removed from decoded posting runs (via one
numpy broadcast up to ``broadcast_threshold`` ids, an entry-level
anti-join above it), new entries merged in per analyzed field, blocks
re-encoded — all Arrow-batched. New natural keys get dense ids above
the current max via the builder's per-partition offset scheme (no
global window). Corpus stats (N, per-field avgdl) are recomputed; the
docs rewrite, bucket rewrites, and stats tables become visible in ONE
atomic manifest commit (catalog.py write protocol) — a crash
mid-mutation leaves the previous snapshot untouched, and readers
pinned to it (SearchEngine pins at construction) never see a torn
index. Block (max_tf, min_dl) skip metadata stays sound because
bounds are evaluated against current stats at query time (codec.py).

Invariant (tested): mutate-then-query == full-rebuild-then-query.

No background compaction is needed (the reference's Bleve scorch runs
a background segment merger): every write — initial build and every
mutation — repartitions on (bucket, range-slice) before a partitionBy
write, so each bucket directory always holds at most
``files_per_bucket`` term-sorted files (tested in test_mutations.py);
file count never grows with mutation count — there is no segment
accumulation to merge away.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bright_spark.index import codec
from bright_spark.index.builder import (
    PARTIALS_SCHEMA,
    IndexBuilder,
    _make_assign_ids_fn,
    _make_merge_fn,
    _make_tokenize_fn,
    _make_tokenize_partials_fn,
    stage_docs_write,
    stage_postings_write,
)
from bright_spark.index.catalog import (
    POSTINGS_SCHEMA,
    IndexCatalog,
    term_bucket_col,
)


def _decode_to_partials(range_bits: int, store_positions: bool = False,
                        drop_bc=None):
    """Posting rows -> partial-run rows, dropping the doc ids in the
    ``drop_bc`` broadcast (a sorted int64 numpy array: broadcast, not a
    plan-literal array, so million-row change sets don't explode the
    query plan)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = np.empty(0, dtype=np.int64)
        drop = (np.asarray(drop_bc.value, dtype=np.int64)
                if drop_bc is not None else empty)
        for pdf in batches:
            fields, terms, ranges, ds, ts, ls, ps = [], [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                d, t, l = codec.decode_all_blocks({
                    "first_doc": row.first_doc, "docs": row.docs,
                    "tfs": row.tfs, "dls": row.dls})
                pos = (codec.decode_concat(list(row.pos)).astype(np.int64)
                       if store_positions else empty)
                if drop.size:
                    keep = ~np.isin(d, drop)
                    if store_positions and pos.size:
                        pos = pos[np.repeat(keep, t)]
                    d, t, l = d[keep], t[keep], l[keep]
                if d.size == 0:
                    continue
                fields.append(row.field)
                terms.append(row.term)
                ranges.append(int(row.range_id))
                ds.append(d)
                ts.append(t)
                ls.append(l)
                ps.append(pos)
            if terms:
                yield pd.DataFrame({"field": fields, "term": terms,
                                    "range_id": ranges,
                                    "doc_ids": ds, "tfs": ts, "dls": ls,
                                    "pos": ps})

    return fn


ENTRIES_SCHEMA = ("field STRING, term STRING, range_id BIGINT, "
                  "doc_id BIGINT, tf BIGINT, dl BIGINT, pos ARRAY<BIGINT>")


def _decode_to_entries(store_positions: bool = False):
    """Posting rows -> one row per posting ENTRY (the exploded form the
    huge-change-set path anti-joins against the changed-id DataFrame —
    no driver collect, no executor broadcast)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = np.empty(0, dtype=np.int64)
        for pdf in batches:
            parts = []
            for row in pdf.itertuples(index=False):
                d, t, l = codec.decode_all_blocks({
                    "first_doc": row.first_doc, "docs": row.docs,
                    "tfs": row.tfs, "dls": row.dls})
                if d.size == 0:
                    continue
                if store_positions:
                    pos = codec.decode_concat(list(row.pos)).astype(np.int64)
                    bounds = np.concatenate(([0], np.cumsum(t)))
                    segs = [pos[bounds[i]:bounds[i + 1]]
                            for i in range(d.size)]
                else:
                    segs = [empty] * d.size
                parts.append(pd.DataFrame({
                    "field": row.field, "term": row.term,
                    "range_id": int(row.range_id),
                    "doc_id": d, "tf": t, "dl": l, "pos": segs}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return fn


class IndexMutator:
    # change sets up to this many ids travel as one numpy broadcast into
    # the posting-drop kernel; above it (a driver-OOM regime at ~10^8
    # ids) the drop switches to an entry-level anti-join
    BROADCAST_THRESHOLD = 2_000_000

    def __init__(self, spark: SparkSession, index_dir: str,
                 broadcast_threshold: int | None = None):
        self.spark = spark
        self.catalog = IndexCatalog(index_dir)
        self.config = self.catalog.load_config()
        self.extra = self.catalog.load_extra()
        self.broadcast_threshold = (self.BROADCAST_THRESHOLD
                                    if broadcast_threshold is None
                                    else broadcast_threshold)

    # ------------------------------------------------------- internals

    def _builder(self) -> IndexBuilder:
        return IndexBuilder(
            self.spark, self.config, self.catalog.index_dir,
            content_col=self.extra.get("content_col", "content"),
            key_cols=tuple(self.extra.get("key_cols") or ()),
            id_col=self.extra.get("id_col"),
            lang_col=self.extra.get("lang_col"),
            attr_cols=tuple(self.extra.get("attr_cols") or ()),
            text_cols=tuple(self.extra.get("text_cols") or ()),
            filter_stopwords=bool(self.extra.get("filter_stopwords")),
        )

    def _field_partials(self, rows: DataFrame) -> DataFrame:
        """Per-field partial posting rows for ``rows`` (must carry
        ``doc_id`` + every analyzed field column): the same fused
        tokenize+combine kernel the bulk build uses (B1), one namespace
        per field (Q5)."""
        b = self._builder()
        cols = ["doc_id"] + b.field_cols + ([b.lang_col] if b.lang_col else [])
        return rows.select(*cols).mapInPandas(
            _make_tokenize_partials_fn(
                b.field_cols, b.lang_col, self.config.tokenizer,
                b.filter_stopwords, self.config.range_bits,
                store_positions=self.config.store_positions),
            schema=PARTIALS_SCHEMA)

    def _key_cols(self) -> list[str]:
        if self.extra.get("id_col"):
            return ["doc_id"]
        return list(self.extra.get("key_cols") or ("repo", "path", "commit"))

    def _tokenize_updates(self, updates: DataFrame) -> DataFrame:
        """Compute doc_len/sha256 for changed rows and assign doc_ids:
        existing natural keys keep their id (upsert replaces,
        store.go:416); new keys get ids above the current max, ranked by
        natural key."""
        b = self._builder()
        keys = self._key_cols()
        if self.extra.get("id_col"):
            updates = (updates.withColumnRenamed(self.extra["id_col"], "doc_id")
                       .withColumn("doc_id", F.col("doc_id").cast("bigint")))
        src = updates.withColumn(
            "content_sha256", F.sha2(F.col(b.content_col), 256))
        if not b.filter_stopwords:
            # JVM doc_len (exact tokenizer parity — builder fast path)
            from bright_spark.analysis.tokenizer import doc_len_sql
            tokenized = src.withColumn(
                "doc_len",
                F.coalesce(F.expr(doc_len_sql(b.content_col,
                                              self.config.tokenizer)),
                           F.lit(0)).cast("int"))
        else:
            tokenized = src.mapInPandas(
                _make_tokenize_fn(b.content_col, b.lang_col,
                                  self.config.tokenizer,
                                  b.filter_stopwords, list(src.columns)),
                schema=", ".join(f"{f.name} {f.dataType.simpleString()}"
                                 for f in src.schema.fields) + ", doc_len INT")
        if self.extra.get("id_col"):
            return tokenized
        docs = self.catalog.docs(self.spark).select(*keys, "doc_id")
        joined = tokenized.join(docs, keys, "left")
        olds = joined.filter(F.col("doc_id").isNotNull())
        news_src = joined.filter(F.col("doc_id").isNull()).drop("doc_id")
        # new keys get dense ids above the current max via the builder's
        # per-partition offset scheme (builder._keyed): one key-only
        # count pass fixes offsets, then each partition assigns locally.
        # No global window — a first full sync through StreamingIngestor
        # IS a large upsert batch, and a single-task rank would be its
        # straggler at 10^12 docs. max_doc_id reads only the top doc
        # group dir (groups are id ranges), not the whole docs table.
        max_id = self.catalog.max_doc_id(self.spark)
        max_id = -1 if max_id is None else int(max_id)
        p = int(self.extra.get("n_build_partitions")
                or self.spark.sparkContext.defaultParallelism)
        counts = {int(r["_pid"]): int(r["cnt"]) for r in (
            news_src.select(*keys)
            .groupBy(F.pmod(F.hash(*keys), F.lit(p)).alias("_pid"))
            .agg(F.count("*").alias("cnt")).collect())}
        if not counts:
            return olds
        offsets, acc = {}, max_id + 1
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in news_src.schema.fields) + ", doc_id BIGINT"
        news = (news_src
                .withColumn("_pid", F.pmod(F.hash(*keys), F.lit(p)))
                .repartition(p, *keys)
                .sortWithinPartitions(*keys)
                .mapInPandas(_make_assign_ids_fn(offsets), schema=schema))
        return olds.unionByName(news)

    # ------------------------------------------------------ operations

    def upsert(self, updates: DataFrame) -> None:
        """U1/U4: replace-or-insert documents from source-shaped rows.
        The tokenized batch joins the current docs table for id
        assignment, so its lineage is truncated (localCheckpoint)
        before _apply rewrites that table."""
        tok = self._tokenize_updates(updates).localCheckpoint(eager=True)
        self._apply(changed=tok)

    def delete_ids(self, doc_ids: list[int]) -> None:
        """U2: delete by id list."""
        self._apply(deleted_ids=[int(i) for i in doc_ids])

    def delete_where(self, ids_df: DataFrame) -> None:
        """U2/U3 bulk form: delete every doc_id in a DataFrame — the
        change set never passes through the driver as a Python list."""
        self._apply(deleted_df=ids_df.select("doc_id"))

    def delete_by_query(self, q: str) -> None:
        """U3: delete every doc matching a query-string filter — the
        same evaluator as search (store/store.go:450-512); the match
        set flows as a DataFrame."""
        from bright_spark.query.engine import SearchEngine
        eng = SearchEngine(self.spark, self.catalog.index_dir)
        self.delete_where(eng.match_df(q))

    def patch(self, doc_id: int, fields: dict) -> None:
        """U4: fetch stored doc, merge fields, re-index whole doc.
        The fetch is group-dir-pruned (docs_for_ids)."""
        row = self.catalog.docs_for_ids(self.spark, [int(doc_id)]).collect()
        if not row:
            raise KeyError(f"doc_id {doc_id} not found")
        rec = row[0].asDict()
        rec.pop("doc_len", None)
        rec.pop("content_sha256", None)
        rec.pop("_pid", None)
        rec.update(fields)
        if self.extra.get("id_col"):
            rec[self.extra["id_col"]] = rec.pop("doc_id")
        else:
            rec.pop("doc_id", None)
        upd = self.spark.createDataFrame([rec])
        self.upsert(upd)

    # ------------------------------------------------------- the apply

    def _apply(self, changed: DataFrame | None = None,
               deleted_ids: list[int] | None = None,
               deleted_df: DataFrame | None = None) -> None:
        """Change sets travel as DataFrames/joins — never as
        plan-literal IN-lists — so a million-document sync batch plans
        the same as a 10-document one. Up to ``broadcast_threshold``
        ids the posting drop runs inside the decode kernel against one
        numpy broadcast; above it (too large to ship to every executor,
        yet far from rebuild territory at 10^12 docs) the drop becomes
        an entry-level anti-join on the changed-id DataFrame."""
        spark = self.spark
        if deleted_ids is not None and changed is None and deleted_df is None:
            # driver-provided id list: zero Spark jobs to materialize
            arr = np.unique(np.asarray([int(i) for i in deleted_ids],
                                       dtype=np.int64))
        else:
            ids_src = (changed if changed is not None
                       else deleted_df).select("doc_id").distinct()
            # ONE probe job collects the whole id set when it fits the
            # broadcast regime (the overwhelmingly common case) — no
            # separate count + collect + checkpoint jobs
            rows = ids_src.limit(self.broadcast_threshold + 1).collect()
            if len(rows) > self.broadcast_threshold:
                # huge change set: entry-level anti-join path. Eager
                # localCheckpoint truncates lineage: a delete-by-query
                # id set reads the very dirs whose pointers this apply
                # replaces, and must never be recomputed mid-apply
                ids_df = ids_src.localCheckpoint(eager=True)
                n_changed = ids_df.count()
                if n_changed == 0:
                    return
                self._apply_inner(changed, ids_df, drop_bc=None,
                                  n_changed=n_changed)
                return
            arr = np.unique(np.array([r["doc_id"] for r in rows],
                                     dtype=np.int64))
        if arr.size == 0:
            return
        # the id set is a driver literal now — rebuilding ids_df from
        # it (Arrow path) removes the recompute hazard without a
        # checkpoint job
        ids_df = spark.createDataFrame(pd.DataFrame({"doc_id": arr}))
        drop_bc = spark.sparkContext.broadcast(arr)
        try:
            self._apply_inner(changed, ids_df, drop_bc,
                              n_changed=int(arr.size))
        finally:
            drop_bc.unpersist()

    def _apply_inner(self, changed: DataFrame | None, ids_df: DataFrame,
                     drop_bc, n_changed: int = 0) -> None:
        cfg = self.config
        spark = self.spark
        pending = self.catalog.begin()
        old_meta = self.catalog.load_meta()
        if not self.config.store_content:
            raise ValueError("mutations re-tokenize replaced docs from "
                             "stored content; store_content=False is not "
                             "supported")
        # layout v3 (single docs/term_stats version dir, no group bits
        # in meta): this mutation migrates those tables to the v4
        # partitioned form with ONE full rewrite, then every later
        # mutation is O(change)
        legacy = (not isinstance(pending.tables.get("docs"), dict)
                  or not isinstance(pending.tables.get("term_stats"), dict)
                  or old_meta.get("docs_range_bits") is None)
        if legacy and cfg.docs_range_bits is None:
            import dataclasses
            n_old = int(old_meta.get("n_docs") or 0)
            p = int(self.extra.get("n_build_partitions")
                    or spark.sparkContext.defaultParallelism)
            dspan = max(4096, n_old // max(1, p))
            cfg = dataclasses.replace(
                cfg, docs_range_bits=min(22, max(12, dspan.bit_length() - 1)))
            self.config = cfg
        bits = int(old_meta.get("docs_range_bits")
                   if not legacy else cfg.docs_range_bits)

        # ---- affected doc-range groups: the docs-table CoW unit.
        # ids_df carries every changed id (replacements, deletes AND
        # newly assigned ids), so its group set is exactly the set of
        # group dirs this mutation may rewrite — nothing else is read.
        # With the broadcast id array on the driver, groups AND the
        # changed posting ranges come from numpy — zero Spark jobs.
        range_bits = int(old_meta.get("range_bits") or cfg.range_bits or 0)
        changed_ranges: list[int] | None = None
        if drop_bc is not None:
            arr = np.asarray(drop_bc.value, dtype=np.int64)
            affected_groups = [int(g) for g in np.unique(arr >> bits)]
            changed_ranges = [int(r) for r in
                              np.unique(arr >> np.int64(range_bits))]
        else:
            affected_groups = sorted(
                int(r["g"]) for r in ids_df.select(
                    F.shiftright("doc_id", bits).alias("g"))
                .distinct().collect())
        if legacy:
            docs_scan = self.catalog.docs(spark, include_build_cols=True)
        else:
            docs_scan = self.catalog.docs(spark, include_build_cols=True,
                                          groups=affected_groups)
        # the docs table stores no token arrays (build module doc) —
        # re-tokenize the replaced set from stored field text, across
        # EVERY analyzed field (their old entries must leave the index).
        # Checkpointing the (small) replaced slice means the pruned
        # group dirs are scanned ONCE — the tokenize pass and the
        # n_present count both read the checkpoint.
        replaced = (docs_scan.join(ids_df, "doc_id", "left_semi")
                    .localCheckpoint(eager=True))
        # ids actually present (a delete of an absent id must not move
        # n_docs) — a count over the tiny checkpoint
        n_present = replaced.count()
        new_partials = (self._field_partials(changed)
                        if changed is not None else None)
        terms_df = self._field_partials(replaced).select("term")
        if new_partials is not None:
            terms_df = terms_df.unionByName(new_partials.select("term"))
        # eager lineage truncation, not persist: terms_df is consumed
        # by several downstream joins, and an evicted cache would
        # silently recompute the tokenize pass each time
        terms_df = terms_df.distinct().localCheckpoint(eager=True)
        # bucket set is tiny (<= n_term_buckets) — the only collect
        affected_buckets = sorted(
            r["b"] for r in terms_df.select(
                term_bucket_col(F.col("term"), cfg.n_term_buckets).alias("b"))
            .distinct().collect())
        if not affected_buckets:
            affected_buckets = []

        # ---- docs table: copy-on-write doc-range groups — only the
        # affected groups' survivors + the changed docs are rewritten
        # into new version dirs; every other group keeps its parent
        # pointer (never even listed). Visible only at commit.
        survivors = docs_scan.join(ids_df, "doc_id", "left_anti")
        new_docs = survivors
        if changed is not None:
            new_docs = survivors.unionByName(changed.select(*survivors.columns))
        par = spark.sparkContext.defaultParallelism
        if legacy:
            pending.reset_parts("docs")
            docs_width = par
        else:
            # width ~ the affected group count: a small mutation should
            # not schedule a full-width shuffle of 50 rows
            docs_width = min(par, max(2, 2 * len(affected_groups)))
        written_groups = stage_docs_write(new_docs, pending, bits, docs_width)
        for g in set(affected_groups or ()) - written_groups:
            pending.drop_part("docs", g)  # group emptied by a delete

        # ---- postings: copy-on-write — ONLY affected buckets' live
        # dirs are read and re-versioned; every other bucket keeps its
        # parent pointer untouched (never even listed). Within them,
        # only rows in the CHANGED doc ranges can hold a changed id or
        # receive a new entry — rows of other ranges bypass the Python
        # decode/merge entirely (a JVM passthrough), so the kernel work
        # is O(changed ranges), not O(touched terms' full postings)
        in_buckets = self.catalog.postings(spark, buckets=affected_buckets)
        if changed_ranges is not None and len(changed_ranges) <= 1024:
            in_range = F.col("range_id").isin(changed_ranges)
            untouched = (in_buckets.filter(~in_range)
                         .unionByName(in_buckets.filter(in_range)
                                      .join(terms_df, "term", "left_anti")))
            touched = (in_buckets.filter(in_range)
                       .join(terms_df, "term", "left_semi"))
        else:
            untouched = in_buckets.join(terms_df, "term", "left_anti")
            touched = in_buckets.join(terms_df, "term", "left_semi")
        touched_sel = touched.select("field", "term", "range_id",
                                     "first_doc", "docs", "tfs", "dls", "pos")
        if drop_bc is not None:
            surviving_partials = touched_sel.mapInPandas(
                _decode_to_partials(cfg.range_bits, cfg.store_positions,
                                    drop_bc=drop_bc),
                schema=PARTIALS_SCHEMA)
        else:
            # huge change set: entry-level anti-join instead of a
            # broadcast drop; survivors re-enter the merge as singleton
            # partial runs (the merge kernel regroups them anyway)
            entries = touched_sel.mapInPandas(
                _decode_to_entries(cfg.store_positions),
                schema=ENTRIES_SCHEMA)
            surviving_partials = (
                entries.join(ids_df, "doc_id", "left_anti")
                .select("field", "term", "range_id",
                        F.array("doc_id").alias("doc_ids"),
                        F.array("tf").alias("tfs"),
                        F.array("dl").alias("dls"),
                        F.col("pos")))
        partials = surviving_partials
        if new_partials is not None:
            partials = partials.unionByName(new_partials)
        n_merge = min(par, max(4, len(affected_buckets)
                               * (cfg.files_per_bucket or 1)))
        remerged = (partials.repartition(n_merge, "term", "range_id")
                    .mapInPandas(_make_merge_fn(cfg.block_size,
                                                cfg.n_term_buckets,
                                                cfg.store_positions),
                                 schema=POSTINGS_SCHEMA))
        rebuilt = untouched.unionByName(remerged)
        written = stage_postings_write(rebuilt, pending,
                                       len(affected_buckets) or 1,
                                       cfg.files_per_bucket or 1)
        for b in affected_buckets:
            if b not in written:
                pending.drop_postings_bucket(b)  # bucket emptied

        # ---- term_stats + meta: O(affected buckets) delta maintenance
        # (mutate_stats) — or, on a legacy index, the one-time full
        # recompute that migrates stats to the per-bucket layout —
        # then ONE atomic commit for docs + buckets + stats together
        n_docs_new = (int(old_meta.get("n_docs") or 0) - n_present
                      + (n_changed if changed is not None else 0))
        b = self._builder()
        if legacy:
            b._n_docs = n_docs_new
            meta = b.build_stats(pending)
        else:
            meta = b.mutate_stats(pending, old_meta, affected_buckets,
                                  n_docs_new)
        pending.commit(
            meta, "upsert" if changed is not None else "delete",
            metrics={"n_changed": n_changed,
                     "buckets_rewritten": len(affected_buckets),
                     "docs_groups_rewritten": len(written_groups)})
