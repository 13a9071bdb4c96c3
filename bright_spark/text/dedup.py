"""Deduplication operators for large-scale training-data pipelines.

All-JVM dataflow (built-in ``pyspark.sql.functions`` only — no Python
in the hot path) so Catalyst/WSCG handle 100 TB inputs:

- exact dedup: hash-groupBy on md5(text) — one shuffle on the hash,
  map-side combine does the heavy lifting for common duplicates
- MinHash + LSH: shingle -> n deterministic md5-salted min-hashes ->
  band buckets -> bucket self-join for candidate pairs -> exact
  n-gram Jaccard verification. Hash = md5(salt || shingle), min taken
  lexicographically: portable across engines (the test oracle
  recomputes it in SQL), deterministic across runs (north-rule
  reproducibility: no Random()).
- SimHash: 32-bit signature from md5-derived token bits weighted by
  tf; near-dups = signatures within Hamming distance d.

Deterministic by construction; every operator returns a DataFrame and
never collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens_col(text_col: str = "text"):
    """Whitespace tokens, lowercased (``simple`` analyzer, matching
    bright_spark.analysis.tokenizer mode='simple')."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


from bright_spark.util import fan_out  # noqa: F401  (re-export; used below)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, content_hash, canonical_id, group_size); canonical =
    min doc_id of the identical-text group. Keep rows where
    doc_id != canonical_id to drop duplicates."""
    hashed = fan_out(df).select(F.col(id_col).alias("doc_id"),
                                F.md5(F.col(text_col)).alias("content_hash"))
    groups = (hashed.groupBy("content_hash")
              .agg(F.min("doc_id").alias("canonical_id"),
                   F.count("*").alias("group_size")))
    return hashed.join(groups, "content_hash").select(
        "doc_id", "content_hash", "canonical_id", "group_size")


def cross_corpus_duplicates(corpus: DataFrame, reference: DataFrame,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Docs in ``corpus`` whose EXACT content (md5 of text) also
    appears in ``reference`` — the drop-eval-set/earlier-crawl
    duplicates step that runs beside n-gram decontamination
    (decontaminate.py handles partial overlap; this is the exact-hash
    containment check). One hash projection per side + a semi-join on
    the 16-byte digest: the reference side is typically tiny
    (benchmark suites) and broadcasts; when both sides are large the
    join shuffles digests only — document text never moves. Returns
    (doc_id, content_hash)."""
    ref = (reference.select(F.md5(F.col(text_col)).alias("content_hash"))
           .distinct())
    h = corpus.select(F.col(id_col).alias("doc_id"),
                      F.md5(F.col(text_col)).alias("content_hash"))
    return h.join(ref, "content_hash", "left_semi")


def shingle_arrays(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 3) -> DataFrame:
    """(doc_id, sh ARRAY<STRING>): the DISTINCT k-token shingles of
    each doc as ONE per-row array — ``array_distinct`` does the per-doc
    dedup in place, so building the Jaccard universe needs NO shuffle
    (the old exploded ``distinct()`` exchanged every shingle string
    corpus-wide; dedup keys were always per-doc, guide §2.4)."""
    # two-step projection: `toks` becomes a named column so the regex
    # split runs ONCE per row — inlining it leaves 4+ copies in the
    # shingle expression (CollapseProject keeps multiply-referenced
    # non-trivial aliases separate; measured 1.7x on this stage).
    # Each shingle is built from k O(1) element_at lookups + concat_ws
    # rather than slice + array_join (no per-shingle array allocation;
    # measured 1.8x, identical strings — tokens are never null so
    # concat_ws == array_join)
    toks = fan_out(df).select(F.col(id_col).alias("doc_id"),
                              tokens_col(text_col).alias("toks"))
    arr = F.when(
        F.size("toks") >= k,
        F.transform(F.sequence(F.lit(0), F.size("toks") - k),
                    lambda i: F.concat_ws(" ", *[
                        F.element_at("toks", i + F.lit(j) + 1)
                        for j in range(k)]))
    ).otherwise(F.array(F.array_join("toks", " ")))
    return toks.select("doc_id", F.array_distinct(arr).alias("sh"))


def shingles_df(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                k: int = 3) -> DataFrame:
    """Distinct k-token shingles per doc (the Jaccard universe),
    exploded view of :func:`shingle_arrays` — shuffle-free."""
    return shingle_arrays(df, id_col, text_col, k).select(
        "doc_id", F.explode("sh").alias("shingle"))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_hashes: int = 8,
                       k: int = 3, sh: DataFrame | None = None) -> DataFrame:
    """(doc_id, h0..h{n-1}) — hi = min over shingles of
    md5(i || '|' || shingle) (lexicographic min of hex strings).
    ``sh`` reuses an already-built frame: either the (doc_id, sh)
    array form or an exploded (doc_id, shingle) frame.

    The array form runs an Arrow ``mapInPandas`` kernel: per doc, each
    shingle is UTF-8 encoded once and hashlib md5 (C speed, one digest
    object per call — no per-call MessageDigest lookup) produces the n
    salted digests with running mins. Identical bytes to the Catalyst
    ``min(md5(concat('i|', shingle)))`` aggregate (both are lowercase
    hex over UTF-8; parity asserted in tests) at ~3x less task time —
    AND the plan loses its only exchange: signatures come out of the
    map, so nothing shuffles at all. Docs whose shingle array is empty
    produce no row, matching the explode+groupBy semantics. The
    exploded legacy form keeps the codegen'd min-aggregate path (the
    exchange there carries 8 hex strings per doc)."""
    if sh is None:
        sh = shingle_arrays(df, id_col, text_col, k)
    if "sh" not in sh.columns:
        aggs = [F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))))
                .alias(f"h{i}") for i in range(n_hashes)]
        return sh.groupBy("doc_id").agg(*aggs)

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    prefixes = [f"{i}|".encode() for i in range(n_hashes)]

    def sig_kernel(batches):
        from hashlib import md5
        for pdf in batches:
            ids = []
            cols: list[list] = [[] for _ in range(n_hashes)]
            for did, arr in zip(pdf["doc_id"].values, pdf["sh"].values):
                if arr is None or len(arr) == 0:
                    continue
                enc = [s.encode() for s in arr]
                ids.append(did)
                for i, p in enumerate(prefixes):
                    cols[i].append(min(md5(p + b).hexdigest() for b in enc))
            yield pd.DataFrame(
                {"doc_id": ids,
                 **{f"h{i}": cols[i] for i in range(n_hashes)}})

    out_schema = StructType(
        [sh.schema["doc_id"]]
        + [StructField(f"h{i}", StringType()) for i in range(n_hashes)])
    return sh.select("doc_id", "sh").mapInPandas(sig_kernel, out_schema)


def lsh_bands(sig: DataFrame, n_hashes: int = 8, bands: int = 4) -> DataFrame:
    """(doc_id, band, key): band key = concat of the band's hashes.
    Docs sharing any (band, key) are candidate near-dups."""
    rows = n_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        parts.append(sig.select(
            "doc_id", F.lit(b).alias("band"),
            F.concat_ws("|", *cols).alias("key")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n_hashes: int = 8,
                            bands: int = 4, k: int = 3,
                            sh: DataFrame | None = None,
                            sig: DataFrame | None = None) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing an LSH band bucket.
    ``sig`` reuses precomputed signatures — the band union references
    the signature frame once per band and the self-join doubles that,
    so an un-materialized signature dataflow would re-execute 2x bands
    times (callers should localCheckpoint it)."""
    if sig is None:
        sig = minhash_signatures(df, id_col, text_col, n_hashes, k, sh=sh)
    bandsdf = lsh_bands(sig, n_hashes, bands)
    a = bandsdf.alias("a")
    b = bandsdf.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct())
    return pairs


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3,
                  sh: DataFrame | None = None) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs: (id_a, id_b, jaccard).

    The CORPUS ROWS are pruned to docs that actually appear in a
    candidate pair (left-semi on the pair id set) BEFORE any
    tokenization — only near-dup docs are ever shingled here, not the
    whole corpus (the old path collect_set-aggregated every doc, and
    an intermediate version tokenized everything and pruned after).
    ``sh`` accepts a legacy exploded (doc_id, shingle) frame; the
    (doc_id, sh) array form is ignored in favor of the cheaper pruned
    re-derivation from ``df``."""
    # one pass over the pair dataflow for both id columns (a two-branch
    # union would execute everything above the pair frame's last
    # exchange once per branch when `pairs` is not materialized — e.g.
    # the ngram path's blocking join)
    ids = (pairs.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
           .distinct())
    if sh is not None and "sh" not in sh.columns:
        sh = (sh.join(ids, "doc_id", "left_semi")
              .groupBy("doc_id").agg(F.collect_set("shingle").alias("sh")))
    else:
        pruned = df.join(ids.withColumnRenamed("doc_id", id_col),
                         id_col, "left_semi")
        sh = shingle_arrays(pruned, id_col, text_col, k)
    # the pruned frame (candidate docs only — near-dup-sized, tiny
    # relative to the corpus) feeds BOTH attach joins; checkpoint it so
    # the prune + tokenize runs once, not per join side
    sh = sh.localCheckpoint(eager=False)
    # both attach joins broadcast the shingle side, so the verify
    # inherits the PAIRS frame's partitioning — and a distinct over
    # 16-byte id pairs AQE-coalesces to one partition long before the
    # per-pair array_intersect/array_union cost (the operator's
    # heaviest per-row compute) stops fitting one core. Spread the
    # pairs first; at scale the pair set is already wide and fan_out
    # adds no shuffle (event-log evidence: a 47,750-pair verify ran as
    # ONE 7.5 s task).
    pairs = fan_out(pairs)
    j = (pairs
         .join(sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select("id_a", "id_b",
                    (inter.cast("double") / union).alias("jaccard"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        k: int = 3, max_df: int = 50) -> DataFrame:
    """Standalone n-gram Jaccard near-dup pairs (no minhash): candidate
    pairs share at least one RARE shingle (document frequency <=
    ``max_df``), then exact shingle-Jaccard filters at ``threshold``.

    Rare-shingle blocking is the classic exact-dedup compromise: the
    self-join fan-out per shingle is bounded by max_df (so the
    candidate count is <= sum over rare shingles of C(df,2) — linear in
    corpus size for fixed max_df), while near-identical docs virtually
    always share a rare shingle. Unlike MinHash-LSH this needs no
    signature tuning and finds pairs deterministically, at the cost of
    missing pairs whose every common shingle is corpus-common (those
    are weak matches at realistic thresholds anyway). All built-in
    DataFrame ops: shingle explode -> df-filter -> equi-join ->
    array_intersect verify."""
    sh = shingles_df(df, id_col, text_col, k)
    rare = (sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .filter((F.col("sdf") >= 2) & (F.col("sdf") <= max_df))
            .select("shingle"))
    blocked = sh.join(rare, "shingle")
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"))
             .distinct()
             # consumed by the verify's id derivation AND its attach
             # join — materialize so the blocking join runs once
             .localCheckpoint(eager=False))
    return (jaccard_pairs(df, pairs, id_col, text_col, k)
            .filter(F.col("jaccard") >= threshold))


def near_duplicates_minhash(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", threshold: float = 0.7,
                            n_hashes: int = 8, bands: int = 4,
                            k: int = 3) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs with verified Jaccard.
    The per-doc shingle ARRAY frame is built ONCE (no shuffle — see
    :func:`shingle_arrays`) and lazily checkpointed; signature
    derivation is per-row array math on it and Jaccard verification
    reuses it pruned to candidate docs, so the only exchanges left in
    the whole operator are the band-bucket join and the pair joins."""
    # the shingle-array frame is deliberately NOT checkpointed: it is
    # corpus-sized and consumed exactly twice (signature aggregate,
    # pruned Jaccard verify) — recomputing the narrow tokenize map
    # twice is cheaper than pinning ~corpus bytes in storage memory
    sh = shingle_arrays(df, id_col, text_col, k)
    # the signature frame (8 hex strings per doc, tiny) is consumed 2x
    # bands times through the band union + self-join; the pair frame is
    # consumed three times by the verify joins — materialize both so
    # the md5/tokenize dataflow executes exactly ONCE
    sig = (minhash_signatures(df, id_col, text_col, n_hashes, k, sh=sh)
           .localCheckpoint(eager=False))
    pairs = (minhash_candidate_pairs(df, id_col, text_col, n_hashes, bands,
                                     k, sh=sh, sig=sig)
             .localCheckpoint(eager=False))
    # jaccard re-derives shingles for CANDIDATE docs only (pruned
    # before tokenization) — cheaper than sharing the corpus-wide frame
    return (jaccard_pairs(df, pairs, id_col, text_col, k)
            .filter(F.col("jaccard") >= threshold))


class ClusteringNotConverged(RuntimeError):
    """duplicate_clusters hit ``max_rounds`` with labels still moving —
    the component diameter exceeds the cap, so returned cluster_ids
    would be WRONG (split components). Raise rather than silently
    returning them; callers with pathological long-chain graphs raise
    the cap (rounds needed = diameter, each round is one join)."""


def _components_numpy(src: "np.ndarray", dst: "np.ndarray"):
    """Vectorized connected components over dense-indexed edges:
    alternating min-scatter passes (np.minimum.at both directions) with
    pointer halving to a fixpoint — O(E) per pass, O(log diameter)
    passes. Returns (unique_ids, min_reachable_id per unique id)."""
    import numpy as np
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    lbl = np.arange(ids.size, dtype=np.int64)
    while True:
        old = lbl
        lbl = lbl.copy()
        np.minimum.at(lbl, d, lbl[s])
        np.minimum.at(lbl, s, lbl[d])
        while True:  # halve chains: lbl := lbl[lbl] to fixpoint
            nxt = lbl[lbl]
            if np.array_equal(nxt, lbl):
                break
            lbl = nxt
        if np.array_equal(lbl, old):
            break
    # ids is sorted, so min dense index == min id
    return ids, ids[lbl]


def duplicate_clusters(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       max_rounds: int = 100,
                       driver_max_edges: int = 5_000_000) -> DataFrame:
    """Canonical assignment over a near-dup pair graph: every doc gets
    ``cluster_id`` = the minimum doc_id reachable through pairs
    (connected components); singletons label themselves. Keep one doc
    per cluster_id to dedup.

    Two regimes, chosen by the MATERIALIZED edge count — the near-dup
    graph is tiny relative to the corpus by construction (it holds only
    actual near-duplicates), so corpus scale does not decide the path:

    - ``|edges| <= driver_max_edges`` (default 5M ~ 80 MB): ONE bounded
      collect of (src, dst) and vectorized numpy components (min-
      scatter + pointer halving, O(E log d)); the corpus itself never
      leaves the cluster — only the dup subgraph does, and the label
      map broadcasts back into a single join. The same driver-sidecar
      call the IVF leader ranking makes.
    - bigger: distributed min-label propagation with pointer halving —
      per round one join + groupBy (label(v) := min over neighbors)
      plus one hop join (lbl := lbl(lbl)), stopping when a round
      changes nothing; halving bounds rounds by O(log diameter), so
      boilerplate corpora that chain near-dups into long paths stay
      cheap. Non-convergence within ``max_rounds`` still raises
      :class:`ClusteringNotConverged` rather than silently returning
      split components. Each round's labels are localCheckpointed:
      iterative lineage would otherwise grow a plan of depth
      O(rounds)."""
    import numpy as np
    import pandas as pd

    nodes = df.select(F.col(id_col).alias("id")).distinct()
    # both edge directions from ONE pass over the pair dataflow: the
    # old src/dst union referenced `pairs` twice, and everything above
    # the pair frame's last exchange (LSH banding + the verify kernel —
    # the expensive part of the whole operator) executed once per
    # branch when the checkpoint below materialized
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst")),
                F.struct(F.col("id_b").alias("src"),
                         F.col("id_a").alias("dst")))).alias("e"))
             .select("e.src", "e.dst")
             .distinct())
    # materialize ONCE: without this every propagation round (join +
    # convergence count) re-executes the full candidate+verify
    # dataflow from scratch
    edges = edges.localCheckpoint(eager=True)

    n_edges = edges.count()
    if n_edges == 0:
        return nodes.select(F.col("id").alias("doc_id"),
                            F.col("id").alias("cluster_id"))
    if n_edges <= driver_max_edges:
        epdf = edges.toPandas()
        ids, cluster = _components_numpy(
            epdf["src"].to_numpy(np.int64), epdf["dst"].to_numpy(np.int64))
        spark = df.sparkSession
        lmap = spark.createDataFrame(
            pd.DataFrame({"id": ids, "lbl": cluster}),
            "id BIGINT, lbl BIGINT")
        return (nodes.join(F.broadcast(lmap), "id", "left")
                .select(F.col("id").alias("doc_id"),
                        F.coalesce("lbl", "id").alias("cluster_id")))

    labels = nodes.select("id", F.col("id").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neigh = (edges.join(labels.withColumnRenamed("id", "src"), "src")
                 .groupBy("dst").agg(F.min("lbl").alias("nlbl"))
                 .withColumnRenamed("dst", "id"))
        new_labels = (labels.join(neigh, "id", "left")
                      .select("id", F.least("lbl", F.coalesce("nlbl", "lbl"))
                              .alias("lbl")))
        # pointer halving: every lbl is itself a node id, so follow it
        # one hop (lbl := lbl(lbl)) — labels stay a monotone min over
        # reachable ids (same fixpoint) but long chains collapse in
        # O(log diameter) rounds instead of O(diameter)
        hop = new_labels.select(F.col("id").alias("lbl"),
                                F.col("lbl").alias("hop_lbl"))
        new_labels = (new_labels.join(hop, "lbl", "left")
                      .select("id", F.coalesce("hop_lbl", "lbl")
                              .alias("lbl")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.lbl") != F.col("o.lbl")).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        raise ClusteringNotConverged(
            f"label propagation still moving after {max_rounds} rounds "
            f"(component diameter > {max_rounds}); raise max_rounds")
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))


def near_duplicates_simhash(df: DataFrame, max_hamming: int = 3,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """SimHash near-dup pairs over the 64-bit signature: candidates
    share at least one of four 16-bit signature bands (pigeonhole:
    hamming <= 3 over 64 bits forces an identical band), verified by
    exact ``bit_count(xor)`` over both halves. The band equi-join is
    the 100 TB path — no cross product, and 2^16 keys per band keep
    bucket populations ~N/65536 (an 8-bit band's 256 keys would go
    quadratic within buckets at billions of docs). Returns
    (id_a, id_b, hamming), id_a < id_b."""
    if max_hamming >= 4:
        raise ValueError("4 bands of 16 bits guarantee recall only for "
                         "max_hamming <= 3")
    # the signature frame (two longs per doc) feeds all four band
    # projections AND both sides of the self-join — materialize it so
    # the tokenize + signature aggregation runs ONCE, not per branch
    sig = simhash64(df, id_col, text_col).localCheckpoint(eager=False)
    bands = []
    for b in range(4):
        half = "simhash_lo" if b < 2 else "simhash_hi"
        shift = 16 * (b % 2)
        bands.append(sig.select(
            "doc_id", "simhash_lo", "simhash_hi", F.lit(b).alias("band"),
            F.expr(f"({half} >> {shift}) & 65535").alias("key")))
    bdf = bands[0]
    for p in bands[1:]:
        bdf = bdf.unionByName(p)
    # the self-join's shuffle carries ~30-byte rows, so AQE's byte-
    # target coalescing collapses it to a handful of partitions while
    # the per-partition JOIN work (bucket fan-out + bit_count verify)
    # stays compute-heavy — event log: a 200k-row band join ran as 3
    # tasks for 4.3 s. Pin an explicit partition count (derived from
    # the session, not a constant); both join sides share the one
    # exchange (ReusedExchange) exactly as before.
    n_parts = bdf.sparkSession.sparkContext.defaultParallelism
    bdf = bdf.repartition(n_parts, "band", "key")
    a = bdf.select(F.col("doc_id").alias("id_a"),
                   F.col("simhash_lo").alias("lo_a"),
                   F.col("simhash_hi").alias("hi_a"), "band", "key")
    b2 = bdf.select(F.col("doc_id").alias("id_b"),
                    F.col("simhash_lo").alias("lo_b"),
                    F.col("simhash_hi").alias("hi_b"), "band", "key")
    ham = F.expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)")
    # hamming is a pure function of the pair, so filter BEFORE the
    # distinct: the dedup exchange then carries only true near-dups
    # (3 narrow columns), not every random band collision with both
    # full signatures — same rows out, far fewer/narrower rows shuffled
    return (a.join(b2, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def _simhash_sums(halves: list[str]) -> list:
    """One SUM aggregate per (half, bit): Σ over token OCCURRENCES of
    (+1 if the bit is set in the term's md5 half else -1). Equal to the
    definitional Σ over distinct terms of tf·(±1) — summing a term's
    ±1 tf times is the same integer — so no (doc, term) tf pre-
    aggregation and no 32x bit-explode row blowup are needed: the
    whole signature reduces in ONE map-side-combinable groupBy."""
    aggs = []
    for half in halves:
        for b in range(32):
            bit_set = F.expr(f"shiftright(h_{half}, {b}) % 2") == 1
            aggs.append(F.sum(F.when(bit_set, 1).otherwise(-1))
                        .alias(f"s_{half}_{b}"))
    return aggs


def _simhash_value(half: str):
    """Signed-int64 signature from the 32 per-bit sums of ``half``."""
    out = F.lit(0).cast("bigint")
    for b in range(32):
        out = out + F.when(F.col(f"s_{half}_{b}") >= 0,
                           F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
    return out


def _simhash_kernel_frame(df: DataFrame, id_col: str, text_col: str,
                          out_cols: list[str]) -> DataFrame:
    """Arrow ``mapInPandas`` SimHash: per task a dict caches each
    term's ±1 bit vector (64 int64 lanes from md5 hex chars 1-8 = low
    half, 9-16 = high half), so md5 runs once per DISTINCT term per
    task instead of once per occurrence (Zipf corpora repeat terms
    heavily — the Catalyst path re-hashed every occurrence); per doc
    the vectors accumulate tf-weighted in exact integer arithmetic.
    Bit j of a half is set iff its sum >= 0 — identical to the
    ``_simhash_sums``/``_simhash_value`` aggregate (parity pinned in
    tests). Signatures come out of the map: the token explode, the
    64-sum aggregate and its exchange all disappear. Docs whose token
    array is empty produce no row, matching explode semantics.
    ``out_cols``: ["simhash_lo", "simhash_hi"] or ["simhash"] (low
    half only)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    toks = fan_out(df).select(F.col(id_col).alias("doc_id"),
                              tokens_col(text_col).alias("toks"))
    n_out = len(out_cols)
    weights = 1 << np.arange(32, dtype=np.int64)

    def kernel(batches):
        from collections import Counter
        from hashlib import md5
        vecs: dict[str, "np.ndarray"] = {}

        def vec(term: str) -> "np.ndarray":
            v = vecs.get(term)
            if v is None:
                if len(vecs) > (1 << 20):   # bound per-task cache
                    vecs.clear()
                hx = md5(term.encode()).hexdigest()
                h_lo, h_hi = int(hx[0:8], 16), int(hx[8:16], 16)
                bits = np.concatenate([
                    (h_lo >> np.arange(32, dtype=np.int64)) & 1,
                    (h_hi >> np.arange(32, dtype=np.int64)) & 1])
                v = (2 * bits - 1).astype(np.int64)
                vecs[term] = v
            return v

        for pdf in batches:
            ids, los, his = [], [], []
            for did, arr in zip(pdf["doc_id"].values, pdf["toks"].values):
                if arr is None or len(arr) == 0:
                    continue
                acc = np.zeros(64, dtype=np.int64)
                for term, cnt in Counter(arr).items():
                    acc += vec(term) * cnt
                ids.append(did)
                los.append(int(((acc[:32] >= 0) * weights).sum()))
                his.append(int(((acc[32:] >= 0) * weights).sum()))
            out = {"doc_id": ids, out_cols[0]: los}
            if n_out == 2:
                out[out_cols[1]] = his
            yield pd.DataFrame(out)

    schema = StructType([toks.schema["doc_id"]]
                        + [StructField(c, LongType()) for c in out_cols])
    return toks.mapInPandas(kernel, schema)


def _simhash64_agg(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Definitional Catalyst aggregate form of :func:`simhash64` —
    token explode -> md5 halves -> ONE hash aggregate on doc_id
    carrying 64 integer sums. Kept as the parity reference for the
    Arrow kernel (and for ANSI-SQL engines: the identical computation
    runs on DuckDB for the oracle)."""
    toks = fan_out(df).select(F.col(id_col).alias("doc_id"),
                              F.explode(tokens_col(text_col)).alias("term"))
    h = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint").alias("h_lo"),
        F.conv(F.substring(F.md5("term"), 9, 8), 16, 10).cast("bigint").alias("h_hi"))
    sums = h.groupBy("doc_id").agg(*_simhash_sums(["lo", "hi"]))
    return sums.select("doc_id",
                       _simhash_value("lo").alias("simhash_lo"),
                       _simhash_value("hi").alias("simhash_hi"))


def simhash64(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc as two 32-bit halves (doc_id, simhash_hi,
    simhash_lo): half-h bit j set iff sum over distinct terms of
    tf * (+1 if bit j of the half's 32 md5 bits else -1) >= 0, with the
    low half from md5 hex chars 1-8 and the high half from chars 9-16.

    Two int64-safe halves (not one 64-bit value) keep every shift/xor
    inside signed-int64 arithmetic, so the identical computation runs
    on any ANSI SQL engine (oracle parity) — while the full 64 bits
    support 4x16-bit LSH bands at web scale.

    Computed by the Arrow kernel (:func:`_simhash_kernel_frame`) —
    byte-identical to the :func:`_simhash64_agg` aggregate, with no
    explode and no exchange."""
    return _simhash_kernel_frame(df, id_col, text_col,
                                 ["simhash_lo", "simhash_hi"])


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc: bit j set iff
    sum over distinct terms of tf * (+1 if bit j of
    int(md5(term)[:8], 16) else -1) >= 0 (the low half of
    :func:`simhash64`; kept for compact signature use cases). Same
    Arrow-kernel derivation as :func:`simhash64`."""
    return _simhash_kernel_frame(df, id_col, text_col, ["simhash"])


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n\n",
                     min_copies: int = 2, min_len: int = 1) -> DataFrame:
    """CCNet/RefinedWeb-style repeated-span removal: split each doc on
    ``sep``, drop every paragraph whose exact text occurs in
    ``min_copies``+ places across the corpus EXCEPT its first
    occurrence (first = smallest (doc_id, position)), and reassemble
    the surviving paragraphs in order. The standard boilerplate killer
    (headers, nav bars, license blocks) ahead of doc-level dedup.

    Paragraphs shorter than ``min_len`` chars are exempt (never
    removed, never counted) — CCNet's short-span guard; it also makes
    the operator idempotent (a removed-doc's leftover empty string
    can never collide on a second pass).

    Returns (doc_id, text, n_paragraphs, n_removed).

    100 TB shape — paragraph TEXT never shuffles:
    1. only (md5, doc_id, idx) triples take the one hash-keyed
       shuffle (groupBy md5 with map-side combine; the winner is
       min(struct(doc_id, idx)), no window/sort),
    2. the removal list folds back as a per-doc int array
       ((doc_id, rm_idx)), small relative to the corpus — AQE
       broadcasts it into the final join,
    3. reassembly is a per-row JVM expression: split -> indexed
       lambda filter -> array_join. Documents stay columnar in their
       original partitions end to end."""
    import re as _re
    pat = _re.escape(sep)
    docs = df.select(F.col(id_col).alias("doc_id"),
                     F.coalesce(F.col(text_col), F.lit("")).alias("text"))
    parts = F.split(F.col("text"), pat)
    p_keys = docs.select(
        "doc_id", F.posexplode(parts).alias("idx", "para")
    ).filter(F.length("para") >= int(min_len)
             ).select("doc_id", "idx", F.md5("para").alias("phash"))
    winners = (p_keys.groupBy("phash")
               .agg(F.count("*").alias("copies"),
                    F.min(F.struct("doc_id", "idx")).alias("first_occ"))
               .filter(F.col("copies") >= int(min_copies)))
    removed = (p_keys.join(winners, "phash")
               .filter((F.col("doc_id") != F.col("first_occ.doc_id"))
                       | (F.col("idx") != F.col("first_occ.idx")))
               .groupBy("doc_id")
               .agg(F.collect_list("idx").alias("rm_idx")))
    joined = docs.join(removed, "doc_id", "left")
    # kept indices via array_except (hash-set membership, O(n + r) per
    # doc) instead of an array_contains scan per paragraph (O(n * r) —
    # quadratic on boilerplate-heavy docs at word granularity);
    # array_except preserves first-array order, so ascending indices
    # reassemble the survivors in document order
    keep_idx = F.array_except(
        F.sequence(F.lit(0), F.size(parts) - 1), F.col("rm_idx"))
    kept = F.when(F.col("rm_idx").isNull(), parts).otherwise(
        F.transform(keep_idx, lambda i: F.element_at(parts, i + 1)))
    return joined.select(
        "doc_id",
        F.array_join(kept, sep).alias("text"),
        F.size(parts).cast("bigint").alias("n_paragraphs"),
        F.coalesce(F.size("rm_idx"), F.lit(0)).cast("bigint")
         .alias("n_removed"))
