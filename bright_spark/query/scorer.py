"""BM25 scoring + block-max top-k kernel (SURVEY.md Q15, §4).

The reference's scoring runs inside Bleve's TopNCollector over a
searcher tree (`handlers/search.go:140`). Ours is an Arrow-batch
kernel executed per doc-range chunk via ``applyInPandas``:

- BM25 (k1=1.2, b=0.75 defaults; BASELINE.json pins BM25 over Bleve
  2.4's tf-idf default):
      idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
      tfn(tf, dl) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
      score(d)    = sum_t boost_t * idf_t * tfn(tf_td, dl_d)
- Block-max pruning: every posting block stores (max_tf, min_dl);
  ``tfn`` is increasing in tf and decreasing in dl, so
  ``boost*idf*tfn(max_tf, min_dl)`` evaluated with *current* corpus
  stats upper-bounds every entry in the block. The kernel:
    1. builds a block-interval upper-bound envelope over docID space
       (vectorized event sweep — no per-doc loop),
    2. exactly scores a seed set (the blocks of the highest-impact
       term) to establish the top-k threshold θ,
    3. decodes + scores only blocks overlapping envelope intervals
       with UB > θ.
  This is block-max WAND semantics (exact top-k, block-granular
  skips) restructured from a per-document cursor walk into three
  numpy passes, because per-document Python loops are the one thing
  an Arrow-batch UDF must never do (input_hint: "no per-row Python").
- Conjunctions intersect rarest-term-first (SURVEY.md §4: Bleve's
  boolean searcher orders by cost); exclusions are vectorized
  ``isin`` filters.

Exactness of the pruned path vs the exhaustive path is a pytest
property (WAND result == no-pruning result, SURVEY.md §7 step 3 exit).
"""

from __future__ import annotations

import math

import numpy as np

from bright_spark.index import codec


def idf(n_docs: int, df: np.ndarray | float):
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(tf, dl, avgdl: float, k1: float, b: float):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9)))


class TermPostings:
    """Decoded-on-demand posting row(s) of one term within one range."""

    def __init__(self, weight: float, rows: list[dict]):
        self.weight = weight  # boost * idf
        # concatenate parallel block arrays over the term's rows
        self.first_doc = np.concatenate([np.asarray(r["first_doc"], dtype=np.int64) for r in rows])
        self.max_doc = np.concatenate([np.asarray(r["max_doc"], dtype=np.int64) for r in rows])
        self.max_tf = np.concatenate([np.asarray(r["max_tf"], dtype=np.int64) for r in rows])
        self.min_dl = np.concatenate([np.asarray(r["min_dl"], dtype=np.int64) for r in rows])
        self.docs_bin = [d for r in rows for d in r["docs"]]
        self.tfs_bin = [d for r in rows for d in r["tfs"]]
        self.dls_bin = [d for r in rows for d in r["dls"]]
        self.df = int(sum(int(r["df_chunk"]) for r in rows))
        self._doc_cache: dict[int, np.ndarray] = {}
        self._full_cache = None

    def n_blocks(self) -> int:
        return len(self.docs_bin)

    def block_bounds(self, avgdl: float, k1: float, b: float) -> np.ndarray:
        """Per-block score upper bound (sound under current stats)."""
        return self.weight * tf_norm(self.max_tf, self.min_dl, avgdl, k1, b)

    def decode_doc_ids(self, block_idx: int) -> np.ndarray:
        got = self._doc_cache.get(block_idx)
        if got is None:
            d = codec.varint_decode(self.docs_bin[block_idx]).astype(np.int64)
            np.cumsum(d, out=d)
            d += self.first_doc[block_idx]
            self._doc_cache[block_idx] = got = d
        return got

    def decode_blocks(self, block_idxs: np.ndarray):
        """(doc_ids, tfs, dls) concatenated over the given blocks."""
        ds, ts, ls = [], [], []
        for i in block_idxs:
            i = int(i)
            ds.append(self.decode_doc_ids(i))
            ts.append(codec.varint_decode(self.tfs_bin[i]).astype(np.int64))
            ls.append(codec.varint_decode(self.dls_bin[i]).astype(np.int64))
        if not ds:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        return np.concatenate(ds), np.concatenate(ts), np.concatenate(ls)

    def decode_all(self):
        if self._full_cache is None:
            self._full_cache = self.decode_blocks(np.arange(self.n_blocks()))
        return self._full_cache

    def all_doc_ids(self) -> np.ndarray:
        return np.concatenate(
            [self.decode_doc_ids(i) for i in range(self.n_blocks())]
        ) if self.n_blocks() else np.empty(0, dtype=np.int64)


def _accumulate(pairs: list[tuple[np.ndarray, np.ndarray]]):
    """Sum (doc_ids, scores) contributions -> unique doc_ids, totals.

    Deterministic: contributions are added per unique doc via np.add.at
    in the caller-provided (sorted-term) order.
    """
    if not pairs:
        z = np.empty(0, dtype=np.int64)
        return z, np.empty(0, dtype=np.float64)
    all_docs = np.concatenate([p[0] for p in pairs])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    totals = np.zeros(uniq.size, dtype=np.float64)
    off = 0
    for d, s in pairs:
        np.add.at(totals, inv[off : off + d.size], s)
        off += d.size
    return uniq, totals


def _group_doc_ids(terms: dict[str, TermPostings], group: list[str],
                   span: tuple[int, int] | None = None) -> np.ndarray:
    """Sorted unique docIDs matching ANY term of the group, optionally
    restricted (block-granular skip) to a candidate docID span."""
    parts = []
    for t in group:
        tp = terms.get(t)
        if tp is None:
            continue
        if span is None:
            parts.append(tp.all_doc_ids())
        else:
            lo, hi = span
            bsel = np.flatnonzero((tp.max_doc >= lo) & (tp.first_doc <= hi))
            if bsel.size:
                parts.append(np.concatenate(
                    [tp.decode_doc_ids(int(i)) for i in bsel]))
    if not parts:
        return np.empty(0, dtype=np.int64)
    if len(parts) == 1:
        return parts[0]
    return np.unique(np.concatenate(parts))


def score_range_topk(
    terms: dict[str, TermPostings],
    must_groups: list[list[str]],
    should: list[str],
    must_not: list[str],
    k: int,
    avgdl: float,
    k1: float,
    b: float,
    prune: bool = True,
):
    """Exact top-k for one doc-range chunk.

    Returns (doc_ids desc-by-(score, doc_id asc), scores, n_matched).
    ``terms`` maps term -> TermPostings (only terms present in this
    range appear). A must group is satisfied by any of its terms
    (wildcard/fuzzy expansions); must_not terms exclude; scoring terms
    are all must-group members + should terms.
    """
    must_groups = [sorted(set(g)) for g in must_groups]
    scoring = sorted(
        {t for g in must_groups for t in g if t in terms}
        | {t for t in should if t in terms}
    )

    excl: np.ndarray | None = None
    if must_not:
        parts = [terms[t].all_doc_ids() for t in sorted(set(must_not)) if t in terms]
        if parts:
            excl = np.unique(np.concatenate(parts))

    if not scoring:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), 0)

    # ---------------- conjunctive path: rarest-first intersection (Q6)
    if must_groups:
        # order groups by total df ascending (Bleve orders searchers by
        # cost); an empty/absent group means no hits in this range
        def group_df(g):
            return sum(terms[t].df for t in g if t in terms)
        ordered = sorted(must_groups, key=lambda g: (group_df(g), g))
        cand = _group_doc_ids(terms, ordered[0])
        for g in ordered[1:]:
            if cand.size == 0:
                break
            ids = _group_doc_ids(terms, g, span=(int(cand[0]), int(cand[-1])))
            cand = cand[np.isin(cand, ids, assume_unique=True)]
        if excl is not None and cand.size:
            cand = cand[~np.isin(cand, excl, assume_unique=True)]
        if cand.size == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), 0)
        # exact scores for candidates over all scoring terms
        totals = np.zeros(cand.size, dtype=np.float64)
        for t in scoring:
            tp = terms[t]
            d, tf, dl = tp.decode_all()
            pos = np.searchsorted(d, cand)
            pos_c = np.clip(pos, 0, d.size - 1)
            hit = d[pos_c] == cand
            sc = tp.weight * tf_norm(tf[pos_c], dl[pos_c], avgdl, k1, b)
            totals += np.where(hit, sc, 0.0)
        n_matched = int(cand.size)
        order = np.lexsort((cand, -totals))[:k]
        return cand[order], totals[order], n_matched

    # ---------------- disjunctive path: block-max pruned union (Q7/Q15)
    tps = [terms[t] for t in scoring]

    # exact match count (docID union) — Bleve reports exact totalHits
    union_parts = [tp.all_doc_ids() for tp in tps]
    union = np.unique(np.concatenate(union_parts))
    if excl is not None:
        union = union[~np.isin(union, excl, assume_unique=True)]
    n_matched = int(union.size)
    if n_matched == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), 0)

    if not prune or n_matched <= 4 * max(k, 1) or len(tps) == 1:
        pairs = []
        for tp in tps:
            d, tf, dl = tp.decode_all()
            pairs.append((d, tp.weight * tf_norm(tf, dl, avgdl, k1, b)))
        docs, totals = _accumulate(pairs)
        if excl is not None:
            keep = ~np.isin(docs, excl, assume_unique=True)
            docs, totals = docs[keep], totals[keep]
        order = np.lexsort((docs, -totals))[:k]
        return docs[order], totals[order], n_matched

    # --- pass 1: upper-bound envelope over docID space (event sweep)
    starts = np.concatenate([tp.first_doc for tp in tps])
    ends = np.concatenate([tp.max_doc for tp in tps])
    ubs = np.concatenate([tp.block_bounds(avgdl, k1, b) for tp in tps])
    events = np.concatenate([starts, ends + 1])
    deltas = np.concatenate([ubs, -ubs])
    order_e = np.argsort(events, kind="stable")
    events, deltas = events[order_e], deltas[order_e]
    bounds_at = np.cumsum(deltas)  # envelope value after each event
    # unique event positions (envelope is piecewise constant between)
    uniq_pos, last_idx = np.unique(events, return_index=True)
    # cumulative at the LAST occurrence of each position
    next_start = np.concatenate([last_idx[1:], [events.size]])
    env = bounds_at[next_start - 1]

    # --- pass 2: seed θ with exact scores of the highest-impact term's docs
    seed_tp = max(tps, key=lambda tp: float(tp.block_bounds(avgdl, k1, b).max()))
    seed_docs = seed_tp.all_doc_ids()
    if excl is not None:
        seed_docs = seed_docs[~np.isin(seed_docs, excl, assume_unique=True)]
    seed_scores = np.zeros(seed_docs.size, dtype=np.float64)
    for tp in tps:
        d, tf, dl = tp.decode_all()
        pos = np.searchsorted(d, seed_docs)
        pos_c = np.clip(pos, 0, max(d.size - 1, 0))
        hit = (d[pos_c] == seed_docs) if d.size else np.zeros(seed_docs.size, bool)
        sc = tp.weight * tf_norm(tf[pos_c], dl[pos_c], avgdl, k1, b) if d.size else 0.0
        seed_scores += np.where(hit, sc, 0.0)
    if seed_docs.size >= k:
        theta = float(np.partition(seed_scores, seed_docs.size - k)[seed_docs.size - k])
    else:
        theta = -math.inf

    # --- pass 3: decode + score only blocks overlapping UB>=θ intervals
    # (>= not >: with the (score desc, doc_id asc) tie-break, a doc
    # scoring exactly θ can still outrank a seed doc with equal score)
    hot = env >= theta
    if not hot.any():
        order = np.lexsort((seed_docs, -seed_scores))[:k]
        return seed_docs[order], seed_scores[order], n_matched
    # hot intervals: [uniq_pos[i], uniq_pos[i+1]) where hot[i]
    hot_starts = uniq_pos[hot]
    hot_idx = np.flatnonzero(hot)
    iv_end = np.concatenate([uniq_pos[1:], [np.iinfo(np.int64).max]])
    hot_ends = iv_end[hot_idx]  # exclusive
    pairs = []
    for tp in tps:
        # block overlaps a hot interval? vectorized interval join
        j = np.searchsorted(hot_starts, tp.max_doc, side="right") - 1
        j2 = np.searchsorted(hot_ends, tp.first_doc, side="right")
        overlap = (j >= j2) & (j >= 0)
        bsel = np.flatnonzero(overlap)
        if bsel.size == 0:
            continue
        d, tf, dl = tp.decode_blocks(bsel)
        pairs.append((d, tp.weight * tf_norm(tf, dl, avgdl, k1, b)))
    docs, totals = _accumulate(pairs)
    if excl is not None and docs.size:
        keep = ~np.isin(docs, excl, assume_unique=True)
        docs, totals = docs[keep], totals[keep]
    # pruned-block docs have partial sums that are <= their true score
    # ONLY for docs fully covered; docs outside hot intervals entirely
    # are bounded by θ, but a doc may appear both in a decoded and a
    # pruned block of different terms. Its decoded partial sum plus the
    # envelope bound of the pruned part stays <= env <= θ for pruned
    # intervals — so any doc whose true score exceeds θ has ALL its
    # entries inside hot intervals (its docID lies in one interval and
    # every block containing it overlaps that interval). Partial sums
    # are therefore exact for every doc that can beat θ.
    if seed_docs.size:
        extra = np.isin(seed_docs, docs, assume_unique=True, invert=True)
        docs = np.concatenate([docs, seed_docs[extra]])
        totals = np.concatenate([totals, seed_scores[extra]])
    order = np.lexsort((docs, -totals))[:k]
    return docs[order], totals[order], n_matched
