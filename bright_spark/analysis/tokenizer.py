"""Analysis chain (tokenization) — SURVEY.md §2.3 T1-T5.

The reference delegates analysis to Bleve's ``standard`` analyzer
(Unicode word segmentation -> lowercase -> stopwords), configured at
``store/store.go:126``. Per BASELINE.json north_star our engine replaces
it with a **code-aware tokenizer**:

T1  word segmentation: split on non-identifier chars (``[A-Za-z0-9_]+``
    runs are base tokens)
T2  identifier splitting: camelCase / snake_case sub-token expansion —
    ``getUserId`` -> ``get``, ``user``, ``id`` plus the whole lowercased
    identifier ``getuserid``; ``parse_config_file`` -> ``parse``,
    ``config``, ``file`` + ``parse_config_file``
T3  lowercase
T4  per-lang keyword/stopword filter (opt-in; off by default so Zipfian
    hot terms stay in the index and exercise the skew path) + max token
    length cap
T5  per-doc term stats (tf, doc_len) via :func:`count_terms`

Two modes:
- ``code``   — T1-T4 as above (the graft corpus tokenizer)
- ``simple`` — lowercase whitespace split (used for the pre-tokenized
  ``documents`` test table; exactly expressible in ANSI SQL for the
  DuckDB differential oracle)

This module is **pure Python/stdlib** so the exact same code runs in
the pytest oracle and inside Arrow-batched Spark workers. Positions are
base-token ordinals (sub-tokens of one identifier share its position),
which is what phrase adjacency (Q4) checks.
"""

from __future__ import annotations

import itertools
import re
from collections import Counter
from functools import lru_cache

import numpy as np
import pandas as pd

MAX_TOKEN_LEN = 64  # guard against pathological minified blobs

_BASE_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
# camelCase / ALLCAPS / digit-run segmentation within a base token:
#   "HTTPServer2" -> HTTP, Server, 2 ; "getUserId" -> get, User, Id
_SUBTOKEN_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")

# T4 per-language keyword filters (opt-in). Small, documented sets —
# the analog of Bleve's English stopword filter, retargeted at code.
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "python": frozenset({"def", "self", "return", "import", "from", "class", "if", "else", "for", "in", "not", "and", "or", "none", "true", "false", "pass", "with", "as"}),
    "go": frozenset({"func", "return", "package", "import", "if", "else", "for", "range", "var", "const", "type", "struct", "interface", "nil", "err"}),
    "java": frozenset({"public", "private", "static", "void", "class", "return", "new", "if", "else", "for", "import", "package", "final", "this", "null"}),
    "js": frozenset({"function", "return", "const", "let", "var", "if", "else", "for", "new", "this", "null", "undefined", "true", "false", "export", "import"}),
}


def _code_base_tokens(text: str) -> list[str]:
    return _BASE_TOKEN_RE.findall(text)


@lru_cache(maxsize=1 << 18)
def _expand_identifier(tok: str) -> list[str]:
    """T2+T3: sub-tokens (lowercased) plus the whole lowercased token.

    Single-part identifiers yield just the lowercased token (no dup).
    """
    parts = _SUBTOKEN_RE.findall(tok)
    low = tok.lower()
    if len(parts) <= 1:
        return [low]
    out = [p.lower() for p in parts]
    out.append(low)
    return out


def tokenize_with_positions(
    text: str,
    mode: str = "code",
    lang: str | None = None,
    filter_stopwords: bool = False,
) -> list[tuple[str, int]]:
    """Full chain; returns ``[(term, base_position), ...]``."""
    if text is None:
        return []
    out: list[tuple[str, int]] = []
    if mode == "simple":
        pos = 0
        for tok in text.split():
            t = tok.lower()
            if t and len(t) <= MAX_TOKEN_LEN:
                out.append((t, pos))
                pos += 1
        return out
    if mode != "code":
        raise ValueError(f"unknown tokenizer mode: {mode!r}")
    stop = LANG_STOPWORDS.get(lang or "", frozenset()) if filter_stopwords else frozenset()
    for pos, base in enumerate(_code_base_tokens(text)):
        if len(base) > MAX_TOKEN_LEN:
            base = base[:MAX_TOKEN_LEN]
        for term in _expand_identifier(base):
            if term and term not in stop and len(term) <= MAX_TOKEN_LEN:
                out.append((term, pos))
    return out


def tokenize(
    text: str,
    mode: str = "code",
    lang: str | None = None,
    filter_stopwords: bool = False,
) -> list[str]:
    """Terms only, in emission order."""
    return [t for t, _ in tokenize_with_positions(text, mode, lang, filter_stopwords)]


def count_terms(
    text: str,
    mode: str = "code",
    lang: str | None = None,
    filter_stopwords: bool = False,
) -> tuple[Counter, int]:
    """T5: per-doc term frequencies and doc_len (= emitted term count,
    the BM25 field-length norm input, matching Bleve's token-count norm)."""
    terms = tokenize(text, mode, lang, filter_stopwords)
    return Counter(terms), len(terms)


def count_terms_flat(
    texts: list[str],
    mode: str = "code",
    langs: list[str | None] | None = None,
    filter_stopwords: bool = False,
    positions: bool = False,
):
    """Core of :func:`count_terms_batch`, returning FLAT (doc, term)
    pair arrays instead of per-doc slices — the index-build hot path
    consumes this directly (builder._emit_partials_flat), skipping the
    per-doc slice -> re-concatenate -> re-factorize round trip the
    sliced API forces.

    Returns ``(pair_doc, pair_tid, term_dict, pair_tf, doc_len,
    flat_pos)``: one entry per (doc, unique term) pair, ordered (doc
    asc, term lexicographic asc); ``pair_tid`` indexes ``term_dict``
    (batch-local term dictionary, unsorted); ``doc_len`` is per-doc
    emitted-token count (len n); ``flat_pos`` is the per-pair position
    segments concatenated in pair order (segment i has ``pair_tf[i]``
    ascending values), or None when ``positions`` is False.
    """
    n = len(texts)
    empty_s = np.empty(0, dtype=object)
    empty_i = np.empty(0, dtype=np.int64)

    def _ret_empty():
        return (empty_i, empty_i, empty_s, empty_i,
                np.zeros(n, dtype=np.int64),
                empty_i if positions else None)

    if n == 0:
        return _ret_empty()

    if mode == "simple":
        per_doc = [(t or "").lower().split() for t in texts]
        per_doc = [[w for w in ws if len(w) <= MAX_TOKEN_LEN] for ws in per_doc]
        doc_lens_arr = np.fromiter((len(ws) for ws in per_doc), np.int64, n)
        flat_terms = np.array(
            [w for ws in per_doc for w in ws], dtype=object)
        flat_doc = np.repeat(np.arange(n, dtype=np.int64), doc_lens_arr)
        # simple mode: position = index among KEPT tokens
        # (tokenize_with_positions increments pos only on emission)
        starts = np.concatenate(([0], np.cumsum(doc_lens_arr)[:-1]))
        flat_pos = (np.arange(flat_doc.size, dtype=np.int64)
                    - np.repeat(starts, doc_lens_arr))
    elif mode == "code":
        base_per_doc = [_BASE_TOKEN_RE.findall(t or "") for t in texts]
        base_lens = np.fromiter((len(b) for b in base_per_doc), np.int64, n)
        n_base = int(base_lens.sum())
        if n_base == 0:
            return _ret_empty()
        flat_base = np.fromiter(
            itertools.chain.from_iterable(base_per_doc),
            dtype=object, count=n_base)
        codes, uniq = pd.factorize(flat_base, sort=False)
        # over-long base tokens truncate at the UNIQUE level (then
        # re-factorize the tiny dictionary, since truncation can
        # collapse distinct tokens) — no per-occurrence length checks
        if any(len(u) > MAX_TOKEN_LEN for u in uniq):
            trunc = np.fromiter(
                (u if len(u) <= MAX_TOKEN_LEN else u[:MAX_TOKEN_LEN]
                 for u in uniq), dtype=object, count=len(uniq))
            remap, uniq = pd.factorize(trunc, sort=False)
            codes = remap[codes]
        # expand each unique base token ONCE (lru-cached across batches)
        exp_lists = [_expand_identifier(u) for u in uniq]
        exp_len = np.fromiter((len(e) for e in exp_lists), np.int64, len(uniq))
        exp_flat = np.array([t for e in exp_lists for t in e], dtype=object)
        exp_start = np.concatenate(([0], np.cumsum(exp_len)[:-1]))
        # term ids assigned on the (small) unique-expansion table, then
        # fanned out by INTEGER gather — the per-emission object-term
        # array and its full-size factorize never exist
        sub_ids, term_dict = pd.factorize(exp_flat, sort=False)
        # ragged gather: occurrence j (base code c) emits exp_lists[c]
        occ_doc = np.repeat(np.arange(n, dtype=np.int64), base_lens)
        occ_starts = np.concatenate(([0], np.cumsum(base_lens)[:-1]))
        # base ordinal of each occurrence within its doc
        occ_pos = (np.arange(occ_doc.size, dtype=np.int64)
                   - np.repeat(occ_starts, base_lens))
        L = exp_len[codes]
        total = int(L.sum())
        offs = np.concatenate(([0], np.cumsum(L)[:-1]))
        ar = (np.arange(total, dtype=np.int64)
              + np.repeat(exp_start[codes] - offs, L))
        tids = sub_ids[ar]
        flat_doc = np.repeat(occ_doc, L)
        flat_pos = np.repeat(occ_pos, L)
        if tids.size == 0:
            return _ret_empty()
        term_dict = np.asarray(term_dict, dtype=object)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode!r}")

    if mode == "simple":
        if flat_terms.size == 0:
            return _ret_empty()
        tids, term_dict = pd.factorize(flat_terms, sort=False)
    keep = None
    lens_ok = np.fromiter((len(t) <= MAX_TOKEN_LEN for t in term_dict),
                          bool, len(term_dict))
    if not lens_ok.all():
        keep = lens_ok[tids]
    if filter_stopwords and mode == "code":
        lang_keys = sorted({(l or "") for l in (langs or [])} | {""})
        lang_idx_map = {l: i for i, l in enumerate(lang_keys)}
        stop_2d = np.zeros((len(lang_keys), len(term_dict)), dtype=bool)
        for l, li in lang_idx_map.items():
            sw = LANG_STOPWORDS.get(l, frozenset())
            if sw:
                stop_2d[li] = np.fromiter(
                    (t in sw for t in term_dict), bool, len(term_dict))
        doc_lang = np.fromiter(
            (lang_idx_map[(l or "")] for l in (langs or [None] * n)),
            np.int64, n)
        stop_hit = stop_2d[doc_lang[flat_doc], tids]
        keep = ~stop_hit if keep is None else (keep & ~stop_hit)
    if keep is not None:
        flat_doc, tids = flat_doc[keep], tids[keep]
        if positions:
            flat_pos = flat_pos[keep]
    if flat_doc.size == 0:
        return _ret_empty()

    doc_len_out = np.bincount(flat_doc, minlength=n).astype(np.int64)
    # lexicographic rank so per-doc output order == sorted(counts.items())
    rank = np.empty(len(term_dict), dtype=np.int64)
    rank[np.argsort(term_dict, kind="stable")] = np.arange(len(term_dict))
    # ONE radix argsort on the combined (doc, rank) key instead of a
    # 2-3 key lexsort over per-emission arrays; positions need no sort
    # key — emission order already has them ascending within each
    # (doc, term) pair, and a stable sort preserves that
    key = flat_doc * np.int64(len(term_dict)) + rank[tids]
    order = np.argsort(key, kind="stable")
    key_o = key[order]
    if positions:
        flat_pos = flat_pos[order]
    boundary = np.flatnonzero(np.diff(key_o).astype(bool)) + 1
    starts = np.concatenate(([0], boundary))
    ends = np.concatenate((boundary, [key_o.size]))
    # gather doc/tid at PAIR granularity only (order[starts]) — the
    # full emission-level sorted doc/tid arrays are never needed
    pair_idx = order[starts]
    g_doc = flat_doc[pair_idx]
    g_tid = tids[pair_idx]
    g_tf = (ends - starts).astype(np.int64)
    return (g_doc, g_tid, np.asarray(term_dict, dtype=object), g_tf,
            doc_len_out, flat_pos if positions else None)


def count_terms_batch(
    texts: list[str],
    mode: str = "code",
    langs: list[str | None] | None = None,
    filter_stopwords: bool = False,
    positions: bool = False,
):
    """Vectorized T1-T5 over a whole Arrow batch: for each doc, the
    sorted unique terms, their tfs, and doc_len. Semantically identical
    to per-doc :func:`count_terms` + ``sorted(counts.items())`` (pytest
    parity property), but the tallying is one factorize + lexsort over
    the batch instead of a Python ``Counter`` per document — the regex
    scan (C) is the only per-doc work left. Thin per-doc-slicing
    wrapper over :func:`count_terms_flat`.

    With ``positions=True`` returns a 4th list: per doc, the flat int64
    base positions of every emission, ordered (term asc, position asc)
    — i.e. segment t of the flat array (sliced by the doc's tfs) holds
    the ascending positions of the doc's t-th term, exactly matching
    :func:`tokenize_with_positions` semantics (sub-tokens of one
    identifier share its base ordinal).
    """
    n = len(texts)
    if n == 0:
        return ([], [], [], []) if positions else ([], [], [])
    g_doc, g_tid, term_dict, g_tf, doc_len_out, flat_pos = \
        count_terms_flat(texts, mode, langs, filter_stopwords, positions)
    g_terms = term_dict[g_tid]
    doc_bounds = np.searchsorted(g_doc, np.arange(n + 1))
    term_arrs = [g_terms[doc_bounds[d]:doc_bounds[d + 1]] for d in range(n)]
    tf_arrs = [g_tf[doc_bounds[d]:doc_bounds[d + 1]] for d in range(n)]
    dls = [int(x) for x in doc_len_out]
    if not positions:
        return term_arrs, tf_arrs, dls
    # flat_pos is in (doc, term-rank, pos) order; per-doc emission
    # counts = per-doc sum of pair tfs = doc_len_out
    emis_bounds = np.concatenate(
        ([0], np.cumsum(doc_len_out))).astype(np.int64)
    pos_arrs = [flat_pos[emis_bounds[d]:emis_bounds[d + 1]] for d in range(n)]
    return term_arrs, tf_arrs, dls, pos_arrs


_SUBTOKEN_SQL_RE = "[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+"


def doc_len_sql(col: str, mode: str) -> str:
    """Catalyst SQL expression computing EXACTLY this module's doc_len
    (emitted-term count) for ``filter_stopwords=False`` — the common
    build config. Lets the docs stage stay entirely JVM-side (no token
    arrays, no Arrow round trip just to count emissions); exact parity
    with :func:`count_terms` is pytest-asserted per mode. Wrap in
    ``coalesce(..., 0)`` for null text."""
    if mode == "simple":
        # Python str.split() splits on Unicode whitespace -> (?U)\s
        return (f"size(filter(split(lower({col}), '(?U)\\\\s+'), "
                f"x -> x != '' AND length(x) <= {MAX_TOKEN_LEN}))")
    if mode != "code":
        raise ValueError(f"unknown tokenizer mode: {mode!r}")
    # per base token: 1 emission if it has <= 1 sub-token, else
    # n_sub + 1 (the sub-tokens plus the whole lowercased identifier) —
    # _expand_identifier semantics
    return ("aggregate(transform(regexp_extract_all(%s, '[A-Za-z0-9_]+', 0), "
            "t -> size(regexp_extract_all(substring(t, 1, %d), '%s', 0))), "
            "0, (acc, n) -> acc + IF(n <= 1, 1, n + 1))"
            % (col, MAX_TOKEN_LEN, _SUBTOKEN_SQL_RE))


def analyze_query_term(term: str, mode: str = "code") -> list[str]:
    """Analyze one query token the same way documents are analyzed
    (Bleve analyzes query strings with the field analyzer). A
    multi-part identifier in a query expands to its whole-token form
    only (exact identifier search), matching the indexed whole token —
    sub-token recall is available by querying the sub-token itself."""
    if mode == "simple":
        t = term.lower()
        return [t] if t else []
    toks = _code_base_tokens(term)
    return [t.lower() for t in toks if t]
