"""Pure-Python BM25 oracle (SURVEY.md §5).

The reference ships no correctness oracle (its tests assert only lock
safety, store/store_test.go), so this exhaustive, pruning-free scorer
is the ground truth the Spark engine must be rank-identical to. It
shares the tokenizer and the query parser with the engine (both are
pure Python) but executes everything with plain dicts/loops: different
execution, same semantics — a genuine differential oracle for the
distributed paths.

Determinism contract matched with the engine kernel:
- doc ids: dense rank over natural-key sort (or source-provided id)
- idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tfn = tf(k1+1)/(tf + k1(1-b+b*dl/avgdl))
- per-doc score accumulated over scoring terms in sorted-term order
  (same IEEE addition order as the kernel)
- ranking: score desc, doc_id asc
"""

from __future__ import annotations

import math

from bright_spark.analysis.tokenizer import (
    analyze_query_term,
    count_terms,
    tokenize,
    tokenize_with_positions,
)
from bright_spark.query.parser import parse_query

MAX_EXPANSIONS = 1024


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _wildcard_match(pattern: str, term: str) -> bool:
    import re
    rx = "".join(
        ".*" if c == "*" else "." if c == "?" else re.escape(c)
        for c in pattern.lower()
    )
    return re.fullmatch(rx, term) is not None


class OracleIndex:
    def __init__(self, rows, *, content_col="content", key_cols=("repo", "path", "commit"),
                 id_col=None, lang_col="lang", mode="code", k1=1.2, b=0.75,
                 filter_stopwords=False, n_partitions=8, text_cols=()):
        self.mode = mode
        self.k1 = k1
        self.b = b
        self.content_col = content_col
        self.text_cols = tuple(c for c in text_cols if c != content_col)
        self.fields = [content_col, *self.text_cols]
        if id_col is None:
            # engine doc_id order: (murmur3 hash partition, natural key)
            # — see builder.build_docs / index.hashing
            from bright_spark.index.hashing import partition_id
            rows = sorted(rows, key=lambda r: (
                partition_id([r[c] for c in key_cols], n_partitions),
                tuple(r[c] for c in key_cols)))
        self.docs = []
        # per-field postings stats (Q5); self.tfs/dls/df/avgdl stay the
        # content field's view for existing callers
        self.tf_f: dict[str, list[dict[str, int]]] = {f: [] for f in self.fields}
        self.dl_f: dict[str, list[int]] = {f: [] for f in self.fields}
        for i, r in enumerate(rows):
            doc_id = int(r[id_col]) if id_col else i
            lang = r.get(lang_col) if lang_col else None
            for f in self.fields:
                counts, dl = count_terms(r.get(f) or "", mode, lang, filter_stopwords)
                self.tf_f[f].append(dict(counts))
                self.dl_f[f].append(dl)
            self.docs.append({**r, "doc_id": doc_id,
                              "doc_len": self.dl_f[content_col][-1]})
        self.tfs = self.tf_f[content_col]
        self.dls = self.dl_f[content_col]
        self.by_id = {d["doc_id"]: (d, tf, dl)
                      for d, tf, dl in zip(self.docs, self.tfs, self.dls)}
        self.n = len(self.docs)
        self.total_tokens = sum(self.dls)
        self.avgdl = self.total_tokens / self.n if self.n else 0.0
        self.df_f: dict[str, dict[str, int]] = {}
        self.avgdl_f: dict[str, float] = {}
        for f in self.fields:
            dfd: dict[str, int] = {}
            for tf in self.tf_f[f]:
                for t in tf:
                    dfd[t] = dfd.get(t, 0) + 1
            self.df_f[f] = dfd
            self.avgdl_f[f] = (sum(self.dl_f[f]) / self.n) if self.n else 0.0
        self.df = self.df_f[content_col]

    # -------------------------------------------------------- scoring

    def idf(self, term: str, field: str | None = None) -> float:
        df = self.df_f[field or self.content_col].get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5)) if df else 0.0

    def tfn(self, tf: int, dl: int, field: str | None = None) -> float:
        avgdl = self.avgdl_f[field or self.content_col]
        return tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / max(avgdl, 1e-9)))

    def _expand(self, clause, field: str) -> list[str]:
        if clause.kind == "wildcard":
            hits = sorted(t for t in self.df_f[field]
                          if _wildcard_match(clause.value, t))
            return hits[:MAX_EXPANSIONS]
        if clause.kind == "fuzzy":
            q = clause.value.lower()
            hits = sorted(
                t for t in self.df_f[field]
                if abs(len(t) - len(q)) <= clause.fuzziness
                and _levenshtein(t, q) <= clause.fuzziness)
            return hits[:MAX_EXPANSIONS]
        return list(analyze_query_term(clause.value, mode=self.mode))

    def _attr_ok(self, doc: dict, clause) -> bool:
        col = clause.field_name
        val = doc.get(col)
        if clause.kind == "wildcard":
            return val is not None and _wildcard_match(clause.value, str(val).lower())
        if clause.op in (None, "="):
            return str(val) == clause.value
        ref = type(val)(clause.value) if isinstance(val, (int, float)) else clause.value
        if clause.op == ">":
            return val > ref
        if clause.op == ">=":
            return val >= ref
        if clause.op == "<":
            return val < ref
        if clause.op == "<=":
            return val <= ref
        if clause.op == "between":
            hi = type(val)(clause.hi) if isinstance(val, (int, float)) else clause.hi
            return ref <= val <= hi
        raise ValueError(clause.op)

    def _phrase_ok(self, doc: dict, tokens: list[str],
                   field: str | None = None) -> bool:
        text = doc.get(field or self.content_col) or ""
        toks = tokenize_with_positions(text, mode=self.mode)
        pos: dict[str, set[int]] = {}
        for t, p in toks:
            pos.setdefault(t, set()).add(p)
        starts = pos.get(tokens[0], set())
        return any(all((s + i) in pos.get(t, ())
                       for i, t in enumerate(tokens[1:], 1)) for s in starts)

    # --------------------------------------------------------- search

    def search(self, q: str, k: int = 10):
        """Returns (hits [(doc_id, score)], total_hits). Exhaustive, no
        pruning — semantics per SURVEY.md §2.5/§2.6. Field-scoped
        clauses (Q5) score against that field's own postings stats."""
        pq = parse_query(q)
        doc_keys = self.docs[0].keys() if self.docs else ()

        def text_field_of(c):
            fn = c.field_name
            if fn is None or fn in (self.content_col, "content", "_all"):
                return self.content_col
            if fn in self.text_cols:
                return fn
            return None

        def is_attr(c):
            return c.kind == "range" or (
                text_field_of(c) is None and c.field_name in doc_keys)

        must_groups: list[list[tuple[str, str]]] = []
        should_keys: list[tuple[str, str]] = []
        must_not_keys: set[tuple[str, str]] = set()
        phrases: list[tuple[str, list[str], float]] = []
        neg_phrases: list[tuple[str, list[str]]] = []
        attr_must, attr_not = [], []
        boosts: dict[tuple[str, str], float] = {}
        has_unmatchable = False

        def record(field, terms, boost):
            for t in terms:
                key = (field, t)
                boosts[key] = max(boosts.get(key, 0.0), boost)

        for role, clauses in (("must", pq.must), ("should", pq.should),
                              ("must_not", pq.must_not)):
            for cl in clauses:
                if is_attr(cl):
                    (attr_not if role == "must_not" else attr_must).append(cl)
                    continue
                field = text_field_of(cl)
                if field is None:  # unknown field: matches nothing
                    if role == "must":
                        must_groups.append([])
                    elif role == "should":
                        has_unmatchable = True
                    continue
                if cl.kind == "phrase":
                    toks = tokenize(cl.value, mode=self.mode)
                    if len(toks) == 1:
                        cl = type(cl)(kind="term", value=toks[0],
                                      boost=cl.boost, field_name=cl.field_name)
                    elif toks and role == "must_not":
                        neg_phrases.append((field, toks))
                        continue
                    elif toks:
                        phrases.append((field, toks, cl.boost))
                        record(field, toks, cl.boost)
                        continue
                    else:
                        continue
                terms = self._expand(cl, field)
                if role == "must":
                    must_groups.append(sorted({(field, t) for t in terms}))
                    record(field, terms, cl.boost)
                elif role == "should":
                    should_keys.extend((field, t) for t in terms)
                    record(field, terms, cl.boost)
                else:
                    must_not_keys.update((field, t) for t in terms)
                if not terms:
                    if role == "must":
                        must_groups.append([])
                    elif role == "should":
                        has_unmatchable = True

        has_positive = bool(must_groups or should_keys or phrases
                            or has_unmatchable)
        scoring = sorted(boosts)

        hits = []
        total = 0
        for i, doc in enumerate(self.docs):
            tf_of = lambda f: self.tf_f[f][i]
            if any(not self._attr_ok(doc, c) for c in attr_must):
                continue
            if any(self._attr_ok(doc, c) for c in attr_not):
                continue
            if any(t in tf_of(f) for f, t in must_not_keys):
                continue
            if any(self._phrase_ok(doc, toks, f) for f, toks in neg_phrases):
                continue
            if has_positive:
                if any(not any(t in tf_of(f) for f, t in g)
                       for g in must_groups):
                    continue
                if not any(t in tf_of(f) for f, t in scoring):
                    continue
                if phrases and any(not self._phrase_ok(doc, toks, f)
                                   for f, toks, _ in phrases):
                    continue
                score = 0.0
                for f, t in scoring:
                    tf = tf_of(f)
                    if t in tf:
                        score += (boosts[(f, t)] * self.idf(t, f)
                                  * self.tfn(tf[t], self.dl_f[f][i], f))
            else:
                score = 1.0
            total += 1
            hits.append((doc["doc_id"], score))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k], total
