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
                 filter_stopwords=False, n_partitions=8):
        self.mode = mode
        self.k1 = k1
        self.b = b
        self.content_col = content_col
        if id_col is None:
            # engine doc_id order: (murmur3 hash partition, natural key)
            # — see builder.build_docs / index.hashing
            from bright_spark.index.hashing import partition_id
            rows = sorted(rows, key=lambda r: (
                partition_id([r[c] for c in key_cols], n_partitions),
                tuple(r[c] for c in key_cols)))
        self.docs = []
        self.tfs: list[dict[str, int]] = []
        self.dls: list[int] = []
        for i, r in enumerate(rows):
            doc_id = int(r[id_col]) if id_col else i
            lang = r.get(lang_col) if lang_col else None
            counts, dl = count_terms(r.get(content_col) or "", mode, lang, filter_stopwords)
            self.docs.append({**r, "doc_id": doc_id, "doc_len": dl})
            self.tfs.append(dict(counts))
            self.dls.append(dl)
        self.by_id = {d["doc_id"]: (d, tf, dl)
                      for d, tf, dl in zip(self.docs, self.tfs, self.dls)}
        self.n = len(self.docs)
        self.total_tokens = sum(self.dls)
        self.avgdl = self.total_tokens / self.n if self.n else 0.0
        self.df: dict[str, int] = {}
        for tf in self.tfs:
            for t in tf:
                self.df[t] = self.df.get(t, 0) + 1

    # -------------------------------------------------------- scoring

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5)) if df else 0.0

    def tfn(self, tf: int, dl: int) -> float:
        return tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / max(self.avgdl, 1e-9)))

    def _expand(self, clause) -> list[str]:
        if clause.kind == "wildcard":
            hits = sorted(t for t in self.df if _wildcard_match(clause.value, t))
            return hits[:MAX_EXPANSIONS]
        if clause.kind == "fuzzy":
            q = clause.value.lower()
            hits = sorted(
                t for t in self.df
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

    def _phrase_ok(self, doc: dict, tokens: list[str]) -> bool:
        toks = tokenize_with_positions(doc.get(self.content_col) or "", mode=self.mode)
        pos: dict[str, set[int]] = {}
        for t, p in toks:
            pos.setdefault(t, set()).add(p)
        starts = pos.get(tokens[0], set())
        return any(all((s + i) in pos.get(t, ())
                       for i, t in enumerate(tokens[1:], 1)) for s in starts)

    # --------------------------------------------------------- search

    def search(self, q: str, k: int = 10):
        """Returns (hits [(doc_id, score)], total_hits). Exhaustive, no
        pruning — semantics per SURVEY.md §2.5/§2.6."""
        pq = parse_query(q)
        is_attr = lambda c: c.kind == "range" or (
            c.field_name is not None and c.field_name != self.content_col
            and c.field_name in (self.docs[0].keys() if self.docs else ()))

        must_groups: list[list[str]] = []
        should_terms: list[tuple[str, float]] = []
        must_not_terms: set[str] = set()
        phrases: list[tuple[list[str], float]] = []
        attr_must, attr_not = [], []
        boosts: dict[str, float] = {}

        def record(terms, boost):
            for t in terms:
                boosts[t] = max(boosts.get(t, 0.0), boost)

        for role, clauses in (("must", pq.must), ("should", pq.should),
                              ("must_not", pq.must_not)):
            for cl in clauses:
                if is_attr(cl):
                    (attr_not if role == "must_not" else attr_must).append(cl)
                    continue
                if cl.kind == "phrase":
                    toks = tokenize(cl.value, mode=self.mode)
                    if len(toks) == 1:
                        cl = type(cl)(kind="term", value=toks[0], boost=cl.boost)
                    elif toks:
                        phrases.append((toks, cl.boost))
                        record(toks, cl.boost)
                        continue
                    else:
                        continue
                terms = self._expand(cl)
                if role == "must":
                    must_groups.append(sorted(set(terms)))
                    record(terms, cl.boost)
                elif role == "should":
                    should_terms.extend((t, cl.boost) for t in terms)
                    record(terms, cl.boost)
                else:
                    must_not_terms.update(terms)

        has_positive = bool(must_groups or should_terms or phrases)
        scoring = sorted(boosts)

        hits = []
        total = 0
        for doc, tf, dl in zip(self.docs, self.tfs, self.dls):
            if any(not self._attr_ok(doc, c) for c in attr_must):
                continue
            if any(self._attr_ok(doc, c) for c in attr_not):
                continue
            if any(t in tf for t in must_not_terms):
                continue
            if has_positive:
                if any(not any(t in tf for t in g) for g in must_groups):
                    continue
                if must_groups and not any(g for g in must_groups):
                    continue
                if not any(t in tf for t in scoring):
                    continue
                if phrases and any(not self._phrase_ok(doc, toks) for toks, _ in phrases):
                    continue
                score = 0.0
                for t in scoring:
                    if t in tf:
                        score += boosts[t] * self.idf(t) * self.tfn(tf[t], dl)
            else:
                score = 1.0
            total += 1
            hits.append((doc["doc_id"], score))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k], total
