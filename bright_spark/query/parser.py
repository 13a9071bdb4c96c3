"""Query-string parser — the Bleve query-string language surface that
bright exposes (`README.md:44-53`; parsed at `handlers/search.go:94`,
`handlers/documents.go:237`, `store/store.go:472`).

Grammar (flat boolean — the reference README shows no parentheses):

    clause   := [modifier] [field ':'] value [fuzzy] [boost]
    modifier := '+' (must) | '-' (must_not)
    value    := word | '"' phrase '"' | wildcard | rangeexpr
    rangeexpr:= ('>'|'>='|'<'|'<='|'=') number        (e.g. price:>100)
               | '[' lo ' TO ' hi ']'                  (date/num range)
    fuzzy    := '~' [int]                              (hello~2)
    boost    := '^' float                              (term^2)
    infix    := 'AND' (both sides must) | 'OR' (should) | 'NOT' (negate next)

Default combinator for bare clauses is SHOULD (disjunction, scores
summed — SURVEY.md Q3). Output is a :class:`ParsedQuery` with
must/should/must_not clause lists (Q1-Q14 node types).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Clause:
    kind: str              # term | phrase | wildcard | fuzzy | range | match_all
    value: str = ""
    field_name: str | None = None   # Q5 field scoping
    boost: float = 1.0              # Q14
    fuzziness: int = 0              # Q10
    op: str | None = None           # range op: > >= < <= = between
    hi: str | None = None           # range upper bound (between)


@dataclass
class ParsedQuery:
    must: list[Clause] = field(default_factory=list)      # Q6
    should: list[Clause] = field(default_factory=list)    # Q3/Q7
    must_not: list[Clause] = field(default_factory=list)  # Q8

    @property
    def is_match_all(self) -> bool:  # Q1: empty q -> match-all
        return not (self.must or self.should or self.must_not)


_TOKEN_RE = re.compile(r'"[^"]*"|\[[^\]]*\]|\S+')
_RANGE_RE = re.compile(r"^(>=|<=|>|<|=)(.+)$")
_BETWEEN_RE = re.compile(r"^\[(.+?)\s+TO\s+(.+?)\]$")
_FUZZY_RE = re.compile(r"~(\d*)$")
_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)$")

# backslash escaping (Bleve query-string parity): '\c' makes c a
# literal — foo\:bar is one term, \"hi\" is not a phrase, pa\*s has no
# wildcard. Escaped chars are swapped for a \x00+hex sentinel BEFORE
# lexing (so no grammar rule can see them) and restored on the parsed
# clause's value/field afterwards.
_ESC_RE = re.compile(r"\\(.)", re.DOTALL)
# fixed-width 6-hex sentinel: codepoints reach 0x10ffff (6 digits), so
# a 4-digit sentinel would mis-restore escaped astral chars
_PROT_RE = re.compile("\x00([0-9a-f]{6})")


def _protect(q: str) -> str:
    return _ESC_RE.sub(lambda m: "\x00%06x" % ord(m.group(1)), q)


def _unprotect(s: str | None) -> str | None:
    if s is None or "\x00" not in s:
        return s
    return _PROT_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


def _lex(q: str) -> list[str]:
    """Split into raw tokens, keeping quoted phrases and [a TO b]
    ranges intact (a field prefix may precede either)."""
    out, i, n = [], 0, len(q)
    while i < n:
        if q[i].isspace():
            i += 1
            continue
        # consume an optional modifier + field prefix, then the value
        j = i
        if q[j] in "+-":
            j += 1
        m = re.match(r'[\w.\-/]+:', q[j:])
        if m:
            j += m.end()
        if j < n and q[j] == '"':
            end = q.find('"', j + 1)
            end = n if end < 0 else end + 1
        elif j < n and q[j] == "[":
            end = q.find("]", j + 1)
            end = n if end < 0 else end + 1
        else:
            end = j
            while end < n and not q[end].isspace():
                end += 1
        # trailing ~fuzz / ^boost may follow a quote/bracket
        while end < n and not q[end].isspace():
            end += 1
        out.append(q[i:end])
        i = end
    return out


def _parse_clause(raw: str) -> tuple[str | None, Clause]:
    """Returns (modifier, clause); modifier in {'+', '-', None}."""
    modifier = None
    if raw and raw[0] in "+-" and len(raw) > 1:
        modifier, raw = raw[0], raw[1:]

    field_name = None
    m = re.match(r'^([\w.\-/]+):(.+)$', raw, flags=re.DOTALL)
    if m:
        field_name, raw = m.group(1), m.group(2)

    boost = 1.0
    mb = _BOOST_RE.search(raw)
    if mb and not raw.startswith("["):
        boost = float(mb.group(1))
        raw = raw[: mb.start()]

    fuzziness = 0
    mf = _FUZZY_RE.search(raw)
    if mf and not raw.startswith('"'):
        fuzziness = int(mf.group(1) or "1")
        raw = raw[: mf.start()]

    mrange = _BETWEEN_RE.match(raw)
    if mrange:
        return modifier, Clause(kind="range", field_name=field_name, op="between",
                                value=mrange.group(1), hi=mrange.group(2), boost=boost)
    mop = _RANGE_RE.match(raw)
    if mop and field_name is not None:
        return modifier, Clause(kind="range", field_name=field_name,
                                op=mop.group(1), value=mop.group(2), boost=boost)
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return modifier, Clause(kind="phrase", field_name=field_name,
                                value=raw[1:-1], boost=boost)
    if fuzziness:
        return modifier, Clause(kind="fuzzy", field_name=field_name, value=raw,
                                fuzziness=fuzziness, boost=boost)
    if "*" in raw or "?" in raw:
        return modifier, Clause(kind="wildcard", field_name=field_name,
                                value=raw, boost=boost)
    return modifier, Clause(kind="term", field_name=field_name, value=raw, boost=boost)


def parse_query(q: str) -> ParsedQuery:
    """Parse a query string. Empty/whitespace -> match-all (Q1,
    handlers/search.go:90-92)."""
    pq = ParsedQuery()
    if not q or not q.strip():
        return pq

    tokens = _lex(_protect(q))
    # resolve infix operators into per-clause roles
    roles: list[tuple[str, str]] = []  # (role, raw_clause)
    i = 0
    negate_next = False
    pending_and = False
    while i < len(tokens):
        tok = tokens[i]
        if tok == "NOT":
            negate_next = True
            i += 1
            continue
        if tok in ("AND", "OR"):
            if tok == "AND":
                # promote the previous clause to must as well
                if roles and roles[-1][0] == "should":
                    roles[-1] = ("must", roles[-1][1])
                pending_and = True
            i += 1
            continue
        if negate_next:
            roles.append(("must_not", tok))
            negate_next = False
        elif pending_and:
            roles.append(("must", tok))
            pending_and = False
        else:
            roles.append(("should", tok))
        i += 1

    for role, raw in roles:
        modifier, clause = _parse_clause(raw)
        clause.value = _unprotect(clause.value)
        clause.hi = _unprotect(clause.hi)
        clause.field_name = _unprotect(clause.field_name)
        if modifier == "+":
            role = "must"
        elif modifier == "-":
            role = "must_not"
        getattr(pq, role).append(clause)
    return pq
