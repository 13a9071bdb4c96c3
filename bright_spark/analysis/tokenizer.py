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

import re
from collections import Counter

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
