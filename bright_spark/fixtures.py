"""Deterministic synthetic corpora (FIXTURES.md F1/F4).

The reference's benchmark generator is wall-clock-seeded
(`benchmarks/generate_data.go:121`); ours is explicitly seeded so
golden outputs are reproducible (SURVEY.md §5). No external data.
"""

from __future__ import annotations

import hashlib
import random

import pandas as pd

LANGS = [("python", 40, "py"), ("go", 25, "go"), ("java", 20, "java"), ("js", 15, "js")]

# Zipfian identifier vocabulary: camelCase + snake_case mixes (F1).
_ID_STEMS = [
    "get", "set", "parse", "read", "write", "load", "save", "init", "close",
    "open", "build", "make", "run", "start", "stop", "check", "find", "merge",
    "split", "join", "map", "filter", "reduce", "sort", "hash", "encode",
    "decode", "send", "recv", "sync", "flush", "retry", "cache", "index",
]
_ID_NOUNS = [
    "user", "config", "file", "session", "token", "request", "response",
    "buffer", "stream", "record", "batch", "query", "result", "error",
    "handler", "client", "server", "socket", "path", "value", "key", "node",
    "tree", "list", "table", "row", "column", "field", "schema", "worker",
]
_KEYWORDS = {
    "python": ["def", "self", "return", "import", "class", "if", "else", "for", "in", "try", "except", "raise", "with", "as", "None", "True", "False"],
    "go": ["func", "return", "package", "import", "if", "err", "nil", "for", "range", "var", "type", "struct", "defer", "go", "chan"],
    "java": ["public", "private", "static", "void", "class", "return", "new", "if", "else", "for", "final", "throws", "this", "null"],
    "js": ["function", "return", "const", "let", "var", "if", "else", "for", "new", "async", "await", "this", "null", "export"],
}

# Planted needles with known host rows (F1: "known set of 'needle'
# identifiers planted in known docs for query tests").
NEEDLES = [
    ("quasar_flux_capacitor", 7),
    ("omegaZetaHandler", 13),
    ("xylophone_quantum_gate", 29),
    ("praxisVortexEngine", 41),
]


def _zipf_choice(rng: random.Random, items: list[str], s: float = 1.1) -> str:
    """Zipfian pick (rank-frequency s≈1.1 per FIXTURES.md F1)."""
    n = len(items)
    weights = [1.0 / ((i + 1) ** s) for i in range(n)]
    return rng.choices(items, weights=weights, k=1)[0]


def _make_identifier(rng: random.Random) -> str:
    stem = _zipf_choice(rng, _ID_STEMS)
    noun = _zipf_choice(rng, _ID_NOUNS)
    if rng.random() < 0.5:  # snake_case
        extra = "" if rng.random() < 0.6 else "_" + _zipf_choice(rng, _ID_NOUNS)
        return f"{stem}_{noun}{extra}"
    # camelCase
    extra = "" if rng.random() < 0.6 else _zipf_choice(rng, _ID_NOUNS).capitalize()
    return f"{stem}{noun.capitalize()}{extra}"


def _make_content(rng: random.Random, lang: str, row_idx: int) -> str:
    kws = _KEYWORDS[lang]
    n_lines = rng.randint(30, 300)
    lines = [f"// generated module {row_idx}" if lang != "python" else f"# generated module {row_idx}"]
    for _ in range(n_lines):
        kind = rng.random()
        ident = _make_identifier(rng)
        kw = _zipf_choice(rng, kws)
        if kind < 0.35:
            lines.append(f"{kw} {ident}({_make_identifier(rng)}, {_make_identifier(rng)}):")
        elif kind < 0.7:
            lines.append(f"    {ident} = {_make_identifier(rng)}({_zipf_choice(rng, _ID_NOUNS)})")
        elif kind < 0.85:
            lines.append(f"    {kw} {ident}.{_make_identifier(rng)}")
        else:
            lines.append(f'    {ident} = "{_zipf_choice(rng, _ID_NOUNS)} literal {rng.randint(0, 99)}"')
    content = "\n".join(lines)
    for needle, host in NEEDLES:
        if row_idx == host:
            content += f"\n{needle} = {needle}_impl()\n{needle}.activate()"
    return content


def _row_spec(seed: int, row_idx: int) -> tuple[str, str, str, str]:
    """Deterministic per-row (repo, path, commit, lang) — independent of
    any other row, so generation parallelizes (make_repos_spark)."""
    rng = random.Random(f"{seed}:meta:{row_idx}")
    repo = f"org{rng.randint(0, 4)}/proj{rng.randint(0, 3)}"
    lang_pop = [l for l, w, _ in LANGS for _ in range(w)]
    lang = rng.choice(lang_pop)
    ext = next(e for l, _, e in LANGS if l == lang)
    # ~10% of rows are an extra revision of the previous row's file
    if row_idx > 0 and rng.random() < 0.1:
        prev = _row_spec(seed, row_idx - 1)
        repo, path, lang = prev[0], prev[1], prev[3]
        commit = hashlib.sha1(f"{repo}:{path}:r{row_idx}".encode()).hexdigest()
        return repo, path, commit, lang
    path = (f"src/{_zipf_choice(rng, _ID_NOUNS)}/"
            f"{_zipf_choice(rng, _ID_STEMS)}_{row_idx:06d}.{ext}")
    commit = hashlib.sha1(f"{repo}:{path}:r0".encode()).hexdigest()
    return repo, path, commit, lang


def make_repo_row(seed: int, row_idx: int) -> dict:
    repo, path, commit, lang = _row_spec(seed, row_idx)
    rng = random.Random(f"{seed}:content:{row_idx}")
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": _make_content(rng, lang, row_idx)}


def make_repos(n_rows: int = 2000, seed: int = 42) -> pd.DataFrame:
    """F1 primary corpus: (repo, path, commit, lang, content)."""
    return pd.DataFrame([make_repo_row(seed, i) for i in range(n_rows)])


def make_repos_spark(spark, n_rows: int, seed: int = 42, partitions: int = 32):
    """Distributed deterministic corpus generation (row-parallel; the
    output is independent of ``partitions``)."""
    import pandas as pd  # noqa: F811

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([make_repo_row(seed, int(i)) for i in pdf["id"]])

    ids = spark.range(0, n_rows, numPartitions=partitions)
    return ids.mapInPandas(
        gen, "repo STRING, path STRING, commit STRING, lang STRING, content STRING")


# --------------------------------------------------------- F4 products

_ADJECTIVES = ["sleek", "rugged", "compact", "premium", "budget", "wireless", "smart", "portable"]
_PRODUCT_NAMES = ["laptop", "computer", "phone", "tablet", "monitor", "keyboard", "mouse", "headset", "camera", "printer", "router", "speaker"]
_CATEGORIES = ["electronics", "computers", "accessories", "office", "gaming", "audio", "photography", "networking", "storage", "displays", "peripherals", "wearables", "smart-home", "components", "software", "mobile", "tablets", "printers"]
_TAGS = ["new", "sale", "refurbished", "popular", "limited", "clearance", "bestseller", "eco"]


def make_products(n_rows: int = 1000, seed: int = 42) -> pd.DataFrame:
    """F4 secondary fixture mirroring the reference benchmark corpus
    (`benchmarks/generate_data.go:12-20`), deterministic."""
    rng = random.Random(seed)
    rows = []
    for i in range(1, n_rows + 1):
        name = f"{rng.choice(_ADJECTIVES)} {rng.choice(_PRODUCT_NAMES)}"
        rows.append({
            "id": str(i),
            "name": name,
            "description": f"A {name} for {rng.choice(_CATEGORIES)} with {rng.choice(_TAGS)} quality",
            "price": round(rng.uniform(10.0, 510.99), 2),
            "category": rng.choice(_CATEGORIES),
            "tags": rng.sample(_TAGS, rng.randint(1, 3)),
            "inStock": rng.random() < 0.8,
        })
    return pd.DataFrame(rows)
