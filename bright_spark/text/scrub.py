"""PII scrubbing for training-data pipelines: redact emails, IPv4
addresses, hex secrets, and long ID-like digit runs from document
text, reporting per-category match counts.

All-JVM (``regexp_replace`` / ``regexp_extract_all`` inside
whole-stage codegen — no UDFs), and every pattern stays inside the
RE2-compatible regex subset so a DuckDB oracle can run the IDENTICAL
expressions: this is the standard pre-training scrub pass, run as one
columnar map over the corpus (embarrassingly parallel — no shuffle,
no skew surface at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Applied IN ORDER, each stage counting matches on the output of the
# previous stage (so the counts always agree with what the redacted
# text no longer contains). Hex runs before digit runs: a 32+ char
# digits-only token is treated as a hex-ish secret, not a number.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("hex", r"\b[0-9a-f]{32,}\b", "<HEX>"),
    ("num", r"\b\d{9,}\b", "<NUM>"),
]


def redact_pii(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(doc_id, text_redacted, n_email, n_ip, n_hex, n_num):
    sequentially replace each PII category with its placeholder,
    counting matches per stage."""
    cur = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.coalesce(F.size(F.regexp_extract_all(cur, F.lit(pat),
                                                   F.lit(0))), F.lit(0))
            .cast("bigint").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    return df.select(F.col(id_col).alias("doc_id"),
                     cur.alias("text_redacted"), *counts)
