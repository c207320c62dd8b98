"""PII detection and redaction for training-data pipelines.

Pure column algebra: regex detection counts + chained ``regexp_replace``
redaction, all JVM-side/codegen. The patterns deliberately use only the
regex subset with identical semantics in Java (Spark) and RE2 (DuckDB)
— no backreferences, no lookaround — so a SQL oracle reproduces both
the counts and the redacted text byte-for-byte.

Redaction order matters when patterns can overlap (an email contains
digits, a phone contains an SSN-shaped infix): emails first, then the
longer phone pattern, then SSN, then IPv4 — each subsequent pattern runs
over the already-redacted string, exactly like the reference pipeline's
sequential processor chain.

At 100 TB this is a map-only projection: no shuffle, no UDF, regex
compiled once per task by codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PII_PATTERNS: dict[str, str] = {
    # order is the redaction order
    "email": r"[A-Za-z0-9._%+#-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}

REPLACEMENTS: dict[str, str] = {
    "email": "[EMAIL]",
    "phone": "[PHONE]",
    "ssn": "[SSN]",
    "ipv4": "[IP]",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Occurrence count per PII class, each counted on the text with all
    PREVIOUS classes already redacted (so a phone's SSN-shaped infix is
    not double-counted) — mirrors the redaction pass exactly."""
    counts: dict[str, Column] = {}
    cur = text
    for name, pat in PII_PATTERNS.items():
        counts[f"n_{name}"] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        cur = F.regexp_replace(cur, pat, REPLACEMENTS[name])
    return counts


def redact_pii(text: Column) -> Column:
    cur = text
    for name, pat in PII_PATTERNS.items():
        cur = F.regexp_replace(cur, pat, REPLACEMENTS[name])
    return cur


def scan_documents(
    df: DataFrame, *, text_col: str, id_col: str, keep_text: bool = True
) -> DataFrame:
    """Per-document PII report: counts per class, total, and the
    redacted text (droppable for counting-only sweeps)."""
    t = F.col(text_col)
    counts = pii_counts(t)
    cols = [F.col(id_col).alias("doc_id"), *[c.alias(k) for k, c in counts.items()]]
    total = None
    for k in counts:
        total = counts[k] if total is None else total + counts[k]
    cols.append(total.alias("n_pii_total"))
    if keep_text:
        cols.append(redact_pii(t).alias("redacted_text"))
    return df.select(*cols)
