"""PII detection / redaction for training-data pipelines.

The reference engine has no PII surface — this is part of the
beyond-the-reference training-data toolkit (like operators/dedup.py and
operators/text.py). Everything is pure Column expressions over RE2-safe
regexes (no lookaround, no backreferences), so the exact same patterns run
in Spark (Java regex), DuckDB (RE2) for the oracle, and any downstream
engine a cleaned corpus is handed to.

At 100 TB this is the cheapest kind of operator there is: a handful of
regex scans fused into whole-stage codegen, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe: character classes + bounded repetition + \b only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# NANP-ish phone: 555-123-4567 / 555.123.4567 / (555) 123-4567
PHONE_RE = r"\(?\b[0-9]{3}\)?[-. ][0-9]{3}[-.][0-9]{4}\b"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
    "ssn": SSN_RE,
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts, e.g. ``{"email": <n_email>, ...}``."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")
        for kind, pat in PATTERNS.items()
    }


def has_pii(text: Column) -> Column:
    c = pii_counts(text)
    total = None
    for col in c.values():
        total = col if total is None else total + col
    return total > 0


def redact(text: Column) -> Column:
    """Replace every match with a typed placeholder token. SSN runs before
    phone (both match digit triples; the more specific pattern must win)."""
    out = text
    for kind in ("email", "ssn", "phone", "ipv4"):
        out = F.regexp_replace(out, PATTERNS[kind], f"[{kind.upper()}]")
    return out
