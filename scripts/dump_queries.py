"""Regenerate QUERIES.md: the driver-contract query index — name, check
mode, one-line purpose (from each query's docstring) — so the registry
is reviewable without reading five modules.

Usage: python scripts/dump_queries.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from micromegas_spark.queries import REGISTRY


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(line.strip() for line in doc.strip().splitlines())
    for stop in (". ", " — the", " (", ":"):
        i = text.find(stop)
        if 0 < i < 140:
            return text[: i + (1 if stop == ". " else 0)]
    return text[:140]


def main() -> None:
    rows = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        mode = "oracle" if q.oracle else "rows-only"
        rows.append((name, mode, first_sentence(q.spark.__doc__)))
    n_oracle = sum(1 for _, m, _ in rows if m == "oracle")
    out = [
        "# QUERIES — driver-contract registry index",
        "",
        f"{len(rows)} queries; {n_oracle} DuckDB-oracle-checked, "
        f"{len(rows) - n_oracle} rows-only (sanctioned approximate/iterative "
        "classes). Regenerate with `python scripts/dump_queries.py`.",
        "",
        "| query | check | purpose |",
        "|---|---|---|",
    ]
    for name, mode, desc in rows:
        out.append(f"| `{name}` | {mode} | {desc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"QUERIES.md written ({len(rows)} queries, {n_oracle} oracle)")


if __name__ == "__main__":
    main()
