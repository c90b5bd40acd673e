#!/usr/bin/env python
"""Append/refresh SURVEY.md §2D: the implemented-query inventory, generated
from the live registry so it can never drift from the code."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKER = "\n---\n\n## 2D. Implemented inventory (auto-generated"


def main() -> None:
    from dbt_parquet_spark.registry import load_all

    specs = load_all()
    lines = [
        MARKER.strip("\n")
        + f" by `tools/survey_inventory.py` — {len(specs)} queries, "
        + f"{sum(1 for s in specs.values() if s.oracle)} oracle-checked)",
        "",
        "Check = the driver's t2 comparison: `oracle` = full DuckDB value-hash",
        "equivalence at sf0.01; `rows-only` = weaker check, with the compensating",
        "test listed. Module = implementation site in `dbt_parquet_spark/`.",
        "",
        "| query | module | check | tags |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        mod = s.builder.__module__.removeprefix("dbt_parquet_spark.")
        check = "oracle" if s.oracle else "rows-only (see tests/)"
        lines.append(f"| {name} | {mod} | {check} | {', '.join(s.tags) or '—'} |")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    with open(path) as fh:
        content = fh.read()
    if MARKER in content:
        content = content[: content.index(MARKER)]
    with open(path, "w") as fh:
        fh.write(content.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print(f"SURVEY.md §2D refreshed: {len(specs)} queries")


if __name__ == "__main__":
    main()
