#!/usr/bin/env python
"""DuckDB-proxy benchmark: run each bench HEADLINE query's ORACLE SQL in
embedded DuckDB over the same sf parquet files bench.py uses, min-of-N.

The reference publishes no numbers (BASELINE.md); this proxy — the
reference's execution engine, modernized — is the single-node comparison
bench.py totals are judged against. Prints one JSON line mirroring
bench.py's shape so the two artifacts diff cleanly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("DUCK_PROXY_RUNS", "3"))


def main() -> None:
    import duckdb

    from bench import EXTENSION_HEADLINE, HEADLINE
    from dbt_parquet_spark.registry import load_all
    from dbt_parquet_spark.sources.readers import TESTDATA_TABLES, table_path

    specs = load_all()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM parquet_scan('{p}')"
            )
    names = [
        n for n in HEADLINE + EXTENSION_HEADLINE if n in specs and specs[n].oracle
    ]
    times: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(specs[name].oracle).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_proxy_total_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
                "runs": RUNS,
            }
        )
    )


if __name__ == "__main__":
    main()
