#!/usr/bin/env python
"""Scale-sweep harness: replicate the sf0.1 testdata 10x (keys shifted so
cardinality ratios hold; document tokens rotated per replica so near-dup
structure doesn't degenerate into 10x exact copies), then run the bench
headliners on both scales and report the per-query scaling ratio.

A query whose plan is scale-correct should grow ~linearly (ratio <= ~10,
usually far less locally because fixed JVM overhead amortizes and the
replicated files give the scan real multi-task parallelism). Superlinear
ratios flag quadratic candidate generation or state blowups.

Usage:
    python tools/scale_sweep.py gen   # build /tmp/spark_graft_sweep/sf1
    python tools/scale_sweep.py run   # bench both scales, print ratios
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASE = "/root/testdata/sf0.1"
DEST = "/tmp/spark_graft_sweep/sf1"
REPLICAS = 10

# key column -> shift amount per replica (comfortably above the sf0.1 max)
KEYED = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 100_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
# joined-to keys must shift IDENTICALLY on both sides so join selectivity
# is preserved: lineitem.l_orderkey <-> orders.o_orderkey share 10_000_000,
# orders.o_custkey <-> customer.c_custkey share 1_000_000.
UNKEYED = ["region", "nation", "supplier", "part"]  # dims: copy once


def gen() -> None:
    from pyspark.sql import functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbt_parquet_spark.session import get_spark
    from dbt_parquet_spark.sources.readers import read_parquet

    spark = get_spark("scale_sweep_gen")
    os.makedirs(DEST, exist_ok=True)
    for table in UNKEYED:
        df = read_parquet(spark, f"{BASE}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{DEST}/{table}.parquet")
    for table, shifts in KEYED.items():
        df = read_parquet(spark, f"{BASE}/{table}.parquet")
        parts = []
        for i in range(REPLICAS):
            rep = df
            for col, step in shifts.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(i * step))
            if table == "documents" and i > 0:
                # rotate tokens by i so replicas are NOT near-dups of each
                # other (rotation changes every shingle except wraparound)
                toks = F.split("text", " ")
                n = F.size(toks)
                rot = F.concat(
                    F.slice(toks, i + 1, 100000), F.slice(toks, 1, i)
                )
                rep = rep.withColumn("text", F.array_join(rot, " "))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DEST}/{table}.parquet")
    print("generated", DEST)


def run() -> None:
    results = {}
    for label, sf_dir in [("sf0.1", BASE), ("sf1", DEST)]:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, env=env
        )
        line = out.stdout.strip().splitlines()[-1]
        results[label] = json.loads(line)
        print(label, "total", results[label]["value"], f"({time.time()-t0:.0f}s wall)")
    qs = results["sf0.1"]["queries"]
    print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name, t in sorted(qs.items(), key=lambda kv: -results['sf1']['queries'].get(kv[0], 0)):
        big = results["sf1"]["queries"].get(name)
        if big is None:
            continue
        ratio = big / t if t > 0 else float("inf")
        print(f"{name:28s} {t:8.3f} {big:8.3f} {ratio:6.1f}")
    with open("/tmp/spark_graft_sweep/results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    {"gen": gen, "run": run}[sys.argv[1]]()
