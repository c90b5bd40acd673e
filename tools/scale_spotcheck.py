#!/usr/bin/env python
"""sf1 scaling spot-check (r15, VERDICT_r14 next-round #7).

At sf0.1 every input is a single-row-group file of 0.6–11 MB, so the
8-vs-32-core bench ratios sit at ≈1 for every query — fixed overhead
dominates and the scaling check cannot separate serial-by-bug from
overhead-bound. This tool synthesizes a deterministic ~sf1 corpus from
sf0.1 (REPL=10 replicas, written as multi-file tables so scans get real
splits) and measures the core-count ratio where data actually dominates.

Synthesis is designed to scale WORK LINEARLY, not quadratically:

- documents: every token of replica i is prefixed ``r{i}x`` → replica
  vocabularies/shingle spaces are DISJOINT, so posting joins and dedup
  candidate volumes grow 10x (linear), with each replica's internal
  near-dup structure identical to sf0.1. doc_id offset by a stride.
- embeddings: replica i's vectors are multiplied elementwise by a
  deterministic ±1 pattern (a diagonal orthogonal transform): cosines
  WITHIN a replica are bit-preserved (same near-dup structure), cosines
  across replicas are scrambled noise, and sign-chunk blocking keys
  diverge across replicas → candidate volume stays linear.
- lineitem/orders: row replicas with key strides (distinct rows, intact
  order↔line relationships); other TPC-H side tables copied as-is.

Usage:
    python tools/scale_spotcheck.py --build /tmp/sfsynth
    SPARK_GRAFT_CPUS=8  python tools/scale_spotcheck.py --run /tmp/sfsynth
    SPARK_GRAFT_CPUS=32 python tools/scale_spotcheck.py --run /tmp/sfsynth
    python tools/scale_spotcheck.py --ratio /tmp/sfsynth   # runs both via subprocess

Default query set: the bench's data-heavy five (scan/aggregate, distinct
diff, token pipeline, posting-join dedup, embedding blocking).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SPOTCHECK_REPL", "10"))
QUERIES = [
    "q_agg_multi",
    "q_except_diff",
    "q_source_drift",
    "q_dedup_ngram_jaccard",
    "q_embedding_cosine_dedup",
]
COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "events"]


def build(out: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    os.makedirs(out, exist_ok=True)
    for t in COPY_TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        if os.path.exists(src):
            papq.write_table(papq.read_table(src), os.path.join(out, f"{t}.parquet"))

    # documents: token-prefixed replicas in one multi-file directory table
    docs = papq.read_table(os.path.join(SRC, "documents.parquet"))
    ddir = os.path.join(out, "documents.parquet")
    os.makedirs(ddir, exist_ok=True)
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang")
    srcs = docs.column("source")
    stride = max(ids) + 1
    for i in range(REPL):
        pref = f"r{i}x"
        ntext = [" ".join(pref + w for w in t.split(" ")) for t in texts]
        tbl = pa.table(
            {
                "doc_id": pa.array([d + i * stride for d in ids], pa.int64()),
                "text": pa.array(ntext, pa.string()),
                "lang": langs,
                "source": srcs,
                "n_chars": pa.array([len(t) for t in ntext], pa.int64()),
            }
        )
        papq.write_table(tbl, os.path.join(ddir, f"part-{i:02d}.parquet"))

    # embeddings: sign-flipped replicas (diagonal orthogonal per replica)
    emb = papq.read_table(os.path.join(SRC, "embeddings.parquet"))
    edir = os.path.join(out, "embeddings.parquet")
    os.makedirs(edir, exist_ok=True)
    vids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)
    labels = emb.column("label")
    vstride = int(vids.max()) + 1
    dim = vecs.shape[1]
    for i in range(REPL):
        signs = np.where(
            np.random.default_rng([20260817, i]).random(dim) < 0.5, -1.0, 1.0
        ) if i else np.ones(dim)
        flipped = vecs * signs
        tbl = pa.table(
            {
                "vec_id": pa.array((vids + i * vstride).tolist(), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in flipped], pa.list_(pa.float64())
                ),
                "label": labels,
            }
        )
        papq.write_table(tbl, os.path.join(edir, f"part-{i:02d}.parquet"))

    # lineitem / orders: key-strided row replicas
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src_t = papq.read_table(os.path.join(SRC, f"{t}.parquet"))
        tdir = os.path.join(out, f"{t}.parquet")
        os.makedirs(tdir, exist_ok=True)
        keys = np.asarray(src_t.column(key).to_pylist(), dtype=np.int64)
        kstride = int(keys.max()) + 1
        for i in range(REPL):
            cols = {}
            for name in src_t.column_names:
                if name == key:
                    cols[name] = pa.array((keys + i * kstride).tolist(), pa.int64())
                else:
                    cols[name] = src_t.column(name)
            papq.write_table(pa.table(cols), os.path.join(tdir, f"part-{i:02d}.parquet"))
    print(f"built {out} (REPL={REPL})")


def _spin_s() -> float:
    """Single-thread CPU canary (bench.py's instrument): the host's speed
    epochs swing 2-3x on this box, and the 8- vs 32-core runs are separate
    subprocesses — a ratio whose two sides ran in different epochs is
    garbage. Each run prints its canary so the artifact shows whether the
    pair is comparable (sp within ~15% of each other)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def run(sf_dir: str, queries: list[str]) -> None:
    from dbt_parquet_spark.registry import load_all
    from dbt_parquet_spark.session import get_spark

    spark = get_spark("scale_spotcheck")
    spark.sparkContext.setLogLevel("ERROR")
    # The synth corpus is ~150 MB: at the default 128 MB split size the
    # whole scan packs into 1-2 splits and every core count above 2 idles
    # at the scan — a LAYOUT artifact this tool exists to remove (a real
    # warehouse table has orders of magnitude more splits than cores).
    # 8 MB splits give the scan ~20-40 tasks, i.e. the splits≫cores regime
    # the ratio is supposed to measure. Tool-session conf only; the engine
    # and bench never touch it.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")
    specs = load_all()
    sp0 = _spin_s()
    out = {}
    for name in queries:
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 2))
        out[name] = min(walls)
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "sf_dir": sf_dir,
                      "queries": out, "sp0": sp0, "sp1": _spin_s()}))


def ratio(sf_dir: str, queries: list[str]) -> None:
    res = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", sf_dir],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        res[cpus] = json.loads(line)["queries"]
        print(line)
    ratios = {q: round(res["8"][q] / res["32"][q], 2) for q in res["32"]
              if res["32"].get(q)}
    print(json.dumps({"ratio_8_over_32": ratios}))


if __name__ == "__main__":
    mode, path = sys.argv[1], sys.argv[2]
    qs = sys.argv[3].split(",") if len(sys.argv) > 3 else QUERIES
    if mode == "--build":
        build(path)
    elif mode == "--run":
        run(path, qs)
    elif mode == "--ratio":
        ratio(path, qs)
    else:
        raise SystemExit(f"unknown mode {mode}")
