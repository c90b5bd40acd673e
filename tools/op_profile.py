#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each named query (default: the bench headliner set), runs the builder
through the noop sink N times inside its own job group and reports:

    wall per rep, #Spark jobs, #stages, #tasks, and (optionally) writes
    plans/r14/<name>_{before,after}.txt with .explain("formatted").

Usage:
    python tools/op_profile.py q_agg_multi q_knn_eval          # profile two
    python tools/op_profile.py --top 20                        # 20 slowest from BENCH_DETAIL_r13.json
    python tools/op_profile.py --plans before q_agg_multi      # also dump plan
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Round tag for the plans/<round>/ dump dir (r15 optimization round).
ROUND = os.environ.get("OP_PROFILE_ROUND", "r15")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    reps = 3
    plans_tag = None
    top_n = 0
    for f in flags:
        if f.startswith("--reps="):
            reps = int(f.split("=")[1])
        elif f.startswith("--plans="):
            plans_tag = f.split("=")[1]
        elif f.startswith("--top="):
            top_n = int(f.split("=")[1])

    from dbt_parquet_spark.registry import load_all
    from dbt_parquet_spark.session import get_spark

    spark = get_spark("op_profile")
    sc = spark.sparkContext
    specs = load_all()

    names = list(args)
    if top_n:
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL_r13.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        names += [k for k, _ in ranked[:top_n] if k not in names]
    names = [n for n in names if n in specs]

    # Same JVM warm-up as bench.py so rep-1 doesn't carry class-loading.
    from pyspark.sql import functions as F

    spark.range(1000).count()
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    warm = region.groupBy("r_name").agg(
        F.sum(F.col("r_regionkey").cast("decimal(12,2)")).cast("double").alias("s"),
        F.countDistinct("r_regionkey").alias("d"),
    )
    warm.join(F.broadcast(region.select("r_name")), "r_name").write.format(
        "noop"
    ).mode("overwrite").save()

    st = sc.statusTracker()
    print(f"{'query':38s} {'reps (s)':28s} {'jobs':>4s} {'stages':>6s} {'tasks':>6s}")
    results = {}
    for name in names:
        walls = []
        jobs = stages = tasks = 0
        for rep in range(reps):
            group = f"{name}#rep{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            try:
                df = specs[name].builder(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001
                print(f"{name:38s} ERROR {type(exc).__name__}: {exc}")
                break
            walls.append(time.perf_counter() - t0)
            if rep == reps - 1:  # count the WARM rep's jobs (scaffolds cached)
                ids = st.getJobIdsForGroup(group)
                jobs = len(ids)
                for jid in ids:
                    ji = st.getJobInfo(jid)
                    if ji is None:
                        continue
                    stages += len(ji.stageIds)
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si is not None:
                            tasks += si.numTasks
            sc.setJobGroup("", "")
        if not walls:
            continue
        if plans_tag:
            os.makedirs(os.path.join(REPO, "plans", ROUND), exist_ok=True)
            p = os.path.join(REPO, "plans", ROUND, f"{name}_{plans_tag}.txt")
            with open(p, "w") as fh:
                fh.write(specs[name].builder(spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        rep_s = " ".join(f"{w:6.3f}" for w in walls)
        print(f"{name:38s} {rep_s:28s} {jobs:4d} {stages:6d} {tasks:6d}")
        results[name] = {"walls": [round(w, 3) for w in walls], "jobs": jobs,
                         "stages": stages, "tasks": tasks}
    out = os.path.join(REPO, "plans", ROUND, "profile.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    prev = {}
    if os.path.exists(out):
        try:
            prev = json.load(open(out))
        except Exception:  # noqa: BLE001
            prev = {}
    prev.update(results)
    with open(out, "w") as fh:
        json.dump(prev, fh, indent=1)


if __name__ == "__main__":
    main()
