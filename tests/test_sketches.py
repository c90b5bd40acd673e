"""Bloom-filter semi-join invariants beyond the oracle row: no false
negatives (candidates ⊇ true matches) and a sane false-positive rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.operators.sketches import (
    HIGH_VALUE,
    bloom_bitmap,
    bloom_might_contain,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    hi = orders.filter(F.col("o_totalprice") > HIGH_VALUE).select("o_orderkey")
    bm = bloom_bitmap(hi, "o_orderkey")
    cand = li.crossJoin(F.broadcast(bm)).filter(
        bloom_might_contain("bloom", "l_orderkey")
    )
    true = li.join(
        hi.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    n_cand, n_true, n_all = cand.count(), true.count(), li.count()
    assert n_cand >= n_true  # no false negatives
    # all true-match rows survive the bloom stage
    missing = true.join(
        cand.select("l_orderkey", "l_linenumber"), ["l_orderkey", "l_linenumber"], "left_anti"
    ).count()
    assert missing == 0
    # the pre-filter actually filters, and FPs stay under 5% of the probe
    assert n_cand < n_all
    assert (n_cand - n_true) <= 0.05 * n_all


def test_bucketed_join_has_no_exchange(spark):
    # the point of q_bucketed_join: bucket-co-located tables join with zero
    # shuffle nodes in the physical plan
    from dbt_parquet_spark.operators.lifecycle import q_bucketed_join

    df = q_bucketed_join(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_kmv_sketch_bounded_and_estimate_close(spark):
    """The two-level min-k build must bound every sketch at k entries, and
    on THIS fixed data draw the intersection estimate must sit inside 15%
    (deterministic: fixed hashes). The compared-output band (KMV_TOL) is
    deliberately wider — distributional, any draw — so the tight check
    lives here, per ADVICE r4."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.sketches import (
        KMV_K,
        kmv_intersection_estimate,
        kmv_sketch,
        q_kmv_intersection,
    )
    from dbt_parquet_spark.sources.readers import load_table

    from .conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events")
    sk = kmv_sketch(events, "event_type", F.col("user_id").cast("string"))
    for r in sk.collect():
        assert len(r.sketch) <= KMV_K
        assert r.sketch == sorted(r.sketch)  # min-k, ascending
    row = q_kmv_intersection(spark, SF_ORACLE).collect()[0]
    assert row.kmv_within_tol
    assert row.n_both_exact > 0
    # tight band on the fixed draw: raw estimate within 15% of exact
    est = kmv_intersection_estimate(spark, SF_ORACLE).collect()[0].est_both
    assert abs(est - row.n_both_exact) <= 0.15 * row.n_both_exact


def test_source_overlap_kmv_tight_band(spark):
    """Per-draw calibration for q_source_overlap: on the FIXED sf0.01 draw
    the raw KMV union estimates are much tighter than the 25% band the
    compared output asserts (measured: median 2.8%, max 11.1%). Bounds here
    are ~1.4x the measured max / 2x the measured median, so a regression in
    the sketch math fails loudly while data-draw variance cannot."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.dedup import doc_shingles
    from dbt_parquet_spark.operators.sketches import KMV_K, kmv_sketch

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "source")
    sv = (
        doc_shingles(spark, SF_ORACLE)
        .join(docs, "doc_id")
        .select("source", F.col("s").alias("gram"))
        .distinct()
    )
    counts = {
        r.source: r.n
        for r in sv.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sketches = {
        r.source: sorted(r.sketch)
        for r in kmv_sketch(sv, "source", F.col("gram")).collect()
    }
    a = sv.select(F.col("source").alias("sa"), "gram")
    b = sv.select(F.col("source").alias("sb"), "gram")
    common = {
        (r.sa, r.sb): r.c
        for r in a.join(b, "gram")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    errs = []
    srcs = sorted(counts)
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            exact_union = counts[s1] + counts[s2] - common.get((s1, s2), 0)
            merged = sorted(set(sketches[s1]) | set(sketches[s2]))[:KMV_K]
            m = len(merged)
            if m < KMV_K:
                est = float(m)
            else:
                est = (m - 1) / (merged[-1] / 2.0**64 + 0.5)
            errs.append(abs(est - exact_union) / exact_union)
    errs.sort()
    assert errs[len(errs) // 2] <= 0.06  # median
    assert errs[-1] <= 0.15  # max

    # The shipped sketch-only builder (the 100 TB mode) must produce the
    # same estimates this test derived by hand, within the same bands.
    from dbt_parquet_spark.operators.sketches import source_overlap_kmv

    ests = {
        (r.source_a, r.source_b): r.d_union_est
        for r in source_overlap_kmv(spark, SF_ORACLE).collect()
    }
    assert set(ests) == {
        (s1, s2) for i, s1 in enumerate(srcs) for s2 in srcs[i + 1 :]
    }
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            exact_union = counts[s1] + counts[s2] - common.get((s1, s2), 0)
            err = abs(ests[(s1, s2)] - exact_union) / exact_union
            assert err <= 0.15, (s1, s2, err)


def test_cms_overestimate_within_width_bound(spark):
    """CMS structural guarantees on the fixed sf0.01 draw: est >= exact for
    every probed token (always true by construction), and the one-row
    error bound est - exact <= total_tokens / CMS_WIDTH (holds whp; on the
    fixed draw it must hold outright or the sketch math regressed)."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_counters,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    total = toks.count()
    exact = {r.tok: r.n for r in toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    counters = {(r.row, r.col): r.c for r in cms_counters(toks).collect()}
    assert len(counters) <= CMS_DEPTH * CMS_WIDTH
    assert sum(c for (row, _), c in counters.items() if row == 0) == total

    probes = toks.distinct().select(
        "tok",
        *[
            F.pmod(
                F.xxhash64(F.concat(F.lit(f"cms{d}|"), F.col("tok"))), F.lit(CMS_WIDTH)
            ).alias(f"col{d}")
            for d in range(CMS_DEPTH)
        ],
    ).collect()
    bound = total / CMS_WIDTH
    for r in probes:
        est = min(counters[(d, r[f"col{d}"])] for d in range(CMS_DEPTH))
        assert est >= exact[r.tok]
        assert est - exact[r.tok] <= bound, (r.tok, est, exact[r.tok], bound)
