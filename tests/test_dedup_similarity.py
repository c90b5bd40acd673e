"""Quality checks for the approximate operators: the LSH/sketch paths must be
(a) sound — no candidates outside the exact result where soundness is
guaranteed by the verify step — and (b) high-recall vs their exact baselines."""

from __future__ import annotations

from dbt_parquet_spark.operators.dedup import (
    q_dedup_minhash,
    q_dedup_ngram_jaccard,
    q_dedup_simhash,
)
from dbt_parquet_spark.operators.similarity import q_ann_lsh, q_ann_topk

from .conftest import SF_ORACLE


def _pairs(df):
    return {(r.d1, r.d2) for r in df.select("d1", "d2").collect()}


def test_minhash_sound_and_high_recall(spark):
    exact = _pairs(q_dedup_ngram_jaccard(spark, SF_ORACLE))
    approx = _pairs(q_dedup_minhash(spark, SF_ORACLE))
    # Soundness: the verify step guarantees every emitted pair passes the
    # exact Jaccard threshold. Candidate generation differs (bands vs shared
    # shingle) so approx may legitimately contain pairs that share no 5-gram
    # but still pass token-Jaccard — check against a superset-free criterion:
    # every approx pair is a true near-dup (jaccard >= threshold), which the
    # builder enforces; here we check recall of the exact blocked set.
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.7, f"minhash recall too low: {recall} ({len(exact)} exact pairs)"


def test_simhash_near_dup_properties(spark):
    rows = q_dedup_simhash(spark, SF_ORACLE).collect()
    for r in rows:
        assert r.d1 < r.d2
        assert 0 <= r.hamming <= 3


def test_ann_lsh_recall(spark):
    exact = {(r.query_id, r.neighbor_id) for r in q_ann_topk(spark, SF_ORACLE).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in q_ann_lsh(spark, SF_ORACLE).collect()}
    # Bucketed search only sees the query's bucket: recall is parameter-bound,
    # not 1.0; require a sane floor and that results are real neighbors.
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"
    for q, n in approx:
        assert q != n


def test_ann_topk_is_deterministic(spark):
    a = q_ann_topk(spark, SF_ORACLE).collect()
    b = q_ann_topk(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_blocked_cosine_dedup_subset_of_exact(spark):
    from dbt_parquet_spark.operators.similarity import (
        q_embedding_cosine_dedup,
        q_embedding_cosine_dedup_exact,
    )

    blocked = {(r.d1, r.d2) for r in q_embedding_cosine_dedup(spark, SF_ORACLE).collect()}
    exact = {(r.d1, r.d2) for r in q_embedding_cosine_dedup_exact(spark, SF_ORACLE).collect()}
    # Blocking only PRUNES candidates — every blocked pair must be a true
    # near-dup (soundness), and some must survive (non-vacuous on this data).
    assert blocked <= exact
    assert blocked, "blocked near-dup returned no pairs — threshold/blocking broke"
    # Recall on isotropic noise is pigeonhole-bound (~7% at cos>=0.35; on
    # clustered corpora with cos>=0.95 near-dups it is ~0.96). Floor it so a
    # blocking regression (e.g. wrong chunk math) fails loudly.
    assert len(blocked) / len(exact) >= 0.05


def test_neardup_bits_pin_and_scaling(spark):
    """(a) The static ORACLE_BITS must equal what the driver's sf0.01
    corpus resolves to — if the testdata is ever regenerated at a different
    size, this surfaces the oracle/runtime divergence locally. (b) At the
    bigger corpus the auto-scaled width must hold the per-doc candidate
    rate non-increasing (the whole point of scaling bits with log2 N —
    fixed bits measured ~linear growth in r4's sweep)."""
    from dbt_parquet_spark.operators.similarity import (
        ORACLE_BITS,
        blocked_candidates,
        neardup_chunk_bits,
    )
    from dbt_parquet_spark.sources.readers import load_table

    n_small = load_table(spark, SF_ORACLE, "embeddings").count()
    assert neardup_chunk_bits(n_small) == ORACLE_BITS

    sf_big = "/root/testdata/sf0.1"
    n_big = load_table(spark, sf_big, "embeddings").count()
    bits_big = neardup_chunk_bits(n_big)
    assert bits_big > ORACLE_BITS  # 2000 vectors -> wider chunks

    rate_small = blocked_candidates(spark, SF_ORACLE).count() / n_small
    rate_big = blocked_candidates(spark, sf_big).count() / n_big
    assert rate_big <= rate_small * 1.1, (
        f"per-doc candidate rate grew: {rate_small:.2f} -> {rate_big:.2f}"
    )


def test_blocked_dedup_oracle_parity_at_scaled_bits(spark):
    """The Spark plan and the regenerated oracle SQL must agree at a corpus
    size where the auto-scaled width differs from ORACLE_BITS — proving the
    'both sides generated from the same bits' property holds off the
    driver's scale, not just at it."""
    import duckdb

    from dbt_parquet_spark.operators.similarity import (
        blocked_cosine_pairs_sql,
        neardup_chunk_bits,
        q_embedding_cosine_dedup,
    )
    from dbt_parquet_spark.sources.readers import load_table, table_path

    from .oracle_utils import compare_spark_duckdb

    sf_big = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{table_path(sf_big, 'embeddings')}')"
    )
    bits = neardup_chunk_bits(load_table(spark, sf_big, "embeddings").count())
    sql = f"""
    WITH {blocked_cosine_pairs_sql(bits)}
    SELECT d1, d2 FROM cos_pairs
    """
    ok, msg = compare_spark_duckdb(
        q_embedding_cosine_dedup(spark, sf_big).select("d1", "d2"), con, sql
    )
    assert ok, msg


def test_sign_chunk_parity_both_modes(spark):
    """Chunk values must match DuckDB bit-for-bit in raw-dim mode (bits=8)
    AND hyperplane mode (bits=17 > 64/4 raw-dim ceiling) — value-level
    parity, meaningful even where 2^17 buckets can't collide at test
    scale. The hyperplane fold uses the same sequential-double dot the
    cosine oracle already proves bit-identical."""
    import duckdb

    from dbt_parquet_spark.operators.similarity import (
        sign_chunk_values,
        sign_chunk_values_sql,
    )
    from dbt_parquet_spark.sources.readers import table_path

    from .oracle_utils import compare_spark_duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{table_path(SF_ORACLE, 'embeddings')}')"
    )
    for bits in (8, 17):
        ok, msg = compare_spark_duckdb(
            sign_chunk_values(spark, SF_ORACLE, bits), con, sign_chunk_values_sql(bits)
        )
        assert ok, f"bits={bits}: {msg}"


def test_simhash_branch_free_votes_match_reference_form(spark):
    """The branch-free signature (raw-bit sums + shared count, majority =
    2*s_i > n) must be bit-identical to the textbook ±1-vote form it
    replaced, ties included."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.dedup import token_array
    from dbt_parquet_spark.sources.readers import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    tok = docs.select("doc_id", F.explode(token_array()).alias("tok"))
    h = F.xxhash64("tok")
    ref_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    ref_doc = tok.groupBy("doc_id").agg(*ref_sums)
    sim = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseXOR(bit)
    ref = {r.doc_id: r.simhash for r in ref_doc.select("doc_id", sim.alias("simhash")).collect()}

    new_sums = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"b{i}") for i in range(64)
    ]
    new_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *new_sums)
    sim2 = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim2 = bit if sim2 is None else sim2.bitwiseXOR(bit)
    new = {r.doc_id: r.simhash for r in new_doc.select("doc_id", sim2.alias("simhash")).collect()}
    assert ref == new


def test_span_dedup_reconstruction_invariants(spark):
    """Beyond the oracle hash: the cleaned text must be the original token
    sequence minus exactly the covered positions — kept count arithmetic,
    subsequence order, and the no-op case (docs with no frequent span keep
    their text verbatim)."""
    from dbt_parquet_spark.operators.dedup import q_span_dedup
    from dbt_parquet_spark.sources.readers import load_table

    orig = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    }
    rows = q_span_dedup(spark, SF_ORACLE).collect()
    assert len(rows) == len(orig)
    n_scrubbed = 0
    for r in rows:
        toks = orig[r.doc_id]
        kept = r.cleaned_text.split(" ") if r.cleaned_text else []
        assert r.n_tokens == len(toks)
        assert len(kept) == r.n_tokens - r.n_removed
        if r.n_removed == 0:
            assert kept == toks
        else:
            n_scrubbed += 1
            # kept must be a subsequence of the original tokens
            it = iter(toks)
            assert all(t in it for t in kept)
    assert n_scrubbed > 0  # non-vacuous at sf0.01 (71 docs measured)


def test_ngram_bucket_cap_safe_on_boilerplate_corpus(spark, tmp_path):
    """The production max_bucket cap is safe exactly when hot buckets are
    BOILERPLATE shingles — shared passages across many non-duplicate docs,
    whose candidate pairs the Jaccard verify rejects anyway, while true
    near-dup pairs share many rarer shingles and survive via those. This
    corpus is built to that shape (the shipped synthetic corpus is not:
    its near-dups share only 1-3 shingles, so ANY candidate-dropping cap
    loses pairs there — measured, which is why q_dedup_ngram_jaccard runs
    uncapped for the exact contract). Pins: (a) some buckets exceed the
    cap, (b) capped final == uncapped final."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from dbt_parquet_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _verify_jaccard,
        pairs_from_buckets,
        shingle_sets,
        shingles,
    )
    from pyspark.sql import functions as F

    boiler = "terms of service apply all rights reserved contact us today"
    rows = []
    # 30 docs sharing the boilerplate passage + unique bodies (hot shingles,
    # pairwise Jaccard far below threshold)
    for i in range(30):
        body = " ".join(f"u{i}w{j}" for j in range(40))
        rows.append((i, f"{boiler} {body}"))
    # 5 true near-dup pairs sharing long unique passages (many rare shingles)
    for p in range(5):
        base = " ".join(f"p{p}tok{j}" for j in range(60))
        rows.append((100 + 2 * p, f"{base} alpha extra{p}"))
        rows.append((101 + 2 * p, f"{base} beta extra{p}"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "docs.parquet"))
    docs = spark.read.parquet(str(tmp_path / "docs.parquet"))
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).persist()
    exploded = toks.select("doc_id", F.explode(shingles(F.col("toks"), 5)).alias("s"))

    cap = 10
    hot_buckets = (
        exploded.groupBy("s").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > cap).count()
    )
    assert hot_buckets > 0, "no bucket exceeds the cap — test corpus broken"

    def final(max_bucket):
        cand = pairs_from_buckets(exploded, ["s"], max_bucket=max_bucket)
        out = _verify_jaccard(cand, shingle_sets(exploded), JACCARD_THRESHOLD)
        return {(r.d1, r.d2, round(r.jaccard, 9)) for r in out.collect()}

    uncapped = final(1_000_000)
    capped = final(cap)
    assert len(uncapped) >= 5  # the near-dup pairs exist
    assert capped == uncapped, "cap dropped a pair the verify keeps"
    toks.unpersist()


def test_minhash_signatures_shuffle_free_matches_groupby(spark):
    """The shuffle-free array-expression signature build (r6) must be
    BIT-IDENTICAL to the explode+groupBy formulation it replaced — same
    base-hash + integer-re-hash formula, different plan shape only."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.dedup import (
        NUM_PERM,
        doc_shingle_hashes,
        doc_shingles,
    )

    exploded = doc_shingles(spark, SF_ORACLE)
    hashed = exploded.select("doc_id", F.xxhash64("s").alias("h"))
    old = hashed.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh_{i}") for i in range(NUM_PERM)]
    )
    old_rows = {r.doc_id: tuple(r[i + 1] for i in range(NUM_PERM)) for r in old.collect()}

    hsdf = doc_shingle_hashes(spark, SF_ORACLE)
    sig_arr = F.transform(
        F.sequence(F.lit(0), F.lit(NUM_PERM - 1)),
        lambda i: F.array_min(F.transform(F.col("hs"), lambda h: F.xxhash64(h, i))),
    )
    new = hsdf.filter(F.size("hs") > 0).select("doc_id", sig_arr.alias("sig"))
    new_rows = {r.doc_id: tuple(r.sig) for r in new.collect()}
    assert old_rows == new_rows


def test_simhash_narrow_signatures_match_groupby(spark):
    """The r6 narrow (array-expression) simhash signature build must be
    bit-identical to the explode+groupBy bit-vote it replaced."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.dedup import doc_token_hashes, token_array
    from dbt_parquet_spark.sources.readers import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    tok = docs.select("doc_id", F.explode(token_array()).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1))).alias(f"b{i}") for i in range(64)
    ]
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") * 2 > F.col("n"), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseXOR(bit)
    old = {r.doc_id: r.s for r in per_doc.select("doc_id", sim.alias("s")).collect()}

    thdf = doc_token_hashes(spark, SF_ORACLE)
    n = F.size("th")
    sim2 = None
    for i in range(64):
        s_i = F.size(
            F.filter(F.col("th"), lambda hh: F.shiftright(hh, i).bitwiseAND(F.lit(1)) == 1)
        )
        bit = F.when(s_i * 2 > n, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sim2 = bit if sim2 is None else sim2.bitwiseXOR(bit)
    new = {r.doc_id: r.s for r in thdf.filter(n > 0).select("doc_id", sim2.alias("s")).collect()}
    assert old == new


def test_chunked_pair_expansion_matches_combinations(spark):
    """The memory-linear generator expansion (posexplode + tail-slice
    explode) must emit exactly the m·(m-1)/2 ordered pairs of each bucket —
    same set the old single-flattened-array shape produced, without any
    O(m²) row."""
    import itertools

    from dbt_parquet_spark.operators.dedup import chunked_pair_expansion
    from pyspark.sql import functions as F

    ids = [f"d{i:03d}" for i in range(120)]
    buckets = spark.createDataFrame([(sorted(ids),), (["a", "b"],)], "ids: array<string>")
    got = {
        (r.x, r.y)
        for r in chunked_pair_expansion(buckets, "ids").collect()
    }
    want = set(itertools.combinations(sorted(ids), 2)) | {("a", "b")}
    assert got == want
    assert len(got) == 120 * 119 // 2 + 1


def test_winnow_overlap_cap_safe_on_boilerplate_corpus(spark, tmp_path, monkeypatch):
    """VERDICT r6 #4: the hot-fingerprint bucket cap must drop EXACTLY the
    whole-bucket contributions of over-cap fingerprints and nothing else:
    production-with-cap == uncapped-shape self-join restricted to fps with
    df <= cap. Corpus built so some fp buckets exceed the cap (a shared
    boilerplate passage across 30 unrelated docs) while true overlap pairs
    ride many rare fingerprints."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from dbt_parquet_spark.operators import text as T
    from dbt_parquet_spark.operators.dedup import doc_token_arrays
    from pyspark.sql import functions as F

    boiler = " ".join(f"boil{j}" for j in range(20))
    rows = []
    for i in range(30):
        body = " ".join(f"u{i}w{j}" for j in range(40))
        rows.append((i, f"{boiler} {body}"))
    for p in range(5):
        base = " ".join(f"p{p}tok{j}" for j in range(60))
        rows.append((100 + 2 * p, f"{base} alpha extra{p}"))
        rows.append((101 + 2 * p, f"{base} beta extra{p}"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    papq.write_table(tbl, str(tmp_path / "documents.parquet"))
    sf_dir = str(tmp_path)

    w = T.winnow_fingerprints(doc_token_arrays(spark, sf_dir)).select("doc_id", "fp")
    cap = 10
    df_tab = w.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    assert df_tab.filter(F.col("n") > cap).count() > 0, "no hot fp — corpus broken"

    # reference: oracle-shaped self-join over ONLY the under-cap fps
    wk = w.join(df_tab.filter(F.col("n") <= cap).select("fp"), "fp")
    a, b = wk.alias("a"), wk.alias("b")
    ref = {
        (r.d1, r.d2, r.n)
        for r in (
            a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(
                F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= T.OVERLAP_MIN_FPS)
        ).collect()
    }
    assert len(ref) >= 5  # the true overlap pairs survive the cap

    monkeypatch.setattr(T, "WINNOW_MAX_BUCKET", cap)
    got = {(r.d1, r.d2, r.n_shared_fps) for r in T.q_winnow_overlap(spark, sf_dir).collect()}
    assert got == ref, "cap dropped/kept something other than whole hot buckets"


def test_dedup_evidence_frozen_winnow_cte_matches_source():
    """ADVICE r6: q_dedup_evidence's oracle embeds a FROZEN render of
    text._winnow_sql_cte() (importing text at dedup module level would
    reorder registry registration). Pin that the freeze never drifts: the
    rendered CTE must appear verbatim (modulo whitespace) in the evidence
    oracle, and the min-shared-fps constant must be OVERLAP_MIN_FPS."""
    import re

    from dbt_parquet_spark.operators.text import OVERLAP_MIN_FPS, _winnow_sql_cte
    from dbt_parquet_spark.registry import load_all

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s).strip()

    oracle = load_all()["q_dedup_evidence"].oracle
    assert norm(_winnow_sql_cte()) in norm(oracle), "frozen winnow CTE drifted from source"
    assert f"HAVING COUNT(*) >= {OVERLAP_MIN_FPS}" in norm(oracle)
    # r8: the media leg freezes THUMB_BYTES the same way
    from dbt_parquet_spark.operators.multimodal import THUMB_BYTES

    assert f"substr(text, 1, {THUMB_BYTES})" in norm(oracle), (
        "frozen thumbnail width drifted from multimodal.THUMB_BYTES"
    )
