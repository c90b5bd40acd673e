"""Corpus-statistics operators — vocabulary, co-occurrence, dataset
splitting, stratified sampling: the accounting-and-curation layer of a
training-data pipeline (north-star surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

TRAIN_THRESHOLD = "c" * 32  # md5-hex < 'cc…' ⇔ uniform ~75% of the hash space


def banded_prefix_offsets(
    totals: DataFrame,
    order_cols: list,
    total_col: str,
    out_name: str,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Prefix sum of ``total_col`` over strictly-preceding band rows — ONE
    window over the band-TOTALS table (r15, guide §2.4). The band space is
    a fixed small domain by construction at every call site (≤ 64 log2
    buckets, ≤ 256 hash/uniform bands, ≤ 101 score bands), so the window's
    single task holds a bounded row count at ANY corpus size; the previous
    broadcast theta-join (B² comparisons) + re-aggregation cost one
    broadcast build and one extra exchange per evaluation for the same
    integers. ``order_cols`` may contain F.desc(...)/column expressions;
    pass ``partition_cols`` for per-group band spaces (perplexity's
    per-source bands)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = [c for c in totals.columns if c != total_col]
    return totals.select(
        *keep, F.coalesce(F.sum(total_col).over(w), F.lit(0)).alias(out_name)
    )


@register(
    "q_vocabulary",
    oracle="""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT token, COUNT(*) AS freq,
           RANK() OVER (ORDER BY COUNT(*) DESC, token ASC) AS freq_rank
    FROM toks
    GROUP BY token
    """,
    tags=("corpus", "vocabulary"),
)
def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with frequency ranks — the token-accounting table
    behind tokenizer training and frequency-based filtering.

    Scale: explode → groupBy(token) with map-side partials. The global rank
    is computed WITHOUT an unpartitioned window over the vocabulary (web
    vocabularies run 10⁸–10⁹ tokens): rank = band offset + position within
    band, where a band is (freq, 2-char token prefix). Band ordering is
    compatible with the target order (freq DESC, token ASC) because a
    fixed-length prefix truncation preserves lexicographic order across
    bands. Offsets come from a window over the band-size table — orders of
    magnitude smaller than the vocabulary (≤ occupied freq×prefix combos) —
    and the per-band row_number windows are partitioned, so no stage moves
    the whole vocabulary to one task. (freq, token) pairs are unique, so
    RANK ≡ ROW_NUMBER and the result matches the oracle's single global
    RANK exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("band", F.substring("token", 1, 2))
    )
    # Level 2 — ≤64 log2(freq) buckets; their prefix sum is one tiny window
    # over the bucket-totals table. (log2 is libm but only partitions the
    # work — it never reaches the compared output.)
    band_sizes = counts.groupBy("freq", "band").agg(F.count(F.lit(1)).alias("n_in_band"))
    freq_sizes = band_sizes.groupBy("freq").agg(F.sum("n_in_band").alias("n_in_freq"))
    bucketed = freq_sizes.withColumn("g", F.floor(F.log2("freq")))
    bucket_totals = bucketed.groupBy("g").agg(F.sum("n_in_freq").alias("n_in_bucket"))
    # offset = mass of HIGHER-frequency buckets -> strictly-preceding rows
    # in g DESC order (banded_prefix_offsets: one ≤64-row window, r15)
    bucket_offsets = banded_prefix_offsets(
        bucket_totals, [F.desc("g")], "n_in_bucket", "bucket_offset"
    )
    # Level 1 — frequencies within a bucket (log2 is monotone, so freq DESC
    # ⇔ bucket DESC then freq DESC within bucket); window partitioned by g.
    w_freq = (
        Window.partitionBy("g").orderBy(F.desc("freq")).rowsBetween(Window.unboundedPreceding, -1)
    )
    freq_offsets = (
        bucketed.join(F.broadcast(bucket_offsets), "g")
        .select(
            "freq",
            (
                F.col("bucket_offset") + F.coalesce(F.sum("n_in_freq").over(w_freq), F.lit(0))
            ).alias("freq_offset"),
        )
    )
    # Level 0 — prefix bands within a frequency, tokens within a band; both
    # windows partitioned. Fixed-length prefix truncation preserves token
    # order across bands, so the composed order is (freq DESC, token ASC).
    w_band = (
        Window.partitionBy("freq").orderBy(F.asc("band")).rowsBetween(Window.unboundedPreceding, -1)
    )
    band_offsets = band_sizes.select(
        "freq",
        "band",
        F.coalesce(F.sum("n_in_band").over(w_band), F.lit(0)).alias("band_offset"),
    ).join(freq_offsets, "freq")
    w_in_band = Window.partitionBy("freq", "band").orderBy(F.asc("token"))
    return (
        counts.join(band_offsets, ["freq", "band"])
        .select(
            "token",
            "freq",
            (F.col("freq_offset") + F.col("band_offset") + F.row_number().over(w_in_band)).alias(
                "freq_rank"
            ),
        )
    )


@register(
    "q_cooccurrence",
    oracle="""
    WITH doc_tokens AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    totals AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM doc_tokens),
    tok_df AS (SELECT tok, COUNT(*) AS df FROM doc_tokens GROUP BY tok),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS co_df
        FROM doc_tokens a JOIN doc_tokens b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT tok_a, tok_b, co_df,
           CAST(co_df AS DOUBLE) * (SELECT n_docs FROM totals)
             / (da.df * db.df) AS lift
    FROM pairs
    JOIN tok_df da ON tok_a = da.tok
    JOIN tok_df db ON tok_b = db.tok
    WHERE co_df >= 50
    """,
    tags=("corpus", "cooccurrence"),
)
def q_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token co-occurrence with lift (PMI's ratio without the
    log — logs are libm-specific, ratios of integer counts are bit-portable).
    The association-mining primitive for contamination/boilerplate analysis.

    Scale: the within-doc self-join is bounded by tokens-per-doc² per doc
    (not corpus²); for web-scale vocabularies, frequency-cap tokens first
    (stop-token removal, q_cooccurrence_capped) exactly like hot shingles
    in dedup. The corpus-size scalar joins in as a broadcast single-row
    aggregate — one plan, no eager driver-side count job. Tokenization
    rides the SHARED persisted token scaffold (doc_token_arrays), so the
    four plan branches (totals, df, both join sides) split the text once.
    """
    return cooccurrence_lift(spark, sf_dir, stop_df_cap=None)


def cooccurrence_lift(
    spark: SparkSession, sf_dir: str, stop_df_cap: int | None
) -> DataFrame:
    """The co-occurrence core. ``stop_df_cap`` drops tokens whose document
    frequency EXCEEDS the cap from pair GENERATION only (stop-token
    removal — the hot-key safety valve: a token in df docs contributes
    O(df · tokens-per-doc) join rows). Totals and per-token df stay
    computed from the full corpus, so for every surviving pair the stats
    are IDENTICAL to the uncapped run: capped output == uncapped output
    WHERE both tokens' df <= cap (pinned by test_corpus.py)."""
    from .dedup import doc_token_arrays

    toks = doc_token_arrays(spark, sf_dir)
    doc_tokens = toks.select(
        "doc_id", F.explode(F.array_distinct("toks")).alias("tok")
    )
    totals = doc_tokens.agg(F.countDistinct("doc_id").alias("n_docs"))
    tok_df = doc_tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    if stop_df_cap is not None:
        keep = F.broadcast(
            tok_df.filter(F.col("df") <= stop_df_cap).select("tok")
        )
        doc_tokens = doc_tokens.join(keep, "tok", "left_semi")
    a = doc_tokens.alias("a")
    b = doc_tokens.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("co_df"))
        .filter(F.col("co_df") >= 50)
    )
    da = tok_df.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    db = tok_df.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "tok_a",
            "tok_b",
            "co_df",
            (
                F.col("co_df").cast("double") * F.col("n_docs") / (F.col("df_a") * F.col("df_b"))
            ).alias("lift"),
        )
    )


# Production stop-token cap: at sf0.01 the corpus has ~30 tokens in >300 of
# 500 docs (function-word analogues); real web corpora have the same shape
# with far heavier heads. Chosen so the capped query is NON-vacuous at the
# driver's sf (some tokens are dropped) while remaining exactly checkable.
COOC_STOP_DF_CAP = 300


@register(
    "q_cooccurrence_capped",
    oracle=f"""
    WITH doc_tokens AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    totals AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM doc_tokens),
    tok_df AS (SELECT tok, COUNT(*) AS df FROM doc_tokens GROUP BY tok),
    kept AS (
        SELECT dt.doc_id, dt.tok FROM doc_tokens dt
        JOIN tok_df USING (tok) WHERE df <= {COOC_STOP_DF_CAP}
    ),
    pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS co_df
        FROM kept a JOIN kept b
          ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY a.tok, b.tok
    )
    SELECT tok_a, tok_b, co_df,
           CAST(co_df AS DOUBLE) * (SELECT n_docs FROM totals)
             / (da.df * db.df) AS lift
    FROM pairs
    JOIN tok_df da ON tok_a = da.tok
    JOIN tok_df db ON tok_b = db.tok
    WHERE co_df >= 50
    """,
    tags=("corpus", "cooccurrence", "capped"),
)
def q_cooccurrence_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_cooccurrence with the PRODUCTION stop-token df-cap engaged (drop
    tokens in > COOC_STOP_DF_CAP docs before pair generation). This is the
    form you run at web scale — the uncapped query's cost is dominated by
    exactly the head tokens this drops, and what it drops is precisely
    characterized: output == uncapped output restricted to pairs whose
    tokens BOTH have df <= cap (totals/df stats are computed pre-cap, so
    surviving pairs' lift values are bit-identical; pinned by test)."""
    return cooccurrence_lift(spark, sf_dir, stop_df_cap=COOC_STOP_DF_CAP)


@register(
    "q_train_test_split",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT n_chars,
               CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TRAIN_THRESHOLD}'
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    ) AS t
    GROUP BY split
    """,
    tags=("corpus", "split"),
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test split: assignment = md5(doc_id)
    compared against a hex threshold (~75% train). Hash-based (not modulo-id)
    so the split survives re-sharding, id renumbering, and incremental
    appends — and md5 makes the SAME assignment in every engine.

    Scale: map-only; the split column can be used as a partition key so
    train/test land in separate directories at write time.
    """
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < TRAIN_THRESHOLD, "train"
    ).otherwise("test")
    return (
        docs.select("n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "q_contamination",
    oracle="""
    WITH bench AS (
        SELECT doc_id AS bench_id,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 3),
                   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                     || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
                     || ' ' || string_split(text, ' ')[i+4]
               ))) AS s
        FROM documents WHERE doc_id IN (7, 42, 123)
    ),
    corpus AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 3),
                   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                     || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
                     || ' ' || string_split(text, ' ')[i+4]
               ))) AS s
        FROM documents WHERE doc_id NOT IN (7, 42, 123)
    )
    SELECT c.doc_id, b.bench_id, COUNT(DISTINCT c.s) AS n_shared_shingles
    FROM corpus c JOIN bench b ON c.s = b.s
    GROUP BY c.doc_id, b.bench_id
    """,
    tags=("corpus", "contamination", "dedup"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: find corpus documents sharing 5-gram
    shingles with a (tiny) benchmark set — the canonical eval-leakage check
    before training. Fully oracle-checked.

    Scale: the benchmark side is small by definition → broadcast the bench
    shingles; the corpus side streams through one shuffle-free probe plus a
    small aggregation. O(corpus tokens), never O(corpus × benchmark).
    """
    from .dedup import doc_shingles

    sh = doc_shingles(spark, sf_dir)
    bench_ids = (7, 42, 123)
    bench = sh.filter(F.col("doc_id").isin(*bench_ids)).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    corpus = sh.filter(~F.col("doc_id").isin(*bench_ids))
    return (
        corpus.join(F.broadcast(bench), "s")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("s").alias("n_shared_shingles"))
    )


@register(
    "q_histogram",
    oracle="""
    WITH bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT CAST(least(floor((value - lo) / ((hi - lo) / 20)), 19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bucket_total
    FROM events, bounds
    GROUP BY 1
    """,
    tags=("corpus", "histogram"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of event values — data profiling's
    first query. Bucket arithmetic is pure double IEEE ops on identical
    inputs → identical bucket assignment in both engines.

    Scale: the bounds aggregate is one tiny pre-pass broadcast into a
    map-only bucketing pass + small aggregation.
    """
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    from ..functions.exact import dec

    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20)),
        F.lit(19),
    ).cast("bigint")
    return (
        events.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("bucket_total"),
        )
    )


# Per-stratum sampling fractions (upweight rare langs, downweight the head)
# and their md5-space cut points: fraction f keeps rows whose 128-bit row
# hash falls in the first f of the hex space — the q_train_test_split /
# q_sample idiom, so every engine and every re-run selects the SAME rows.
STRATA_FRACTIONS = {"en": 0.3, "zh": 0.8, "es": 0.8, "de": 0.8, "fr": 0.8}
_STRATA_THRESHOLDS = {
    lang: format(int(f * 16**32), "032x") for lang, f in STRATA_FRACTIONS.items()
}
_STRATA_CASE_SQL = " ".join(
    f"WHEN '{lang}' THEN '{thr}'" for lang, thr in _STRATA_THRESHOLDS.items()
)


@register(
    "q_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) < CASE lang {_STRATA_CASE_SQL} END
    """,
    tags=("corpus", "sample"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: per-language fractions via md5-threshold on the
    row key — corpus rebalancing with engine-independent, reshard-stable row
    selection, so the full result is oracle-checked (seeded ``sampleBy`` is
    only reproducible within one engine; it stays covered by
    tests/test_corpus.py).

    Scale: a scan-side filter per stratum — no shuffle, no per-stratum
    passes; strata not in the plan fall out via the CASE's NULL branch.
    """
    docs = load_table(spark, sf_dir, "documents")
    strata = iter(_STRATA_THRESHOLDS.items())
    lang, thr = next(strata)
    threshold = F.when(F.col("lang") == lang, F.lit(thr))
    for lang, thr in strata:
        threshold = threshold.when(F.col("lang") == lang, F.lit(thr))
    return docs.filter(
        F.md5(F.col("doc_id").cast("string")) < threshold
    ).select("doc_id", "lang", "source")


@register(
    "q_corpus_manifest",
    oracle="""
    WITH per AS (
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs FROM per)
    SELECT source, lang, n_docs, total_tokens, total_chars,
           CAST(n_docs AS DOUBLE) / (SELECT all_docs FROM tot) AS doc_share
    FROM per
    """,
    tags=("corpus", "manifest", "accounting"),
)
def q_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus manifest: per (source, lang) document/token/char totals and
    each cell's share of the corpus — the accounting table a dataset card
    or mixing plan is written from.

    Scale: one groupBy with map-side partials; the corpus-wide total joins
    back as a broadcast single-row aggregate (no unpartitioned window).
    Integer-over-integer share → one IEEE divide, oracle-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot = per.agg(F.sum("n_docs").alias("all_docs"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        "total_chars",
        (F.col("n_docs").cast("double") / F.col("all_docs")).alias("doc_share"),
    )


# Mixing weights: epochs per source bucket. Fractional parts become a
# deterministic md5-threshold lottery (the q_train_test_split idiom), so
# both engines pick the SAME extra-epoch docs and the result is fully
# oracle-checked — and stable under resharding.
MIX_WEIGHTS = {"src0": 2.0, "src1": 1.5, "src2": 0.5}  # others default 1.0
_MIX_CASE_W = " ".join(
    f"WHEN '{s}' THEN {int(w)}" for s, w in MIX_WEIGHTS.items()
)
_MIX_CASE_T = " ".join(
    f"WHEN '{s}' THEN '{format(int((w - int(w)) * 16**32), '032x')}'"
    for s, w in MIX_WEIGHTS.items()
)


@register(
    "q_corpus_mix",
    oracle=f"""
    SELECT doc_id, source,
           CAST(CASE source {_MIX_CASE_W} ELSE 1 END
                + CASE WHEN md5(CAST(doc_id AS VARCHAR))
                            < CASE source {_MIX_CASE_T} ELSE '0' END
                       THEN 1 ELSE 0 END AS BIGINT) AS n_epochs
    FROM documents
    """,
    tags=("corpus", "mixing", "sampling"),
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: per-document epoch multiplicity from per-source
    weights (up-sample src0 2x, src1 1.5x, down-sample src2 0.5x). A
    weight's integer part repeats every doc; the fractional part promotes a
    deterministic md5-selected subset — so a 1.5x source repeats half its
    docs twice, the SAME half on every engine, run, and shard layout.

    Downstream, the training pipeline explodes by n_epochs (or filters
    n_epochs = 0 for down-sampled-away docs at weights < 1).

    Scale: pure map-side expression — no shuffle at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    whole = F.lit(1)
    thresh = F.lit("0")
    for s, w in MIX_WEIGHTS.items():
        whole = F.when(F.col("source") == s, F.lit(int(w))).otherwise(whole)
        frac_t = format(int((w - int(w)) * 16**32), "032x")
        thresh = F.when(F.col("source") == s, F.lit(frac_t)).otherwise(thresh)
    extra = F.when(F.md5(F.col("doc_id").cast("string")) < thresh, 1).otherwise(0)
    return docs.select(
        "doc_id", "source", (whole + extra).cast("long").alias("n_epochs")
    )


# --- Temperature-weighted source sampling ------------------------------------
# The data-mix primitive (T5 / Pile style): sample each source at a rate
# rising sub-linearly with its size so big sources stop dominating —
# rate_i = min(1, TEMP_C / sqrt(n_i)) is tau=0.5 temperature sampling with
# the normalizer folded into a constant (as production mixes do: rates are
# fixed per source ahead of the run). sqrt and divide are correctly-rounded
# IEEE in both engines and each rate depends only on that source's count
# (no cross-source float SUM whose accumulation order could differ), so the
# whole operator is oracle-exact.
TEMP_C = 2.0
_HEX6_TERMS = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
    f" * {16 ** (5 - i)}"
    for i in range(6)
)


@register(
    "q_temperature_sample",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, source, CAST({_HEX6_TERMS} AS BIGINT) AS hv
        FROM documents
    ),
    rates AS (
        SELECT source, COUNT(*) AS n_docs,
               least(1.0, {TEMP_C} / sqrt(COUNT(*))) AS sample_rate
        FROM documents GROUP BY source
    )
    SELECT r.source, r.n_docs, r.sample_rate,
           CAST(COALESCE(SUM(CASE WHEN h.hv < r.sample_rate * 16777216.0
                                  THEN 1 END), 0) AS BIGINT) AS n_sampled
    FROM rates r JOIN hashed h ON h.source = r.source
    GROUP BY r.source, r.n_docs, r.sample_rate
    """,
    tags=("corpus", "sampling", "mixing"),
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (tau=0.5) source sampling, fully deterministic: each doc
    draws a uniform from the first 6 md5-hex chars of its id (the
    q_train_test_split hashing family — reproducible on any engine,
    stable under reruns and resharding) and survives iff u < its source's
    rate. The compared output is the per-source accounting (doc counts,
    rate, sampled count); the kept rows themselves are the same filter
    without the final rollup.

    Scale: one groupBy(source) for rates (S rows, broadcast back), one
    map-side hash + filter over the corpus — no shuffle of the documents
    at all when the rollup is dropped. Deterministic hashing means
    resampling after corpus growth keeps previously-kept docs kept
    (rate monotonicity aside), the property epoch-mix pipelines rely on.
    """
    docs = load_table(spark, sf_dir, "documents")
    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    rates = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.least(F.lit(1.0), F.lit(TEMP_C) / F.sqrt(F.count(F.lit(1)))).alias(
            "sample_rate"
        ),
    )
    hashed = docs.select("source", hv.alias("hv"))
    return (
        hashed.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "sample_rate")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("hv") < F.col("sample_rate") * 16777216.0, 1)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_sampled")
        )
    )


# --- Token-budget prefix sampling -------------------------------------------
# "Give me a deterministic ~N-char subset of the corpus" — the operation
# behind fixed-budget training runs, scaling-law subsets, and eval pools.
# Docs are ordered by md5(doc_id) (an arbitrary-but-stable shuffle of the
# corpus, the q_train_test_split convention) and the prefix is cut where
# the running char total reaches the budget.
TOKEN_BUDGET = 200_000  # chars; ~1/3 of sf0.01, ~3% of sf0.1 — non-vacuous at both


@register(
    "q_token_budget_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM t
    )
    SELECT doc_id, n_chars,
           CAST(cum_before + n_chars AS BIGINT) AS cum_chars
    FROM c WHERE cum_before < {TOKEN_BUDGET}
    """,
    tags=("corpus", "sample", "budget"),
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic char-budget prefix of the md5-shuffled corpus:
    every doc whose preceding cumulative n_chars is under TOKEN_BUDGET
    (so the selection always OVERSHOOTS the budget by at most one doc, and
    re-running on a re-sharded or appended corpus keeps previously-selected
    docs selected as long as their hash prefix position is unchanged).

    Scale: the oracle's single global window is a one-task sort at corpus
    scale; this plan computes the SAME cumulative sum hierarchically (the
    q_vocabulary pattern): band = first 2 hex chars of the hash (256
    ordered buckets), band totals -> band offsets via a broadcast
    theta-join over 256 rows, within-band running sum via a PARTITIONED
    window. No stage moves the corpus to one task; output rows =
    budget-bounded, tiny. Fixed-length prefix banding preserves the global
    hash order across bands, so the hierarchical cumsum is bit-identical
    to the oracle's flat one.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    c = hierarchical_cumsum(t, weight="n_chars")
    return c.filter(F.col("cum_before") < TOKEN_BUDGET).select(
        "doc_id",
        "n_chars",
        (F.col("cum_before") + F.col("n_chars")).cast("long").alias("cum_chars"),
    )


def hierarchical_cumsum(t: DataFrame, weight: str) -> DataFrame:
    """Running total of ``weight`` in global ``h`` (md5 hex) order, computed
    hierarchically so no stage is a one-task global sort: band = first 2
    hex chars (256 ordered buckets), band totals -> offsets via one window
    over the 256-row totals table, within-band prefix sum via a PARTITIONED
    window. Fixed-length prefix banding preserves global hash order across
    bands, so the result is bit-identical to a flat global window.

    Input: (doc_id, <weight>, h). Output: input columns + ``cum_before``
    (sum of all strictly-preceding weights). Shared by the char- and
    BPE-token-budget samplers (operators/subword.py).
    """
    t = t.withColumn("band", F.substring("h", 1, 2))
    band_totals = t.groupBy("band").agg(F.sum(weight).alias("tot"))
    band_offsets = banded_prefix_offsets(
        band_totals, [F.asc("band")], "tot", "band_offset"
    )
    w = (
        Window.partitionBy("band")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return t.join(F.broadcast(band_offsets), "band").select(
        "doc_id",
        weight,
        (
            F.col("band_offset") + F.coalesce(F.sum(weight).over(w), F.lit(0))
        ).alias("cum_before"),
    )


# --- Percentile-calibrated quality pruning -----------------------------------
PRUNE_PCT = 0.25  # drop the bottom quartile per source

# Integer ppm quality score — one definition, two renders (Spark column /
# DuckDB SQL), shared with q_corpus_release (operators/release.py).
QUALITY_PPM_SQL = """CAST(floor(1000000.0
                 * least(len(string_split(text, ' ')) / 60.0, 1.0)
                 * least(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                           / len(string_split(text, ' ')), 1.0)) AS BIGINT)"""


def quality_ppm_expr():
    """length-sweet-spot x lexical-diversity, floored to integer ppm (see
    q_quality_prune's exactness note)."""
    toks = F.split("text", " ")
    return F.floor(
        F.lit(1000000.0)
        * F.least(F.size(toks) / 60.0, F.lit(1.0))
        * F.least(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), F.lit(1.0))
    )


@register(
    "q_quality_prune",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, n_chars,
               {QUALITY_PPM_SQL} AS quality
        FROM documents
    ),
    thresholds AS (
        SELECT source, quantile_cont(quality, {PRUNE_PCT}) AS q_threshold
        FROM scored GROUP BY source
    )
    SELECT s.source,
           t.q_threshold,
           COUNT(*) FILTER (WHERE s.quality >= t.q_threshold) AS n_kept,
           COUNT(*) FILTER (WHERE s.quality < t.q_threshold) AS n_dropped,
           CAST(SUM(s.n_chars) FILTER (WHERE s.quality >= t.q_threshold) AS BIGINT)
             AS kept_chars
    FROM scored s JOIN thresholds t USING (source)
    GROUP BY s.source, t.q_threshold
    """,
    tags=("corpus", "quality", "prune", "percentile"),
)
def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-calibrated quality pruning: per SOURCE, compute the
    bottom-quartile quality threshold (exact continuous percentile —
    Spark `percentile` ⇔ DuckDB `quantile_cont`, both sort-and-interpolate)
    and report kept/dropped counts and surviving char volume. The
    per-domain-threshold formulation is how real pipelines prune: a single
    global cutoff would empty low-scoring domains entirely instead of
    trimming each domain's own tail.

    Scale: score is a narrow expression; the threshold table is one
    groupBy(source) (small — one row per source) broadcast back; the final
    counts are one more groupBy(source). Exact percentiles sort per
    source-group — at 100 TB swap percentile → approx_percentile
    (t-digest) and drop oracle exactness consciously (q_percentiles note).

    Exactness (ADVICE r6): quality is floored to an INTEGER ppm score so
    the p=0.25 quantile interpolation is exact dyadic arithmetic — with
    integer lo/hi and an exact 2-bit fraction (0.25·(n-1) positions), every
    interpolation formula (lo+(hi-lo)·f, lo·(1-f)+hi·f) yields the same
    exactly-representable double in Spark and DuckDB, so a boundary doc can
    never flip n_kept/n_dropped by a last-ulp difference.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "source", "n_chars", quality_ppm_expr().alias("quality"))
    thresholds = scored.groupBy("source").agg(
        F.expr(f"percentile(quality, {PRUNE_PCT})").alias("q_threshold")
    )
    keep = F.col("quality") >= F.col("q_threshold")
    return (
        scored.join(F.broadcast(thresholds), "source")
        .groupBy("source", "q_threshold")
        .agg(
            F.count(F.when(keep, 1)).alias("n_kept"),
            F.count(F.when(~keep, 1)).alias("n_dropped"),
            F.sum(F.when(keep, F.col("n_chars"))).cast("long").alias("kept_chars"),
        )
    )


# --- Corpus datasheet --------------------------------------------------------


@register(
    "q_corpus_datasheet",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, lang, n_chars, md5(text) AS h,
               len(string_split(text, ' ')) AS n_toks,
               {QUALITY_PPM_SQL} AS quality
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_toks) AS BIGINT) AS total_ws_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dup_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           quantile_cont(quality, 0.25) AS quality_p25,
           quantile_cont(quality, 0.5) AS quality_p50,
           quantile_cont(quality, 0.75) AS quality_p75,
           CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS avg_doc_tokens
    FROM scored GROUP BY source
    """,
    tags=("corpus", "datasheet", "stats", "quality"),
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATASHEET: one row per source with the accounting a
    "Datasheets for Datasets"-style release doc carries — volume (docs,
    chars, whitespace tokens), exact-duplicate mass, language spread, and
    the quality quartiles (integer-ppm score, so quantile interpolation is
    exactly dyadic — the q_quality_prune exactness argument). The
    at-a-glance table a data lead reads before signing off a release.

    Scale: one scan, narrow expressions, one groupBy(source) with
    map-side partials (COUNT DISTINCT expands two-phase); output rows =
    source cardinality.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    scored = docs.select(
        "source",
        "lang",
        "n_chars",
        F.md5("text").alias("h"),
        F.size(toks).alias("n_toks"),
        quality_ppm_expr().alias("quality"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_toks").cast("long").alias("total_ws_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("long").alias("n_exact_dup_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.expr("percentile(quality, 0.25)").alias("quality_p25"),
        F.expr("percentile(quality, 0.5)").alias("quality_p50"),
        F.expr("percentile(quality, 0.75)").alias("quality_p75"),
        (F.sum("n_toks").cast("double") / F.count(F.lit(1))).alias("avg_doc_tokens"),
    )


# --- Vocabulary coverage curve -------------------------------------------------

VOCAB_COVERAGE_KS = (10, 100, 1000)


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH counts AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS n_types FROM counts)
    SELECT k,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(covered AS BIGINT) AS covered_tokens,
           CAST(floor(1000000.0 * (CAST(covered AS DOUBLE) / CAST(total AS DOUBLE)))
                AS BIGINT) AS coverage_ppm
    FROM (
        {" UNION ALL ".join(
            f'''SELECT {k} AS k,
                   (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) FROM
                      (SELECT c FROM counts ORDER BY c DESC, tok LIMIT {k}) top{k})
                   AS covered'''
            for k in VOCAB_COVERAGE_KS
        )}
    ) legs CROSS JOIN tot
    """,
    tags=("corpus", "vocabulary", "coverage", "tokenizer"),
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocab size k, the
    share of total token mass covered by the k most frequent types
    (integer ppm — exact) plus the corpus type count. The tokenizer-budget
    accounting every vocab/BPE size decision starts from: coverage_ppm at
    k=1000 near 1e6 means a small vocabulary suffices; a shallow curve
    means long-tail types carry real mass.

    Scale: ONE vocabulary-sized groupBy(token); each k-leg is a top-k over
    that table (TakeOrderedAndProject) reduced to one scalar row — no
    corpus-sized window, no global sort; the legs and the totals row are
    single-row broadcasts unioned at the end.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # feeds |Ks|+1 branches (one per leg + totals); KB-scale
    )
    tot = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    legs = None
    for k in VOCAB_COVERAGE_KS:
        leg = (
            counts.orderBy(F.desc("c"), F.asc("tok"))
            .limit(k)
            .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("covered"))
            .select(F.lit(k).alias("k"), "covered")
        )
        legs = leg if legs is None else legs.unionByName(leg)
    return legs.crossJoin(F.broadcast(tot)).select(
        "k",
        "n_types",
        F.col("covered").alias("covered_tokens"),
        F.floor(
            F.lit(1000000.0) * (F.col("covered").cast("double") / F.col("total").cast("double"))
        )
        .cast("long")
        .alias("coverage_ppm"),
    )
