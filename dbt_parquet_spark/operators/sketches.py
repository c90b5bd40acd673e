"""Sketch-accelerated joins — a distributed Bloom filter built entirely from
DataFrame primitives (ROADMAP "approximate joins on sketches").

Spark's own runtime row-level filters inject Bloom filters into shuffle
joins when statistics allow; this module makes the pattern explicit and
composable: build a bitmap from the small side's keys, broadcast it, drop
probe rows that cannot match BEFORE the shuffle, then verify exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table

BLOOM_BITS = 1 << 17  # 131072 bits = 2048 longs ≈ 16 KB broadcast
BLOOM_K = 5
HIGH_VALUE = 400_000.0  # build-side predicate: orders above this price


def _word_sql(key_sql: str, j: int) -> str:
    """SQL for the word index of hash j — xxhash64 with the hash index
    folded in as a second argument, pmod into the bit space, div 64.
    (SQL strings rather than Column algebra because shiftleft/shiftright
    take only literal ints in the python Column API.)"""
    return f"shiftright(pmod(xxhash64({key_sql}, {j}), {BLOOM_BITS}), 6)"


def _mask_sql(key_sql: str, j: int) -> str:
    return (
        f"shiftleft(cast(1 as bigint), "
        f"cast(pmod(xxhash64({key_sql}, {j}), {BLOOM_BITS}) & 63 as int))"
    )


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding the Bloom bitmap as map<word, bits>.

    Build is one narrow explode (k rows per key) + groupBy(word) with
    map-side partial bit_or — at any scale the shuffle is capped at
    BLOOM_BITS/64 rows, and the result is kilobytes: the mergeable-sketch
    property that makes the build side free to broadcast.
    """
    entries = ", ".join(
        f"struct({_word_sql(key_col, j)} AS word, {_mask_sql(key_col, j)} AS mask)"
        for j in range(BLOOM_K)
    )
    exploded = keys.select(F.explode(F.expr(f"array({entries})")).alias("e")).select(
        F.col("e.word").alias("word"), F.col("e.mask").alias("mask")
    )
    words = exploded.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )


def bloom_might_contain(bloom_col: str, key_col: str) -> Column:
    """True iff all k bits for key are set — no false negatives by
    construction; false-positive rate ≈ (1 - e^(-kn/m))^k."""
    return F.expr(
        " AND ".join(
            f"(coalesce(element_at({bloom_col}, {_word_sql(key_col, j)}), "
            f"cast(0 as bigint)) & {_mask_sql(key_col, j)}) != 0"
            for j in range(BLOOM_K)
        )
    )


@register(
    "q_bloom_semi_join",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {HIGH_VALUE}
    )
    GROUP BY l_returnflag
    """,
    tags=("join", "bloom", "sketch", "semi"),
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated semi join: lineitems of high-value orders. The
    build side's keys become a ~16 KB broadcast bitmap; the probe side
    drops non-matching rows at the SCAN (no false negatives), and only the
    survivors — true matches plus the small false-positive tail — reach the
    exact semi join. Result is therefore EXACTLY the semi join (fully
    oracle-checked); the Bloom stage only moves the filtering before the
    shuffle.

    Scale: this is the pattern for a 100 TB probe vs a 10 GB build: the
    bitmap costs one narrow pass over the build side and kilobytes of
    broadcast, and the probe shuffle shrinks by ~the selectivity. Spark's
    runtime row-level filtering does this automatically when stats permit;
    the explicit form works on any boundary (e.g. across materializations).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = orders.filter(F.col("o_totalprice") > HIGH_VALUE).select("o_orderkey")
    bitmap = bloom_bitmap(hi, "o_orderkey")
    candidates = li.crossJoin(F.broadcast(bitmap)).filter(
        bloom_might_contain("bloom", "l_orderkey")
    )
    exact = candidates.join(
        hi.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("total_price"),
    )
