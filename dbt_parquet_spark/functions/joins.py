"""Join utilities for skew — the hand tool for when AQE's automatic skew
splitting isn't enough (e.g. one key is 30% of a 100 TB fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with key salting: the large (skewed) side gets a random
    salt in [0, k); the small side is replicated k× with every salt value;
    the join key becomes (keys…, salt). A hot key's rows now spread over k
    shuffle partitions instead of melting one reducer.

    Result is row-identical to ``large.join(small, on, how)`` (verified in
    tests). Cost: small side inflates k× — keep k modest and the small side
    genuinely small. Supports inner/left joins (where all large rows keep
    exactly their matches)."""
    assert how in ("inner", "left"), "salting preserves semantics for inner/left joins"
    salted_large = large.withColumn(
        "_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    joined = salted_large.join(salted_small, on + ["_salt"], how)
    return joined.drop("_salt")
