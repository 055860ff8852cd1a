"""Skew-mitigation operators for hot-key joins and aggregations.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
whose skew is visible at runtime; these operators are the *explicit* forms
for when the skew is known (a handful of hot keys owning a large share of a
100 TB fact table) or when the engine must control placement itself.

Salting is the textbook construction: shard the big side's hot keys into
``salt`` sub-keys, replicate the small(er) side across all shards, join on
(key, shard), then drop the shard. Results are exactly those of the plain
join — verified by the ``j8_salted_join`` oracle query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _row_salt(df: DataFrame, salt: int) -> Column:
    """Deterministic per-row shard in [0, salt): hash over the whole row.
    Deterministic (unlike F.rand) so task retries and oracle comparisons
    see the same placement; same-valued rows sharing a shard is acceptable
    — the goal is spreading a hot KEY, whose rows differ elsewhere."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``big``'s join keys are skewed: big rows get a
    deterministic shard, ``small`` is replicated once per shard (a
    ``salt``-times blowup of the SMALL side only), and the join key becomes
    (keys..., shard) — one hot key now lands on ``salt`` reducers instead
    of one.

    Equivalent to ``big.join(small, on, how)`` for how in
    {inner, left, left_outer}: every (key, shard) big row finds exactly the
    same matches, and unmatched left rows still null-extend.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn(SALT_COL, _row_salt(big, salt))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_big.join(salted_small, [*on, SALT_COL], how).drop(SALT_COL)


def skew_count_distinct(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """COUNT(DISTINCT value) per key for skewed keys, as the two-shuffle
    rewrite: dedup on (keys, value) first — the dedup shuffle spreads by
    (keys, value), so a hot key's distinct values fan across reducers —
    then count per key. Spark's built-in countDistinct expand can hot-spot
    a single reducer with every row of a hot key."""
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(value).alias(f"n_distinct_{value}"))
    )
