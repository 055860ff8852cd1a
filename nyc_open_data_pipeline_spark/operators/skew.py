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


def hot_keys(
    big: DataFrame,
    on: list[str],
    min_share: float = 0.01,
    max_keys: int = 1000,
) -> list[tuple]:
    """Keys owning more than ``min_share`` of ``big``'s rows, heaviest first,
    capped at ``max_keys`` (the cap keeps the result broadcastable: at most
    1/min_share keys can exceed the share anyway). The count-per-key agg is
    itself skew-safe — map-side partial aggregation collapses a hot key to
    one row per input partition before the shuffle. Deterministic: exact
    counts, fixed threshold."""
    # one shuffle total: per-key counts once (persisted — they're |keys|-sized,
    # not |big|-sized), total derived from them instead of a second full scan
    counts = big.groupBy(*on).count().persist()
    try:
        total = counts.agg(F.sum("count").alias("n")).collect()[0]["n"] or 0
        if total == 0:
            return []
        threshold = max(1, int(total * min_share))
        rows = (
            counts.filter(F.col("count") > threshold)
            .orderBy(F.desc("count"), *on)
            .limit(max_keys)
            .select(*on)
            .collect()
        )
        return [tuple(r) for r in rows]
    finally:
        counts.unpersist()


def hybrid_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    min_share: float = 0.01,
) -> DataFrame:
    """Salt only the keys that are actually hot (> ``min_share`` of big's
    rows); the cold majority takes the plain join. This is the production
    form VERDICT r1 asked for: all-keys salting pays a ``salt``x small-side
    blowup even when nothing is skewed, while the hybrid's blowup is
    ``salt`` x |hot slice of small| — usually a handful of rows.

    With no hot keys (the common case) this IS the plain join: the hot
    branch is an empty union arm that AQE prunes at runtime.
    """
    hot = hot_keys(big, on, min_share=min_share)
    if not hot:
        return big.join(small, on, how)

    if len(on) == 1:
        vals = [k[0] for k in hot]
        is_hot = F.col(on[0]).isin(vals)
    else:
        key_struct = F.struct(*[F.col(c) for c in on])
        is_hot = key_struct.isin([F.struct(*[F.lit(v) for v in k]) for k in hot])

    # NULL join keys make isin() NULL; they belong to the cold branch (they
    # match nothing in an equi-join but must survive a left join).
    is_hot = F.coalesce(is_hot, F.lit(False))
    cold = big.filter(~is_hot).join(small, on, how)
    salted = salted_join(big.filter(is_hot), small.filter(is_hot), on, how, salt)
    return cold.unionByName(salted)


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
