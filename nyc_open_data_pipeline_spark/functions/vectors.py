"""Vector / embedding functions: cosine similarity and ANN search.

Two execution paths, per the engine's scale policy:

- **JVM expression path** (``dot``, ``cosine``): F.zip_with + F.aggregate —
  codegen'd, no Python, exact left-to-right fold (deterministic).
- **Arrow/NumPy path** (``cosine_topk_pandas``): for the 100 TB shape —
  broadcast the query matrix, one BLAS GEMM per Arrow batch via
  ``mapInPandas``. ~50-100x the throughput of per-row expression eval for
  wide vectors; this is the production ANN scan.

The LSH variant (``hyperplane_bucket``) gives the sub-linear candidate
path: 2^nbits buckets, candidates only within a bucket.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """array<double> literal built with ONE py4j call (an ``F.expr`` string
    the JVM parses) instead of one ``F.lit`` round-trip per component.

    Why this exists (optimization round 13, guide §1.2 "per-task work" —
    here per-QUERY driver work): the multiprobe/ANN family materializes
    R plane sets x nbits planes x dim components as expression literals;
    at 16x16x65 that was ~16k py4j calls, 13.5 s of pure driver-side plan
    construction per invocation (measured), vs 0.4 s for the expr form —
    and the values are identical: repr() is Python's shortest round-trip
    float form, and Spark's CAST(string AS DOUBLE) is correctly-rounded
    strtod, so every component parses back to the same IEEE bits the old
    ``F.lit(float)`` literal carried. Non-finite components fall back to
    the per-component path (repr 'inf'/'nan' would not parse as DOUBLE).
    """
    import math

    vals = [float(x) for x in values]
    if not vals or not all(math.isfinite(x) for x in vals):
        return F.array(*[F.lit(x) for x in vals])
    return F.expr("array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in vals) + ")")


def lit_long_array(values) -> Column:
    """array<bigint> literal in one py4j call (see lit_double_array)."""
    vals = [int(x) for x in values]
    if not vals:
        return F.array(*[F.lit(x).cast("long") for x in vals])
    return F.expr("array(" + ",".join(f"{x}L" for x in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double fold, in order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with precomputed norms: one array fold per pair instead of
    three. In pairwise joins (ANN probe, near-dup blocking) norms are
    per-ROW quantities — compute them once on each side before the join,
    never inside the pair expression."""
    return dot(a, b) / (norm_a * norm_b)


def nbits_for_corpus(
    n_rows: int,
    target_bucket_rows: int = 128,
    min_bits: int = 4,
    max_bits: int = 24,
) -> int:
    """Sign-LSH width sized to the corpus: 2^bits buckets so the EXPECTED
    bucket occupancy n/2^bits stays at ``target_bucket_rows``. A fixed bit
    count is corpus-sized tuning — 6 bits (64 buckets) is right at 10^4
    vectors but quadratic-bucket-join wrong at 10^9; deriving bits from
    cardinality keeps within-bucket pair counts (and the verify join's
    shuffle) bounded as the corpus grows 100x.

    The verify stage compares ~n x B/2 pairs at occupancy B, so B is the
    constant factor on EVERY corpus row — it must be small, not merely
    bounded. Measured at 20k vectors / 64 dims (sf1 headroom run): B=1000
    (5 bits) took 115.7 s, the oracle-pinned 6 bits 59.3 s, B=128 (8 bits)
    13.1 s — 9x apart on the constant factor alone. More bits also means
    lower single-band recall (a near-dup pair must agree on every bit);
    when recall at high width matters, run R independent plane sets and
    union candidates (the d4 MinHash banding construction) rather than
    growing B.
    ``n_rows`` may be an estimate — a KMV/HLL distinct count (sk1) or
    parquet row-count metadata; bucket occupancy only needs the right
    order of magnitude. Clamped to [min_bits, max_bits]: 2^24 buckets is
    enough for 10^9.3 rows at the default target."""
    import math

    if n_rows <= target_bucket_rows:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(n_rows / target_bucket_rows))))


def collision_prob(cos_sim: float) -> float:
    """Per-hyperplane agreement probability for a pair at the given cosine:
    P[sign(h·a) == sign(h·b)] = 1 - theta/pi for a random hyperplane h
    (Goemans-Williamson / Charikar sign-LSH). The design-point input to
    ``probes_for_recall``."""
    import math

    c = max(-1.0, min(1.0, float(cos_sim)))
    return 1.0 - math.acos(c) / math.pi


def probes_for_recall(
    nbits: int,
    threshold: float,
    target: float = 0.5,
    max_sets: int = 64,
) -> int:
    """Number of independent plane sets R so the candidate union reaches
    ``target`` recall for a pair AT the design-point cosine ``threshold``:
    single-set recall is p^nbits (every bit must agree), union recall
    1-(1-p^nbits)^R, so R = ceil(ln(1-target)/ln(1-p^nbits)).

    This closes the loop the width derivation opens: ``nbits_for_corpus``
    grows bits with the corpus to hold bucket occupancy (cost) flat, which
    alone makes single-probe recall decay as p^nbits — the measured
    35.6% -> 9.0% drift between sf0.01 (4 bits) and sf10 (11 bits) in the
    round-5 audit. Deriving R from the same nbits holds DESIGN recall flat
    instead. The price is the standard LSH cost exponent: with occupancy-
    held bits, R ~ (1/p)^nbits = n^rho with rho = log2(1/p). At a
    production near-dup design point (cos >= 0.9, p ~ 0.856) rho ~ 0.22 —
    gently sublinear; at a LOW design point like the synthetic corpus's
    0.3 (p ~ 0.597) rho ~ 0.74 and R explodes with scale, which is not an
    implementation defect but the physics of sign-LSH at low similarity.
    ``max_sets`` caps the blow-up; past the cap the achievable design
    recall is 1-(1-p^nbits)^max_sets and the caller's recall audit (d20)
    reports the shortfall honestly rather than masking it."""
    import math

    per_set = collision_prob(threshold) ** nbits
    if per_set >= 1.0:
        return 1
    if per_set <= 0.0:
        return max_sets
    r = math.ceil(math.log(1.0 - target) / math.log(1.0 - per_set))
    return min(max(r, 1), max_sets)


# Narrow-width radius floor (round 9): at nbits <= 4 the radius-0 ladder
# lands essentially AT the target (union 0.515 at the 0.25/0.3 design
# points) with zero margin, so true neighbors sitting marginally below the
# design cosine pull measured recall under target — s13 measured 0.48 at
# sf0.1 (SCALE.md round 8). One bit-flip ring lifts the design union to
# ~0.69-0.72 at these widths for <= 5 probe masks per set; wider ladders
# already carry margin and keep radius-0's better join efficiency.
NARROW_WIDTH_BITS = 4


def multiprobe_design(
    nbits: int,
    threshold: float,
    target: float = 0.5,
    max_sets: int = 64,
    max_radius: int = 2,
) -> tuple[int, int]:
    """(r_sets, probe_radius) reaching ``target`` design recall within the
    ``max_sets`` cap, escalating BIT-FLIP PROBING only when independent
    sets alone cannot fit.

    Bit-flip probing (Lv et al. 2007 multi-probe LSH, adapted from query-
    time ANN to pair generation) accepts a pair as a candidate when its
    two signatures differ in at most ``radius`` bits of one set, not only
    when they agree exactly: per-set recall grows from p^nbits to
    sum_{j<=q} C(nbits,j) p^(nbits-j) (1-p)^j, so far fewer sets reach
    the same union recall 1-(1-P_q)^R. The point is WHERE each strategy
    pays. Another independent set adds nbits more unrolled dot-product
    expressions to the PLAN — analysis/codegen cost, the reason max_sets
    exists at all — while a bit flip adds only DATA: one XOR'd probe key
    per row, a posexplode away, and the probe side of the join needs no
    new signature computation. Radius stays 0 while the set count fits
    (keeping single-probe's better per-key join efficiency: fresh random
    bits beat correlated flips per unit of candidate volume), so small
    corpora keep the exact construction ``probes_for_recall`` gives.

    At the synthetic corpus's hostile design point (cos 0.3, p ~ 0.597)
    the ladder is: nbits 4 -> (6 sets, q=0), 8 -> (43, q=0),
    11 -> (24, q=1), 14 -> (18, q=2), 16 -> (40, q=2) — every width
    ``nbits_for_corpus`` can produce (max_bits=16) now meets the target
    inside the cap, eliminating the capped-shortfall regime the round-6
    recall audit measured at sf10 (design union 0.198, measured 33.2%).
    Only past ``max_radius`` does the honest fallback remain:
    (max_sets, max_radius) with the shortfall reported by the audit.

    Narrow widths (nbits <= NARROW_WIDTH_BITS) START at radius 1: the
    radius-0 derivation meets the target with zero margin there, and the
    margin is what absorbs neighbors below the design cosine (the s13
    sf0.1 recall-0.48 artifact). Mirrored in plans/llmdata._sql_mp_design."""
    import math

    p = collision_prob(threshold)
    min_radius = 1 if nbits <= NARROW_WIDTH_BITS else 0
    for radius in range(min(min_radius, max_radius), max_radius + 1):
        per_set = sum(
            math.comb(nbits, j) * p ** (nbits - j) * (1.0 - p) ** j
            for j in range(radius + 1)
        )
        if per_set >= 1.0:
            return 1, radius
        if per_set <= 0.0:
            continue
        r = math.ceil(math.log(1.0 - target) / math.log(1.0 - per_set))
        if r <= max_sets:
            return max(r, 1), radius
    return max_sets, max_radius


# Deterministic ±1 hyperplanes (LCG-generated, fixed seed) for sign-LSH.
def hyperplanes(dim: int, nbits: int = 8) -> list[list[float]]:
    state = 0x2545F4914F6CDD1D
    planes = []
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append(1.0 if (state >> 32) & 1 else -1.0)
        planes.append(row)
    return planes


def hyperplane_bucket(
    vec: Column, planes: list[list[float]], expected_dim: int | None = None
) -> Column:
    """Sign-LSH bucket id: bit i = sign(dot(v, plane_i)). Same construction
    is SQL-expressible, so DuckDB oracles can reproduce it exactly.

    ``expected_dim`` guards the zip_with null-collapse hazard: a vector
    whose length differs from the planes' dim would pad the dot product to
    NULL and silently land in bucket 0. With the guard set, such a row
    RAISES (assert_true) instead — callers that derive planes from the
    corpus's measured dim pass it so a mixed-dim corpus fails loudly."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(vec, lit_double_array(p))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    if expected_dim is not None:
        ok = F.assert_true(
            F.size(vec) == F.lit(expected_dim),
            F.concat(
                F.lit(f"sign-LSH dim mismatch: planes expect {expected_dim}, "),
                F.lit("vector has "),
                F.size(vec).cast("string"),
                F.lit(" components"),
            ),
        )
        # assert_true yields NULL on pass (and raises on fail), so this
        # when() always returns `bucket` — it exists to keep the assertion
        # inside the expression tree.
        bucket = F.when(ok.isNull(), bucket)
    return bucket


def cosine_topk_pandas(
    embeddings: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path brute-force ANN: mapInPandas + NumPy GEMM per Arrow batch,
    then a global top-k (TakeOrderedAndProject-style via window).

    The query matrix rides to every task via closure broadcast; per batch of
    B corpus vectors and Q queries the scoring is one (Q x D)·(D x B) GEMM.
    Partial top-k per batch bounds the shuffle to Q*k rows per partition.
    """
    import numpy as np

    spark = embeddings.sparkSession
    if not queries:  # empty query set: no scores by definition
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double, rnk int"
        )
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            scores = (qmat @ mat.T) / (qnorm @ nrm.T)  # Q x B
            ids = pdf[id_col].to_numpy()
            out = []
            kk = min(k + 1, scores.shape[1])
            for qi, qid in enumerate(qids):
                top = np.argpartition(-scores[qi], kk - 1)[:kk]
                for j in top:
                    out.append((qid, int(ids[j]), float(scores[qi, j])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    schema = "query_id long, neighbor_id long, score double"
    scored = embeddings.select(id_col, vec_col).mapInPandas(score_batches, schema=schema)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
