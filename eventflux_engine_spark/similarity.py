"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- **brute-force cosine top-k** (the correctness baseline): JVM-side
  ``zip_with``/``aggregate`` expressions — no Python, whole-stage codegen —
  over an equi- or cross-join. Exact, O(N·Q).
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures turn
  the cross join into an equi-join on the bucket id. Hyperplanes are
  deterministic literals (seeded), shared verbatim with the SQL oracle.
- **numpy batch kNN** (:func:`knn_batch_pandas`): Arrow-batched
  ``mapInPandas`` matmul against a broadcast query matrix — the
  high-throughput variant used by the bench (vectorized, no per-row Python).

Embedding near-dup augmentation mirrors ``dedup.augmented_documents``:
the driver's embeddings are near-orthogonal (max pairwise cosine ≈ 0.51), so
near-dup queries operate on a corpus augmented with deterministic
perturbations (relative ±5%·sin(i) per component → cosine ≈ 0.999).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HYPERPLANES = 8
DIM = 64

__all__ = [
    "dot",
    "norm",
    "cosine",
    "augmented_embeddings",
    "AUG_EMBEDDINGS_CTE",
    "brute_force_topk",
    "hyperplanes",
    "lsh_bucket",
    "lsh_bucket_sql",
    "qlsh_bucket",
    "qlsh_bucket_sql",
    "embedding_near_dup_lsh",
    "knn_batch_pandas",
]


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- quantized cosine: bit-identical across engines --------------------------
# Floating-point fold order differs between Spark's aggregate() and DuckDB's
# list_cosine_similarity, so raw cosines can disagree in the last ulp and
# flip a round(,4) at a boundary — fatal for the driver's value-hash compare.
# Quantizing components to integers (floor(x·10⁴)) makes the dot product
# EXACT (bigint) and the remaining sqrt/divide are IEEE correctly-rounded on
# identical inputs → identical doubles in both engines.

Q_SCALE = 10_000


def _quant(x: Column) -> Column:
    return F.floor(x.cast("double") * Q_SCALE).cast("bigint")


def qdot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _quant(x) * _quant(y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def qcosine(a: Column, b: Column) -> Column:
    return qdot(a, b).cast("double") / (
        F.sqrt(qdot(a, a).cast("double")) * F.sqrt(qdot(b, b).cast("double"))
    )


def qdot_sql(a: str, b: str) -> str:
    q = f"cast(floor(cast({{v}}[i] AS DOUBLE) * {Q_SCALE}) AS BIGINT)"
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {q.format(v=a)} * {q.format(v=b)}))"
    )


def qcosine_sql(a: str, b: str) -> str:
    return (
        f"(cast({qdot_sql(a, b)} AS DOUBLE) / "
        f"(sqrt(cast({qdot_sql(a, a)} AS DOUBLE)) * "
        f"sqrt(cast({qdot_sql(b, b)} AS DOUBLE))))"
    )


# -- deterministic near-dup augmentation --------------------------------------

# perturbation factors are exact rational arithmetic on the 1-based
# component index ((i%7)-3 ∈ [-3,3] → factor 0.85..1.15) — no libm calls, so
# Spark and DuckDB produce identical float components. Resulting cosine with
# the original ≈ 0.995 (>0.99 threshold); unrelated pairs max ≈ 0.51.
AUG_EMBEDDINGS_CTE = """
embeddings_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding,
           (x, i) -> cast(cast(x AS DOUBLE) * (1 + 0.05 * ((i % 7) - 3)) AS FLOAT)
         ) AS embedding
  FROM embeddings WHERE vec_id % 3 = 0
)
"""


def augmented_embeddings(emb: DataFrame) -> DataFrame:
    base = emb.select("vec_id", "embedding")
    pert = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            # Spark's lambda index is 0-based, DuckDB's 1-based → i+1
            lambda x, i: (
                x.cast("double") * (1 + 0.05 * (((i + 1) % 7) - 3))
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.unionByName(pert)


# -- brute force ---------------------------------------------------------------

def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int, exclude_self: bool = True
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Plan: broadcast the (small) query side, stream the corpus through a
    single pass — one broadcast-nested-loop with codegen'd dot products, then
    a per-query top-k (row_number over cosine desc). At cluster scale the
    corpus side stays partitioned; no corpus shuffle happens.
    """
    # norms precomputed per side: cosine() inlined per pair would recompute
    # each vector's self-norm once per comparison; the quotient tree below
    # (dot / (norm_a * norm_b)) is IEEE-identical to cosine()
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    ).withColumn("q_norm", norm(F.col("q_emb")))
    c = corpus.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")
    ).withColumn("n_norm", norm(F.col("n_emb")))
    joined = F.broadcast(q).crossJoin(c)
    if exclude_self:
        joined = joined.filter(F.col("q_id") != F.col("n_id"))
    scored = joined.select(
        "q_id",
        "n_id",
        F.round(
            dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")),
            4,
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )


# -- LSH (random hyperplane) ----------------------------------------------------

def hyperplanes(n: int = N_HYPERPLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded, engine-agnostic
    literals — the plane components are Python-computed constants inlined
    into both engines, so any stable generator qualifies).

    Per-plane seeded gaussians (PCG64, seed 1000003+j) so plane j is
    independent of how many planes a caller asks for. The previous
    ``sin(1 + j*dim + d)`` sequence was PAIRWISE CORRELATED across planes
    (corr(sin(x), sin(x + dim)) = cos(dim mod 2pi) ~ -0.86 at dim=64 →
    component correlation ~-0.43): correlated sign bits collapse most of
    the corpus into a few buckets per band, which is why widening bands
    never reduced candidate volume (36.5M pairs where balanced buckets
    give ~1.4M at sf1.0) — the skew was in the PLANES, not the data."""
    out = []
    for j in range(n):
        rng = np.random.default_rng(1000003 + j)
        out.append([float(v) for v in rng.standard_normal(dim)])
    return out


def lsh_bucket(emb_col: Column, n: int = N_HYPERPLANES, dim: int = DIM) -> Column:
    """Bucket id = sign bits of the dot products with the hyperplanes."""
    planes = hyperplanes(n, dim)
    bucket = None
    for j, plane in enumerate(planes):
        d = dot(emb_col, F.array(*[F.lit(v) for v in plane]))
        bit = F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return bucket.cast("int")


def lsh_bucket_sql(emb_sql: str, n: int = N_HYPERPLANES, dim: int = DIM) -> str:
    planes = hyperplanes(n, dim)
    terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(v) for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({emb_sql}, {arr}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "cast(" + " + ".join(terms) + " AS INTEGER)"


# -- quantized LSH: bit-identical bucket bits across engines -------------------
# The float lsh_bucket above folds doubles in engine-specific order; a dot
# product that lands near 0 could sign-flip between Spark and DuckDB. For
# ORACLE-GATED bucketing we quantize both the embedding components and the
# hyperplane components to integers (floor(x·10⁴)) — the per-plane dot is an
# exact bigint in both engines, so the sign bits (and hence every bucket id)
# are guaranteed identical.


def _qplane(plane: list[float]) -> list[int]:
    return [int(math.floor(v * Q_SCALE)) for v in plane]


def qlsh_bucket(
    emb_col: Column, plane_ids: tuple[int, ...], dim: int = DIM
) -> Column:
    """Bucket id from the given hyperplane subset (a band), via exact
    integer dot products."""
    planes = hyperplanes(max(plane_ids) + 1, dim)
    bucket = F.lit(0)
    for k, j in enumerate(plane_ids):
        arr = F.array(*[F.lit(v).cast("bigint") for v in _qplane(planes[j])])
        d = F.aggregate(
            F.zip_with(emb_col, arr, lambda x, p: _quant(x) * p),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return bucket.cast("int")


def qlsh_bucket_sql(
    emb_sql: str, plane_ids: tuple[int, ...], dim: int = DIM
) -> str:
    planes = hyperplanes(max(plane_ids) + 1, dim)
    terms = []
    for k, j in enumerate(plane_ids):
        arr = "[" + ", ".join(str(v) for v in _qplane(planes[j])) + "]"
        dot = (
            f"list_sum(list_transform(generate_series(1, len({emb_sql})), "
            f"i -> cast(floor(cast({emb_sql}[i] AS DOUBLE) * {Q_SCALE}) AS BIGINT)"
            f" * ({arr})[i]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << k} ELSE 0 END)")
    return "cast(" + " + ".join(terms) + " AS INTEGER)"


# 2 bands × 4 planes (16 buckets/band). Band-width tradeoff measured at
# sf0.1 (2.7k vectors, 661 true pairs): this synthetic corpus is heavily
# CORRELATED, so widening to 3 bands × 8 planes (256 buckets/band) only cut
# candidates 782k → 349k — bucket skew, not bucket count, governs candidate
# volume here — while theoretical recall fell 0.97 → ~0.90 (observed 661 →
# 628 pairs). The production knobs for skew remain `max_bucket`-style caps
# + exact dedup upstream (see dedup.lsh_candidate_pairs); band width buys
# little against correlated mass.
NEAR_DUP_BANDS: tuple[tuple[int, ...], ...] = ((0, 1, 2, 3), (4, 5, 6, 7))

# Scale path: 16 buckets/band is right for thousands of vectors but goes
# quadratic when the corpus grows (measured: 10x rows -> 33x wall at sf1.0,
# ~44M candidate pairs from ~1.7k-vector buckets). Banding must widen with
# corpus size: 4 bands x 10 planes = 1024 buckets/band keeps per-bucket
# mass ~n/1024 (sf1.0: ~1.4M candidates, was ~44M) while recall at
# cos>=0.99 IMPROVES (1-(1-p^10)^4 = 0.981 vs 1-(1-p^4)^2 = 0.972 at
# p=0.955). The layout switches on the corpus COUNT (deterministic from
# the data, mirrored by a count-gated union in the oracle SQL) so every
# sf stays value-gated.
NEAR_DUP_BANDS_WIDE: tuple[tuple[int, ...], ...] = (
    tuple(range(0, 10)), tuple(range(10, 20)),
    tuple(range(20, 30)), tuple(range(30, 40)),
)
NEAR_DUP_ADAPT_N = 10_000


def near_dup_bands_for(n: int) -> tuple[tuple[int, ...], ...]:
    return NEAR_DUP_BANDS if n < NEAR_DUP_ADAPT_N else NEAR_DUP_BANDS_WIDE


def quantize_with_norm(
    df: DataFrame,
    emb_col: str = "embedding",
    id_cols: tuple = ("vec_id",),
    q_col: str = "qe",
    n_col: str = "qn",
) -> DataFrame:
    """Quantize an embedding column ONCE and attach its norm.

    qcosine(a, b) inlined per pair re-quantizes both arrays and recomputes
    both self-norms for every comparison (3 O(dim) folds + 2 quantizations
    per pair). Precomputing (quantized array, norm) per vector leaves ONE
    dot fold per pair; ``qcosine_pre`` reproduces qcosine's exact IEEE
    expression tree, so gated values are bit-identical."""
    qarr = F.transform(F.col(emb_col), lambda x: _quant(x))
    out = df.select(*id_cols, qarr.alias(q_col))
    return out.withColumn(
        n_col, F.sqrt(_qdot_arrays(F.col(q_col), F.col(q_col)).cast("double"))
    )


def qcosine_pre(qa: Column, qb: Column, na: Column, nb: Column) -> Column:
    """qcosine over pre-quantized arrays and pre-computed norms — the same
    dot/(sqrt*sqrt) tree as :func:`qcosine`, evaluated with one fold."""
    return _qdot_arrays(qa, qb).cast("double") / (na * nb)


def _qdot_arrays(qa: Column, qb: Column) -> Column:
    """Exact bigint dot over already-quantized bigint arrays."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.99,
    bands: tuple[tuple[int, ...], ...] | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane LSH — the 100 TB
    plan: candidate generation is an EQUI-join on (band, bucket) (never a
    cartesian); exact quantized cosine verifies only the candidates.

    Two 4-plane bands: a pair is a candidate if it agrees on either band —
    recall ≈ 1-(1-p⁴)² (~0.99 at cos 0.995) while each band keeps buckets
    small.

    Cost shape: each vector is quantized and normed ONCE up front; candidate
    pairs are DEDUPED across bands before verification, so the expensive
    64-element dot fold runs exactly once per unique candidate pair (the
    standard candidates→verify join of a production dedup pipeline).

    ``bands=None`` (default) picks the layout from the corpus size
    (:func:`near_dup_bands_for`): narrow 2x4 below
    ``NEAR_DUP_ADAPT_N`` vectors, wide 3x8 above — per-bucket mass stays
    bounded as the corpus grows, recall ~unchanged at the 0.99 threshold.
    """
    if bands is None:
        bands = near_dup_bands_for(emb.count())
    dim = len(hyperplanes(1)[0])
    qarr = F.transform(
        F.col("embedding"), lambda x: _quant(x)
    )
    base = emb.select("vec_id", qarr.alias("qe")).withColumn(
        "qnorm", F.sqrt(_qdot_arrays(F.col("qe"), F.col("qe")).cast("double"))
    )
    planes = hyperplanes(max(max(b) for b in bands) + 1, dim)
    # all band buckets in ONE pass over the quantized vectors, exploded from
    # an array of (band, bkey) structs — a union of per-band selects would
    # re-quantize and re-scan the embeddings once per band in the executed
    # plan (no general subplan reuse in Spark)
    entries = []
    for bi, plane_ids in enumerate(bands):
        bucket = F.lit(0)
        for k, j in enumerate(plane_ids):
            arr = F.array(*[F.lit(v).cast("bigint") for v in _qplane(planes[j])])
            d = _qdot_arrays(F.col("qe"), arr)
            bucket = bucket + F.when(d > 0, F.lit(1 << k)).otherwise(F.lit(0))
        entries.append(
            F.struct(F.lit(bi).alias("band"), bucket.cast("int").alias("bkey"))
        )
    banded = base.select(
        "vec_id", F.explode(F.array(*entries)).alias("__bb")
    ).select(
        F.col("__bb.band").alias("band"), F.col("__bb.bkey").alias("bkey"), "vec_id"
    )
    a = banded.select("band", "bkey", F.col("vec_id").alias("vec_a"))
    b = banded.select("band", "bkey", F.col("vec_id").alias("vec_b"))
    pairs = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    pa = base.select(
        F.col("vec_id").alias("vec_a"), F.col("qe").alias("qa"),
        F.col("qnorm").alias("na"),
    )
    pb = base.select(
        F.col("vec_id").alias("vec_b"), F.col("qe").alias("qb"),
        F.col("qnorm").alias("nb"),
    )
    scored = pairs.join(pa, "vec_a").join(pb, "vec_b").withColumn(
        "cos_raw",
        _qdot_arrays(F.col("qa"), F.col("qb")).cast("double")
        / (F.col("na") * F.col("nb")),
    )
    return (
        scored.filter(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
    )


def embedding_near_dup_lsh_sql(
    emb_cte: str = "embeddings_aug",
    threshold: float = 0.99,
    bands: tuple[tuple[int, ...], ...] | None = None,
) -> str:
    """DuckDB twin of :func:`embedding_near_dup_lsh` (same bands, same
    quantized buckets, same quantized cosine). ``bands=None`` mirrors the
    size-adaptive layout with a count-gated union: both layouts are in the
    SQL, a scalar-subquery predicate on count(*) activates exactly one —
    so ONE static oracle string stays value-exact at every sf."""
    if bands is not None:
        selects = [
            f"SELECT {bi} AS band, {qlsh_bucket_sql('embedding', plane_ids)} AS bkey,"
            f" vec_id, embedding FROM {emb_cte}"
            for bi, plane_ids in enumerate(bands)
        ]
    else:
        guard_narrow = (
            f"(SELECT count(*) FROM {emb_cte}) < {NEAR_DUP_ADAPT_N}"
        )
        guard_wide = (
            f"(SELECT count(*) FROM {emb_cte}) >= {NEAR_DUP_ADAPT_N}"
        )
        selects = [
            f"SELECT {bi} AS band, {qlsh_bucket_sql('embedding', plane_ids)} AS bkey,"
            f" vec_id, embedding FROM {emb_cte} WHERE {guard_narrow}"
            for bi, plane_ids in enumerate(NEAR_DUP_BANDS)
        ] + [
            f"SELECT {bi} AS band, {qlsh_bucket_sql('embedding', plane_ids)} AS bkey,"
            f" vec_id, embedding FROM {emb_cte} WHERE {guard_wide}"
            for bi, plane_ids in enumerate(NEAR_DUP_BANDS_WIDE)
        ]
    banded = "\nUNION ALL\n".join(selects)
    qcos = qcosine_sql("a.embedding", "b.embedding")
    return f"""
    , banded AS (
      {banded}
    )
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({qcos}, 4) AS cos_sim
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
    WHERE {qcos} >= {threshold}
    """


# -- Arrow-batched numpy kNN (bench hot path) -----------------------------------

def knn_batch_pandas(
    corpus: DataFrame, query_matrix: np.ndarray, query_ids: np.ndarray, k: int
) -> DataFrame:
    """Top-k per query via per-partition numpy matmul.

    The query matrix ships to executors once (task closure ~ broadcast);
    each Arrow batch of corpus vectors is scored with one BLAS matmul.
    Output: per (query, partition) local top-k — caller finishes with a
    global top-k per query (cheap: partitions × k rows).
    """
    qn = query_matrix / np.linalg.norm(query_matrix, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = qn @ Mn.T  # (Q, B)
            kk = min(k, S.shape[1])
            top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows = {
                "q_id": np.repeat(query_ids, kk),
                "n_id": pdf["vec_id"].to_numpy()[top].ravel(),
                "cos_sim": np.take_along_axis(S, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    return corpus.select("vec_id", "embedding").mapInPandas(
        score, schema="q_id long, n_id long, cos_sim double"
    )


# --- trained IVF codebook: deterministic distributed k-means -----------------
# The fixed codebook (registry_data._ivf_assign) is "IVF-shaped"; a real
# 100 TB pipeline TRAINS centroids. Same loop discipline as
# dedup.dup_clusters: DataFrame aggs only, localCheckpoint per round, the
# driver never holds a matrix — only the k×dim centroid table travels (as a
# broadcast), which is what production IVF training ships to executors too.


def kmeans_codebook(
    emb: DataFrame,
    k: int = 40,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic spherical k-means codebook: (c_id, c_emb) with unit-norm
    double centroids.

    - init: hash-seeded — the k vectors with the smallest md5(id) form the
      seed set (uniform pseudo-random yet fully reproducible; no RNG state).
    - each of the ``iters`` Lloyd rounds is two shuffles: (1) nearest-
      centroid assignment via broadcast crossJoin + argmax-by-agg (map-side
      combine collapses each vector's k scores before the exchange — the
      same no-window shape as `_ivf_assign`), (2) per-dimension mean via
      posexplode + groupBy(c_id, pos) partial sums. Both scale linearly in
      rows; only k×dim bytes broadcast per round.
    - clusters that lose every member keep their previous centroid
      (coalesce on a left join), so the codebook size is stable.
    """
    from pyspark.sql import Window

    # normalize ONCE up front: spherical k-means compares by cosine, and
    # with unit vectors on both sides cosine == dot — the assignment then
    # pays one O(dim) fold per (vector, centroid) instead of three
    raw = emb.select(
        F.col(id_col).alias("__vid"), _as_double(F.col(emb_col)).alias("__r")
    ).withColumn("__n", norm(F.col("__r")))
    v = raw.select(
        "__vid",
        F.transform("__r", lambda x: x / F.col("__n")).alias("__e"),
    )
    seed_w = Window.orderBy("__h")
    cents = (
        v.withColumn("__h", F.md5(F.col("__vid").cast("string")))
        .orderBy("__h")
        .limit(k)
        .withColumn("c_id", F.row_number().over(seed_w) - F.lit(1))
        .select("c_id", F.col("__e").alias("c_emb"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        scored = v.crossJoin(F.broadcast(cents))
        best = F.max(
            F.struct(
                # both sides unit-norm -> cosine == dot (one fold)
                dot(F.col("__e"), F.col("c_emb")).alias("s"),
                (-F.col("c_id")).alias("nc"),
            )
        )
        assign = (
            scored.groupBy("__vid")
            .agg(best.alias("__b"), F.first("__e").alias("__e"))
            .select((-F.col("__b.nc")).alias("c_id"), "__e")
        )
        dims = assign.select(
            "c_id", F.posexplode("__e").alias("pos", "val")
        )
        sums = dims.groupBy("c_id", "pos").agg(
            F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
        )
        new = (
            sums.withColumn("m", F.col("s") / F.col("n"))
            .groupBy("c_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"],
                ).alias("__raw")
            )
            .withColumn("__n", norm(F.col("__raw")))
            .select(
                "c_id",
                F.transform("__raw", lambda x: x / F.col("__n")).alias(
                    "c_new"
                ),
            )
        )
        cents = (
            cents.join(new, "c_id", "left")
            .select(
                "c_id", F.coalesce("c_new", "c_emb").alias("c_emb")
            )
            .localCheckpoint(eager=True)
        )
    return cents
