"""Similarity search over embedding columns (``array<float>``).

Two paths, per the training-data-pipeline requirement:

- **Brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the corpus, score with pure Column math
  (``F.zip_with`` dot product + precomputed norms), take top-k per query
  with a window. Cost O(|corpus| × |queries|) but embarrassingly
  parallel and shuffle-free until the final tiny top-k aggregation.
- **Hyperplane-LSH bucketed top-k** — the scale path: sign-bit signature
  against ``n_planes`` deterministic (seeded, no wall clock) random
  hyperplanes; corpus and queries join on band keys so each query only
  scores its collision set. Recall < 1 by design; the brute-force path
  is the oracle it is validated against (tests/test_dedup_similarity).

All math is double-precision Column arithmetic — sequential fold over
the vector (deterministic order), so results are bit-reproducible across
partitionings and engines.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query.

    Output: (query_id, vec_id, cos_sim, rank). Self-matches (same id)
    are excluded. Ties broken by ascending corpus id — fully
    deterministic. The broadcast keeps the big side un-shuffled; the
    only shuffle is the per-query window over |queries| × |corpus| rows
    — at scale, pre-aggregate with a partial top-k per partition
    (``mapInPandas`` heap) before the window if |queries| is large.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _to_double(F.col(vec_col)).alias("_cv"),
                      l2_norm(_to_double(F.col(vec_col))).alias("_cn"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _to_double(F.col(vec_col)).alias("_qv"),
                       l2_norm(_to_double(F.col(vec_col))).alias("_qn"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cos_sim",
                          dot(F.col("_cv"), F.col("_qv"))
                          / (F.col("_cn") * F.col("_qn"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cos_sim", "rank"))


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (seeded; no wall-clock RNG)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p = (vec · plane_p) >= 0. Returns bigint."""
    v = _to_double(vec)
    bits = []
    for p, plane in enumerate(planes):
        lits = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(dot(v, lits) >= 0,
                           F.shiftleft(F.lit(1).cast("bigint"), p))
                    .otherwise(F.lit(0).cast("bigint")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             n_planes: int = 16, bands: int = 4, dim: int = 64,
             seed: int = 7) -> DataFrame:
    """Approximate top-k: score only candidates sharing ≥1 signature band.

    ``n_planes`` sign bits split into ``bands`` chunks; corpus rows and
    query rows join on (band_id, chunk_value) — an equi hash join whose
    fan-in is the bucket collision set, not the corpus. Missing
    neighbors (no shared band) are the recall loss; increase bands or
    lower n_planes/bands ratio to trade shuffle volume for recall.
    """
    planes = hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, idc: str, prefix: str) -> DataFrame:
        sig = lsh_signature(F.col(vec_col), planes)
        return (df.select(F.col(idc).alias(f"{prefix}_id"),
                          _to_double(F.col(vec_col)).alias(f"{prefix}_v"),
                          sig.alias("_sig"))
                .withColumn(f"{prefix}_n", l2_norm(F.col(f"{prefix}_v")))
                .select(f"{prefix}_id", f"{prefix}_v", f"{prefix}_n",
                        F.explode(F.array(*[
                            F.struct(F.lit(b).alias("band"),
                                     F.shiftrightunsigned(F.col("_sig"), b * width)
                                     .bitwiseAND(F.lit(mask)).alias("cv"))
                            for b in range(bands)])).alias("_bk")))

    c = banded(corpus, id_col, "c")
    q = banded(queries, query_id_col, "q")
    cand = (c.join(F.broadcast(q), c["_bk"] == q["_bk"])
            .filter(F.col("c_id") != F.col("q_id"))
            .dropDuplicates(["q_id", "c_id"])
            .withColumn("cos_sim", dot(F.col("c_v"), F.col("q_v"))
                        / (F.col("c_n") * F.col("q_n"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "c_id")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias("query_id"),
                    F.col("c_id").alias("vec_id"), "cos_sim", "rank"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 16, bands: int = 4,
                             dim: int = 64, seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold) via the
    same hyperplane-LSH banding, corpus-vs-itself. Output
    (id_a, id_b, cos_sim) with id_a < id_b."""
    planes = hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    mask = (1 << width) - 1
    sig = lsh_signature(F.col(vec_col), planes)
    base = (df.select(F.col(id_col).alias("_id"),
                      _to_double(F.col(vec_col)).alias("_v"),
                      sig.alias("_sig"))
            .withColumn("_n", l2_norm(F.col("_v")))
            .select("_id", "_v", "_n", F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.shiftrightunsigned(F.col("_sig"), b * width)
                         .bitwiseAND(F.lit(mask)).alias("cv"))
                for b in range(bands)])).alias("_bk")))
    a, b = base.alias("a"), base.alias("b")
    return (a.join(b, (F.col("a._bk") == F.col("b._bk"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("a._v").alias("_va"), F.col("b._v").alias("_vb"),
                    F.col("a._n").alias("_na"), F.col("b._n").alias("_nb"))
            .dropDuplicates(["id_a", "id_b"])
            .withColumn("cos_sim", dot(F.col("_va"), F.col("_vb"))
                        / (F.col("_na") * F.col("_nb")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))
