"""Vector similarity building blocks (SURVEY.md §2.9).

Cosine math is done in float64 via JVM higher-order functions
(``zip_with`` + ``aggregate`` — a sequential left fold, matching the
oracle's evaluation order).  The brute-force path broadcasts the query
set; the LSH path buckets by random-hyperplane signature so candidate
generation is an equi-join.

100 TB scale path (documented, per SURVEY.md §4 item 2): replace the
broadcast cross join with a block-matrix pandas UDF (numpy GEMM per
partition pair) once the query set no longer fits a broadcast — the
bucketed-LSH variant below is the first step of that path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_emb",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query via broadcast cross join.

    Output: (query_id, neighbor_id, rnk, sim) with total tie-broken
    ordering (sim desc, neighbor_id asc).
    """
    # Norms are per-vector, not per-pair: compute them once on each side
    # before the join (at n vectors x q queries this saves 2/3 of the
    # floating-point work versus a naive per-pair cosine).
    vec = vectors.withColumn("_nrm", norm(F.col(vec_col)))
    qs = queries.withColumn("_qnrm", norm(F.col(query_vec_col)))
    sim = dot(F.col(query_vec_col), F.col(vec_col)) / (F.col("_qnrm") * F.col("_nrm"))
    scored = (
        vec.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            sim.alias("raw_sim"),
        )
    )
    # Rank on the ROUNDED similarity (both engines): the raw float64 fold
    # is not guaranteed bit-identical across engines, and a ULP gap at
    # the rank-k boundary would flip row membership; at 6 dp the two
    # evaluation orders agree, and neighbor_id breaks exact ties.
    scored = scored.withColumn("sim", F.round("raw_sim", 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "sim")
    )


def hyperplane_signature(vec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature (bigint) for cosine similarity.

    Plane p's component d is a deterministic pseudo-random +-1 derived
    from xxhash64(p, d) — no driver-side randomness, identical on every
    executor and every run.
    """
    return F.expr(
        f"aggregate(sequence(0, {n_planes - 1}), CAST(0 AS BIGINT), (acc, p) -> acc + "
        f"CASE WHEN aggregate(sequence(0, {dim - 1}), CAST(0.0 AS DOUBLE), "
        f"(s, d) -> s + element_at({vec_col}, d + 1) * "
        "CASE WHEN (xxhash64(p, d) & 1) = 1 THEN 1.0 ELSE -1.0 END) > 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END)"
    )
