"""§2.9 LLM-data-pipeline: similarity search over `embeddings`.

- sim_cosine_topk: exact brute-force cosine top-k (the baseline; oracle
  checked against DuckDB list_cosine_similarity in float64).
- sim_ann_lsh: the scale path — random-hyperplane LSH bucketing turns
  candidate generation into an equi-join; exact rerank inside buckets.
  rows-only (bucket membership is approximate by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import brute_force_topk, cosine, hyperplane_signature
from ..registry import query

_N_QUERIES = 10
_K = 5


@query(
    "sim_cosine_topk",
    category="llm_sim",
    oracle=(
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), "
        "q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < "
        f"{_N_QUERIES}), "
        "scored AS ("
        "  SELECT q.query_id, e.vec_id AS neighbor_id, "
        "         list_cosine_similarity(q.q_emb, e.emb) AS raw_sim "
        "  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), "
        "ranked AS ("
        "  SELECT query_id, neighbor_id, raw_sim, "
        "  row_number() OVER (PARTITION BY query_id ORDER BY raw_sim DESC, neighbor_id) AS rnk "
        "  FROM scored) "
        f"SELECT query_id, neighbor_id, rnk, round(raw_sim, 6) AS sim FROM ranked WHERE rnk <= {_K}"
    ),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 10 vectors."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    return brute_force_topk(e, q, k=_K)


@query("x_sim_ann_lsh", category="llm_sim", oracle=None)  # rows-only: ANN is approximate
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: 8-plane LSH bucket join + exact rerank.

    Candidate generation is an equi-join on the 8-bit signature (256
    buckets), so the plan is shuffle-bounded, not O(n*m) — at 100 TB
    add more planes / multi-probe instead of widening the cross join.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).withColumn("sig", hyperplane_signature("emb"))
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("sig").alias("q_sig"),
    )
    cand = (
        e.join(F.broadcast(q), (F.col("sig") == F.col("q_sig")) & (F.col("vec_id") != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("raw_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_sim"), F.asc("neighbor_id"))
    return (
        cand.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= _K)
        .select("query_id", "neighbor_id", "rnk", F.round("raw_sim", 6).alias("sim"))
    )
