"""Duplicate-cluster assignment: connected components over verified
near-dup pairs — the step that turns pairwise dedup output into an
actionable keep/drop decision (keep cluster_id = min doc_id, drop the
rest).

Algorithm: iterative min-label propagation to a fixpoint, the
DataFrame-native core of the large-star/small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
literature).  Each round is one equi-join + one aggregate; rounds
needed = component diameter (near-dup clusters are shallow — single
digits).  ``localCheckpoint`` truncates lineage so plans don't grow
across iterations; convergence is a driver-side count, the only
driver round-trip per iteration.

The edge set is the EXACT (oracle-checked) blocked-Jaccard pair list,
so the DuckDB oracle can rebuild identical clusters with a recursive
CTE over the same pairs — an iterative Spark algorithm with a full
value-hash oracle, not just a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .llm_dedup import dedup_ngram_jaccard

# the dedup_ngram_jaccard oracle, minus the projection — single source
# for the edge set on the DuckDB side
_PAIRS_SQL = (
    "WITH d AS (SELECT doc_id, lang, "
    "           list_distinct(string_split(text, ' ')) AS toks, "
    "           len(string_split(text, ' ')) AS n_toks "
    "           FROM documents), "
    "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM d a JOIN d b "
    "ON a.lang = b.lang AND a.n_toks = b.n_toks AND a.doc_id < b.doc_id "
    "WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / "
    "(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8)"
)


@query(
    "x_dedup_clusters",
    category="llm_dedup",
    oracle=(
        "WITH RECURSIVE "
        + _PAIRS_SQL[5:]  # strip the leading "WITH " (merged into RECURSIVE)
        + ", e AS (SELECT id_a AS a, id_b AS b FROM pairs "
        "          UNION ALL SELECT id_b, id_a FROM pairs), "
        "nodes AS (SELECT DISTINCT a AS id FROM e), "
        "reach AS (SELECT id, id AS r FROM nodes "
        "          UNION SELECT e.a, reach.r FROM e JOIN reach ON e.b = reach.id) "
        "SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id"
    ),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup pair; cluster_id
    = smallest doc_id in the connected component."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("id_a", "id_b")
    return min_label_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _propagate_min_once(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round: each node takes the minimum of
    its own label and its neighbours' labels; ``chg`` marks nodes whose
    label shrank this round."""
    neighbor_min = (
        edges.join(labels, edges.id_b == labels.id)
        .groupBy("id_a")
        .agg(F.min("label").alias("nmin"))
    )
    return labels.join(neighbor_min, labels.id == neighbor_min.id_a, "left").select(
        "id",
        F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
        (F.coalesce("nmin", F.col("label")) < F.col("label")).alias("chg"),
    )


def min_label_components(pairs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Iterative min-label connected components over an (id_a, id_b)
    pair list — the shared harness behind x_dedup_clusters (text
    near-dups) and x_dedup_phash_clusters (media near-dups).  Returns
    (id, label) for every endpoint, label = component minimum.

    r13: TWO propagation rounds execute per eager ``localCheckpoint``
    (the materialization barrier is the dominant per-round cost at
    cluster scale — each barrier is a full driver job round-trip), so
    the job count per converged run halves while the shuffle work per
    round is unchanged.  Convergence granularity is identical to the
    former every-other-round check: ``chg`` covers the SECOND round of
    each pair, and a pair whose second round changed nothing is at the
    fixpoint (labels only ever decrease).  Measured (sf0.1, interleaved
    min-of-3, bit-identical label digests): text-pair CC 2.15 -> 1.91 s,
    phash-pair CC 0.65 -> 0.54 s.  Pointer-doubling (label-table
    shortcut join per round) was measured and REFUTED on this corpus:
    rounds 6 -> 5 but wall time flat-to-worse (3.27 vs 3.35 s) — the
    extra self-join costs more than the saved round at shallow
    near-dup diameters; the loud non-convergence guard below is what
    flags a corpus deep enough to revisit that.
    """
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint()
    # r13: round 1 propagates over IDENTITY labels, so its neighbor-min
    # join collapses to a plain groupBy over the edge list —
    # least(id_a, min(id_b)) — and the initial (id, label=id) relation,
    # its distinct, and its checkpoint barrier disappear (the groupBy's
    # id_a key set IS the node set).  Bit-identical to propagating over
    # the identity labeling by definition.
    labels = None
    converged = False
    for r in range(max_rounds // 2):  # diameter guard; clusters are shallow
        if r == 0:
            mid = edges.groupBy("id_a").agg(
                F.least(F.col("id_a"), F.min("id_b")).alias("label")
            ).select(F.col("id_a").alias("id"), "label")
        else:
            mid = _propagate_min_once(edges, labels).select("id", "label")
        labels = _propagate_min_once(edges, mid).localCheckpoint()
        if labels.filter("chg").limit(1).count() == 0:
            converged = True
            break
    if not converged:
        # fail LOUDLY: truncated propagation would return intermediate
        # labels as if they were component minima — a wrong answer, not
        # an error.  A component diameter > max_rounds means this corpus
        # needs the large-star/small-star contraction (halves diameter
        # per round) instead of plain min-label propagation.
        raise RuntimeError(
            "min_label_components: propagation did not converge in "
            f"{max_rounds} rounds (component diameter > {max_rounds})"
        )
    return labels.select("id", "label")


# -- media near-dup clusters (CC over perceptual-hash pairs) -------------


def _phash_clusters_oracle() -> str:
    from .llm_multimodal import _PHASH_MAX_HAM, PHASH_HAM_SQL

    return (
        "WITH RECURSIVE "
        + PHASH_HAM_SQL
        + ", pp AS (SELECT doc_a, doc_b FROM ham "
        f"  WHERE hamming <= {_PHASH_MAX_HAM}), "
        "e AS (SELECT doc_a AS a, doc_b AS b FROM pp "
        "          UNION ALL SELECT doc_b, doc_a FROM pp), "
        "nodes AS (SELECT DISTINCT a AS id FROM e), "
        "reach AS (SELECT id, id AS r FROM nodes "
        "          UNION SELECT e.a, reach.r FROM e JOIN reach "
        "            ON e.b = reach.id) "
        "SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id"
    )


@query(
    "x_dedup_phash_clusters",
    category="llm_multimodal",
    oracle=_phash_clusters_oracle(),
)
def dedup_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media duplicate GROUPS: connected components over
    x_multimodal_phash_dedup's verified near-dup pairs, cluster_id =
    smallest doc_id — the keep-one-per-cluster decision for binary
    media, exactly what x_dedup_clusters provides for text.  Proves
    the min-label CC harness (min_label_components above) is a
    reusable component, not a one-off: same iterative equi-join +
    aggregate rounds, same localCheckpoint lineage discipline, same
    recursive-CTE oracle pattern over a different edge set.

    Scale shape: the pair list is banded-candidate-bounded (see
    x_multimodal_phash_dedup); CC rounds = component diameter
    (near-dup clusters are shallow), each round one equi-join +
    aggregate over the edge endpoints."""
    from .llm_multimodal import multimodal_phash_dedup

    pairs = multimodal_phash_dedup(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    return min_label_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )
