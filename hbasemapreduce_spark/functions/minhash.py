"""MinHash + LSH banding and SimHash, hand-rolled as pure DataFrame ops
(SURVEY.md §4 item 1: the 100 TB-honest variant, not ml.MinHashLSH).

Why hand-rolled: ``ml.feature.MinHashLSH.approxSimilarityJoin`` works to
mid-scale; the banding formulation below is the same math but stays in
plain DataFrame ops — signatures via higher-order functions (JVM
codegen, zero Python), band buckets via explode + self-equi-join on
(band, band_hash).  Shuffle cost is O(n_docs * n_bands) rows of a few
bytes each, and the equi-join lets AQE split hot buckets like any other
skewed join key.

Determinism: all hashing is xxhash64 salted by the permutation index —
stable across runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    items_col: str,
    n_hashes: int = 64,
    n_bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding, verified with
    exact Jaccard over the original item sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    Two docs become a candidate pair iff they agree on ALL rows of at
    least one band — the standard S-curve: P(candidate) =
    1 - (1 - j^rows_per_band)^n_bands.
    """
    rows_per_band = n_hashes // n_bands
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(items_col)).alias("items"),
    ).withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {n_hashes - 1}), i -> "
            "array_min(transform(items, x -> xxhash64(x, i))))"
        ),
    )
    banded = base.withColumn(
        "bd",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> struct(b AS band, "
                f"xxhash64(array_join(transform(slice(sig, b * {rows_per_band} + 1, "
                f"{rows_per_band}), x -> CAST(x AS STRING)), ',')) AS bh))"
            )
        ),
    ).select("id", "items", F.col("bd.band").alias("band"), F.col("bd.bh").alias("bh"))

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.items").alias("items_a"),
            F.col("b.items").alias("items_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("items_a", "items_b"))
    union = F.size("items_a") + F.size("items_b") - inter
    return cand.select(
        "id_a", "id_b", (inter.cast("double") / union.cast("double")).alias("jaccard")
    ).filter(F.col("jaccard") >= jaccard_threshold)


def simhash_expr(items_col: str) -> Column:
    """64-bit SimHash over a named array<string> column, as bigint.

    bit j of the result = sign of sum over items of (+1/-1 from bit j of
    xxhash64(item)).  Pure higher-order functions, JVM-side.
    """
    return F.expr(
        "aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, j) -> acc + CASE WHEN "
        f"aggregate({items_col}, CAST(0 AS BIGINT), "
        "(a, x) -> a + CASE WHEN (shiftright(xxhash64(x), j) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        "THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
    )


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    items_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into
    ``n_bands`` 16-bit chunks; by pigeonhole, any pair within hamming
    distance < n_bands agrees exactly on >= 1 band -> equi-join on
    (band, chunk), then verify true hamming distance.
    """
    bits = 64 // n_bands
    sigs = df.select(F.col(id_col).alias("id"), simhash_expr(items_col).alias("sh"))
    banded = sigs.withColumn(
        "bd",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> "
                f"struct(b AS band, shiftright(sh, b * {bits}) & {2**bits - 1} AS chunk))"
            )
        ),
    ).select("id", "sh", F.col("bd.band").alias("band"), F.col("bd.chunk").alias("chunk"))
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return cand.select("id_a", "id_b", hamming.cast("long").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
