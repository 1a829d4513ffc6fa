"""§2.3 Joins.

Reference grounding (SURVEY.md §2.3 `[public-api]`): HBase-MR has no
join operator — multi-table joins are hand-written reduce-side joins
over MultiTableInputFormat (tag by source table in map, co-group in
reduce).  Here every join is declarative: Catalyst chooses
broadcast-hash vs sort-merge; tiny dims (nation/region) are explicitly
broadcast, fact-fact joins shuffle on their keys with AQE skew
handling.

Scale notes:
- ``join_star``: dims are broadcast so the 100 TB fact table is joined
  map-side with zero shuffle until the final small aggregation.
- ``join_theta_range``: a naive non-equi join is a nested-loop cross
  product (O(n*m) — infeasible at scale); we band time into 5-minute
  slots and turn it into an equi-join on slot + residual range filter.
- ``join_asof``: one shuffle total via the union+window pattern in
  functions/asof.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables
from ..functions.asof import asof_join
from ..functions.determinism import dec_sum
from ..registry import query

_SLOT_US = 300_000_000  # 5-minute bands, in microseconds


@query(
    "join_inner",
    category="join",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    category="join",
    oracle=(
        "SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_cnt "
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
        "GROUP BY c_custkey, c_name"
    ),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customers with their order count, including zero."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "join_semi",
    category="join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    category="join",
    oracle=(
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    ),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_star",
    category="join",
    oracle=(
        "SELECT r_name, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue, "
        "COUNT(*) AS n_items "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name"
    ),
)
def join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue per region across the full star schema.

    nation/region are broadcast explicitly (constant-size dims);
    customer/orders are left to AQE (broadcast at bench scale,
    shuffle-hash beyond the broadcast threshold at 100 TB).
    """
    lineitem, orders, customer, nation, region = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(dec_sum(revenue, "revenue", scale=6), F.count("*").alias("n_items"))
    )


@query(
    "join_theta_range",
    category="join",
    oracle=(
        "SELECT p.event_id, COUNT(e.event_id) AS cnt "
        "FROM events p LEFT JOIN events e "
        "ON e.event_type = 'error' "
        "AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts < p.ts "
        "WHERE p.event_type = 'purchase' "
        "GROUP BY p.event_id"
    ),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join: per purchase, count errors in the preceding
    5 minutes.

    Banded rewrite: bucket both sides into 5-minute slots, explode each
    purchase into its slot and the previous one, equi-join on slot, then
    apply the exact range residual.  Each error falls in exactly one
    slot so no dedup is needed; unmatched purchases keep cnt=0 via the
    left join.  (SURVEY.md §2.3 specifies orders-vs-events here, but the
    testdata date ranges are disjoint — every count would be 0; an
    events self-join exercises the same operator shape meaningfully.)
    """
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us")
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("e_us")
    )
    e = e.withColumn("slot", F.expr(f"e_us DIV {_SLOT_US}"))
    p = p.withColumn(
        "slot",
        F.explode(F.array(F.expr(f"p_us DIV {_SLOT_US} - 1"), F.expr(f"p_us DIV {_SLOT_US}"))),
    )
    joined = p.join(
        e,
        (p.slot == e.slot) & (e.e_us >= p.p_us - F.lit(_SLOT_US)) & (e.e_us < p.p_us),
        "left",
    )
    return joined.groupBy("event_id").agg(F.count("e_us").alias("cnt"))


@query(
    "join_asof",
    category="join",
    oracle=(
        "WITH ranked AS ( "
        "  SELECT e.event_id, o.o_orderkey, "
        "         row_number() OVER (PARTITION BY e.event_id "
        "                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn "
        "  FROM events e JOIN orders o "
        "    ON o.o_custkey = (e.user_id % 150) + 1 AND o.o_orderdate <= e.ts "
        ") "
        "SELECT e.event_id, r.o_orderkey AS matched_orderkey "
        "FROM events e LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1"
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the latest order at-or-before its timestamp
    (synthetic key: user_id % 150 + 1 = o_custkey; SURVEY.md §2.3)."""
    events, orders = load_tables(spark, sf_dir, "events", "orders")
    left = events.select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = orders.select("o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"), "o_orderkey")
    out = asof_join(
        left,
        right,
        left_key=(F.col("user_id") % 150) + 1,
        right_key=F.col("o_custkey"),
        left_time=F.col("ts"),
        right_time=F.col("o_orderdate"),
        payload={"matched_orderkey": F.col("o_orderkey")},
        right_tiebreak=[F.col("o_orderkey")],
    )
    return out.select("event_id", "matched_orderkey")


_FZ_D = 2  # edit-distance threshold
_FZ_SEGS = _FZ_D + 1  # pigeonhole segment count

# Segment geometry for a string partitioned into 3 even segments
# (0-indexed): seg i of a length-L string has
#   len_i   = L DIV 3 + (1 if i < L % 3 else 0)
#   start_i = i * (L DIV 3) + min(i, L % 3)
_FZ_IDX_KEYS = (
    "filter(transform(sequence(0, 2), i -> struct("
    "  CAST(i AS INT) AS seg, "
    "  substring(nm, i * (length(nm) DIV 3) + least(i, length(nm) % 3) + 1, "
    "            (length(nm) DIV 3) + IF(i < length(nm) % 3, 1, 0)) AS txt, "
    "  length(nm) AS plen)), "
    "k -> length(k.txt) >= 1)"
)
_FZ_PRB_KEYS = (
    "array_distinct(flatten(transform("
    "  sequence(greatest(length(nm) - 2, 1), length(nm) + 2), pl -> "
    "  flatten(transform(sequence(0, 2), i -> "
    "    filter(transform(sequence("
    "        i * (pl DIV 3) + least(i, pl % 3) - 2, "
    "        i * (pl DIV 3) + least(i, pl % 3) + 2), pos -> "
    "      IF(pos >= 0 AND (pl DIV 3) + IF(i < pl % 3, 1, 0) >= 1 "
    "         AND pos + (pl DIV 3) + IF(i < pl % 3, 1, 0) <= length(nm), "
    "        struct(CAST(i AS INT) AS seg, "
    "               substring(nm, CAST(pos + 1 AS INT), "
    "                 (pl DIV 3) + IF(i < pl % 3, 1, 0)) AS txt, "
    "               CAST(pl AS INT) AS plen), "
    "        NULL)), "
    "      x -> x IS NOT NULL))))))"
)


@query(
    "x_join_fuzzy_name",
    category="join",
    oracle=(
        "WITH d AS (SELECT p_name AS nm, CAST(COUNT(*) AS BIGINT) AS cnt "
        "  FROM part GROUP BY 1) "
        "SELECT a.nm AS name_a, b.nm AS name_b, "
        "CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist, "
        "a.cnt AS rows_a, b.cnt AS rows_b "
        "FROM d a JOIN d b ON a.nm < b.nm "
        f"AND levenshtein(a.nm, b.nm) <= {_FZ_D}"
    ),
)
def join_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join (PassJoin, Li et al. VLDB'11)
    over the part-name domain: all DISTINCT name pairs within
    Levenshtein distance 2, each annotated with how many base rows
    carry each spelling — the entity-resolution primitive ("which
    near-miss spellings should merge, and what's the blast radius").

    Never all-pairs: each distinct string is partitioned into d+1 = 3
    contiguous segments; if ed(a,b) <= 2 then at least one segment
    contains no edit, so it appears EXACTLY in the partner at a start
    shifted by at most d (pigeonhole over the edit alignment).  The
    index side emits its own 3 segments keyed by (seg#, text, own
    length); the probe side emits, for every partner length within
    +/-d and every start within +/-d of that geometry's segment start,
    the matching substring — ~(2d+1)^2 * 3 bounded keys per string.
    Candidates come from the equi-join on (seg#, text, partner_len);
    the exact levenshtein verify is candidate-bounded.  The DuckDB
    oracle is the NAIVE all-pairs spec, so the hash match proves the
    blocking lossless on this corpus (the x_dedup_gram_containment
    discipline).

    Scale shape: the string DOMAIN is distinct'd first (|domain| <<
    |rows| — the canonical ER move), key expansion is a generator, the
    join is equi, and row counts join back per name.  At 100 TB the
    domain dedup is the only corpus-sized shuffle."""
    grp = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("nm"))
        .agg(F.count("*").cast("long").alias("cnt"))
        # Pigeonhole precondition: with d = 2 the guarantee needs all
        # 3 segments non-empty (length >= 3); a shorter string could
        # have both its non-empty segments edited and the pair would
        # be silently missed vs the naive oracle.  Fail loudly instead
        # (the x_sim_ann_lsh_portable plane-budget discipline).
        .filter(
            F.when(F.length("nm") >= _FZ_SEGS, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("x_join_fuzzy_name: string shorter than "),
                        F.lit(str(_FZ_SEGS)),
                        F.lit(" chars breaks the pigeonhole guarantee: '"),
                        F.col("nm"),
                        F.lit("'"),
                    )
                )
            )
        )
        .localCheckpoint(eager=False)
    )
    idx = grp.select(F.col("nm").alias("nm_i"), F.explode(F.expr(_FZ_IDX_KEYS)).alias("k")).select(
        "nm_i", "k.seg", "k.txt", "k.plen"
    )
    prb = grp.select(F.col("nm").alias("nm_p"), F.explode(F.expr(_FZ_PRB_KEYS)).alias("k")).select(
        "nm_p", "k.seg", "k.txt", "k.plen"
    )
    cand = (
        idx.join(prb, ["seg", "txt", "plen"])
        .select(
            F.least("nm_i", "nm_p").alias("name_a"),
            F.greatest("nm_i", "nm_p").alias("name_b"),
        )
        .filter(F.col("name_a") < F.col("name_b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= _FZ_D)
        .join(
            grp.select(F.col("nm").alias("name_a"), F.col("cnt").alias("rows_a")),
            "name_a",
        )
        .join(
            grp.select(F.col("nm").alias("name_b"), F.col("cnt").alias("rows_b")),
            "name_b",
        )
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
    )


@query(
    "x_join_hint_strategy",
    category="join",
    oracle=(
        "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
)
def join_hint_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-strategy HINT surface (`DataFrame.hint` /
    `/*+ MERGE */`): the same customer⋈nation plan Catalyst would
    freely BROADCAST (nation is 25 rows) is forced onto the
    SORT-MERGE path with `.hint("merge")` — and produces the
    identical result, which is the entire point of a hint: it selects
    a physical strategy without touching semantics.  The plan gate
    (tests/test_plans.py) asserts the SortMergeJoin actually
    materialized where the un-hinted twin (join_star et al.) plans a
    BroadcastHashJoin.

    Why a user reaches for this at 100 TB: broadcast estimation works
    off STATISTICS, and a misestimated 'small' side (post-filter
    explosion, stale stats, a UDF-opaque subtree) can OOM every
    executor at once — the hint is the escape hatch that pins the
    safe strategy.  The inverse hints (broadcast / shuffle_hash /
    shuffle_replicate_nl) ride the same API; one pinned
    representative proves the surface.

    Scale shape: sort-merge = both sides hash-partitioned on the key
    then merge-scanned — the unbounded-side-safe strategy; cost is
    two keyed shuffles + two sorts, exactly what the hint trades the
    broadcast's memory risk for."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(
            nat.hint("merge"),
            cust.c_nationkey == nat.n_nationkey,
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
    )
