"""Interval and event-spacing operators over the event stream.

- x_join_asof_tolerance: as-of join with a staleness bound (the
  pandas ``merge_asof(tolerance=...)`` semantics) — a match older
  than the tolerance is discarded, not carried.
- x_time_gap_histogram: log2-bucketed histogram of per-user
  inter-event gaps — the event-spacing profile behind session-gap
  tuning (the 30-minute sessionizer threshold is readable straight
  off this histogram's knee).
- x_win_overlap_concurrency: sweep-line maximum concurrency of
  5-minute event intervals per type — "how many were active at once",
  the classic interval-analytics aggregate.

Determinism: gaps and buckets are pure bigint arithmetic (the log2
bucket is ``length(bin(g))`` — the binary-string length, an exact
integer in both engines, never a float log); the sweep-line running
sum is an integer window over a totally-ordered boundary stream;
as-of matching reuses the union+window asof machinery with its total
tiebreak ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.asof import asof_join, asof_nearest_join
from ..registry import query


@query(
    "x_join_asof_tolerance",
    category="join",
    oracle=(
        "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT event_id AS view_id, user_id, ts AS v_ts FROM events "
        "      WHERE event_type = 'view'), "
        "ranked AS ("
        "  SELECT p.event_id, v.view_id, "
        "  row_number() OVER (PARTITION BY p.event_id "
        "                     ORDER BY v.v_ts DESC, v.view_id DESC) AS rn "
        "  FROM p JOIN v ON v.user_id = p.user_id AND v.v_ts <= p.ts "
        "  AND v.v_ts >= p.ts - INTERVAL 1 HOUR) "
        "SELECT p.event_id, r.view_id AS matched_view_id "
        "FROM p LEFT JOIN ranked r ON r.event_id = p.event_id AND r.rn = 1"
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with tolerance: each purchase matched to the user's
    latest PRIOR view, but only if that view is at most 1 hour old —
    older matches are dropped (null), exactly pandas
    ``merge_asof(..., tolerance=...)``.

    Built on the same single-shuffle union+window asof machinery as
    join_asof: the payload carries the matched view's timestamp, and
    the tolerance is applied as a post-filter on the carried value —
    no second join, no inequality-join blowup.  The oracle applies the
    bound inside its ranked join instead; both must agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    out = asof_join(
        purchases,
        views,
        left_key=F.col("user_id"),
        right_key=F.col("user_id"),
        left_time=F.col("ts"),
        right_time=F.col("v_ts"),
        payload={"view_id": F.col("view_id"), "matched_ts": F.col("v_ts")},
        right_tiebreak=[F.col("view_id")],
    )
    within = F.col("matched_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return out.select(
        "event_id",
        F.when(within, F.col("view_id")).alias("matched_view_id"),
    )


@query(
    "x_join_asof_nearest",
    category="join",
    oracle=(
        "WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t "
        "  FROM events WHERE event_type = 'purchase'), "
        "v AS (SELECT event_id AS view_id, user_id, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS vt FROM events "
        "  WHERE event_type = 'view'), "
        "ranked AS ("
        "  SELECT p.event_id, v.view_id, abs(v.vt - p.t) AS dist_us, "
        "  row_number() OVER (PARTITION BY p.event_id ORDER BY "
        "    abs(v.vt - p.t), "
        "    CASE WHEN v.vt <= p.t THEN 0 ELSE 1 END, "
        "    CASE WHEN v.vt <= p.t THEN -v.view_id ELSE v.view_id END) AS rn "
        "  FROM p JOIN v ON v.user_id = p.user_id) "
        "SELECT p.event_id, r.view_id AS matched_view_id, r.dist_us "
        "FROM p LEFT JOIN ranked r ON r.event_id = p.event_id AND r.rn = 1"
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbour as-of join: each purchase matched to the
    user's closest view in time, in EITHER direction — the pandas
    ``merge_asof(direction='nearest')`` semantics that backward-only
    join_asof and the tolerance variant don't cover (attribution
    windows where the instrumented view may log slightly AFTER the
    purchase it caused).

    Tie rules are total and documented: equal distance prefers the
    backward (earlier) match; equal timestamps within a direction break
    by view_id (max for backward — the asof convention of "latest
    wins" — min for forward).

    Scale shape: the same union-tag machinery as join_asof, but with
    BOTH directions read off ONE (user, time, side, id) sort — a
    backward ``last(ignorenulls)`` frame and a forward
    ``first(ignorenulls)`` frame.  Spark plans a single Exchange+Sort
    feeding both frames (the x_time_interp budget): one shuffle, linear
    state, no inequality join, no per-row candidate explosion.  The
    oracle is the naive all-pairs ranked spec, so the hash match proves
    the two-frame formulation picks the identical nearest match."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros(F.col("ts")).alias("t")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("vt"),
    )
    out = asof_nearest_join(
        p,
        v,
        left_key=F.col("user_id"),
        right_key=F.col("user_id"),
        left_time=F.col("t"),
        right_time=F.col("vt"),
        payload={"matched_view_id": F.col("view_id")},
        right_tiebreak=F.col("view_id"),
        dist_col="dist_us",
    )
    return out.select("event_id", "matched_view_id", "dist_us")


@query(
    "x_time_gap_histogram",
    category="analytics",
    oracle=(
        "WITH e AS ("
        "  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id "
        "  FROM events), "
        "g AS ("
        "  SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id "
        "                                  ORDER BY ts_us, event_id) AS gap_us "
        "  FROM e), "
        "b AS ("
        "  SELECT CASE WHEN gap_us < 1000000 THEN 0 "
        "         ELSE length(bin(gap_us // 1000000)) END AS bucket "
        "  FROM g WHERE gap_us IS NOT NULL) "
        "SELECT bucket, COUNT(*) AS n_gaps FROM b GROUP BY bucket"
    ),
)
def time_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user inter-event gaps in log2 seconds buckets
    (bucket k covers [2^(k-1), 2^k) seconds; bucket 0 is sub-second).
    The session-gap threshold every sessionizer hardcodes is readable
    off this histogram's bimodal knee.

    The bucket is ``length(bin(seconds))`` — the bit-length of the
    integer second count — so the 'log2' is exact bigint arithmetic in
    both engines (a float log2 at a power-of-2 boundary could round to
    either side and shift histogram mass).  One lag window per user
    (the sessionizer's shuffle), then a tiny-domain count."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") < 1_000_000, F.lit(0)).otherwise(
        F.length(F.expr("bin(gap_us DIV 1000000)"))
    )
    return gaps.select(bucket.cast("long").alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n_gaps")
    )


@query(
    "x_win_overlap_concurrency",
    category="window",
    oracle=(
        "WITH b AS ("
        # kind orders END (-1) before START (+1) at equal t: touching
        # intervals do not overlap
        "  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t, 1 AS delta, "
        "         event_id, 1 AS kind FROM events "
        "  UNION ALL "
        "  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) + 300000000, -1, "
        "         event_id, 0 FROM events), "
        "r AS ("
        "  SELECT event_type, "
        "  SUM(delta) OVER (PARTITION BY event_type "
        "                   ORDER BY t, kind, event_id "
        "                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live "
        "  FROM b) "
        "SELECT event_type, CAST(MAX(live) AS BIGINT) AS max_concurrent FROM r "
        "GROUP BY event_type"
    ),
)
def win_overlap_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrency: treat each event as a 5-minute
    interval and report, per type, the largest number simultaneously
    active.  The standard O(n log n) boundary-stream formulation: +1 at
    each start, -1 at each end, running sum, max.

    Boundary ordering is total — (time, end-before-start at equal time,
    event_id) — so concurrency at touching endpoints is well-defined
    (an interval ending exactly when another starts does NOT overlap
    it) and the running sum is identical under any partitioning.

    Scale shape: one window per event_type partition.  For a skewed
    type, the same sweep runs hierarchically (per-bucket sums +
    prefix-sum of bucket totals); at this corpus the flat window is
    the right plan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts")).alias("t0"), "event_id"
    )
    starts = ev.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta"),
        "event_id", F.lit(1).alias("kind"),
    )
    ends = ev.select(
        "event_type", (F.col("t0") + 300_000_000).alias("t"), F.lit(-1).alias("delta"),
        "event_id", F.lit(0).alias("kind"),
    )
    b = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    live = b.select("event_type", F.sum("delta").over(w).alias("live"))
    return live.groupBy("event_type").agg(
        F.max("live").cast("long").alias("max_concurrent")
    )


@query(
    "x_time_fill_forward",
    category="window",
    oracle=(
        "WITH e AS ("
        "  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, "
        "  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k "
        "  FROM events) "
        "SELECT user_id, event_id, k, "
        "last_value(k IGNORE NULLS) OVER ("
        "  PARTITION BY user_id ORDER BY tss, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k_filled "
        "FROM e"
    ),
)
def time_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward) of the sparse
    ``props.k`` attribute per user — the canonical time-series gap
    repair before feature extraction: a row whose observation is NULL
    inherits the latest earlier non-null one; rows before the first
    observation stay NULL.

    One window per user over the TOTAL order (ts, event_id), evaluated
    with ``last(..., ignorenulls=True)`` over an unbounded-preceding
    row frame — a single shuffle on the fill key, O(1) state per row,
    no self-join and no driver loop.  At 100 TB this is the plan you
    want: partition by entity, sort within partition, one linear pass.
    The event_id tiebreak makes the carried value deterministic even
    for same-timestamp rows, so the result is identical at any
    partition count and hash-matches the DuckDB twin (IGNORE NULLS is
    spelled `F.last(ignorenulls=True)` on the Spark side)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("tss"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tss", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "k",
        F.last("k", ignorenulls=True).over(w).alias("k_filled"),
    )


@query(
    "x_time_interp",
    category="window",
    oracle=(
        "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tss, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, "
        "  CASE WHEN event_type = 'purchase' THEN "
        "    CAST(json_extract_string(props, '$.k') AS INTEGER) END AS k "
        "  FROM events), "
        "f AS (SELECT user_id, event_id, k, t_us, "
        "  last_value(k IGNORE NULLS) OVER wp AS pk, "
        "  last_value(CASE WHEN k IS NOT NULL THEN t_us END IGNORE NULLS) OVER wp AS pt, "
        "  first_value(k IGNORE NULLS) OVER wn AS nk, "
        "  first_value(CASE WHEN k IS NOT NULL THEN t_us END IGNORE NULLS) OVER wn AS nt "
        "  FROM e WINDOW "
        "  wp AS (PARTITION BY user_id ORDER BY tss, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
        "  wn AS (PARTITION BY user_id ORDER BY tss, event_id "
        "    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) "
        "SELECT user_id, event_id, k, "
        "  CASE WHEN k IS NOT NULL THEN CAST(k AS DOUBLE) "
        "       WHEN pk IS NOT NULL AND nk IS NOT NULL AND nt > pt THEN "
        "         CAST(pk AS DOUBLE) + (CAST(nk AS DOUBLE) - CAST(pk AS DOUBLE)) "
        "           * (CAST(t_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) "
        "       WHEN pk IS NOT NULL AND nk IS NOT NULL THEN CAST(pk AS DOUBLE) "
        "       WHEN pk IS NOT NULL THEN CAST(pk AS DOUBLE) "
        "       WHEN nk IS NOT NULL THEN CAST(nk AS DOUBLE) "
        "       ELSE NULL END AS k_interp "
        "FROM f"
    ),
)
def time_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the sparse ``props.k`` series per user —
    x_time_fill_forward's two-sided sibling.  The metric is OBSERVED
    only at purchase events (the instrumented subset — this corpus
    carries props.k on every row, so the observation mask is part of
    the spec); every other row takes the value the straight line
    between its surrounding observations passes through at ITS
    timestamp, and one-sided gaps fall back to the nearest observation
    (LOCF after the last / NOCB before the first).

    Exactness: the interpolation weight is a ratio of MICROSECOND
    bigint deltas (exact to double conversion — epoch micros are far
    inside 2^53) and the value endpoints are ints, so k_interp is one
    FIXED tree of correctly-rounded IEEE ops — identical both engines.
    Same-timestamp observation collisions (nt == pt) fall back to the
    previous value rather than dividing by zero, spelled identically in
    both engines.

    Scale shape: ONE shuffle (partition by user), two frame reads over
    the same sort — Spark plans a single Exchange+Sort feeding both
    window frames; linear state, no self-join, no driver loop (the
    x_time_fill_forward budget exactly)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("ts").alias("tss"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.get_json_object("props", "$.k").cast("int"),
        ).alias("k"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("tss", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("tss", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("k").isNotNull(), F.col("t_us"))
    f = e.select(
        "user_id",
        "event_id",
        "k",
        "t_us",
        F.last("k", ignorenulls=True).over(wp).alias("pk"),
        F.last(obs_t, ignorenulls=True).over(wp).alias("pt"),
        F.first("k", ignorenulls=True).over(wn).alias("nk"),
        F.first(obs_t, ignorenulls=True).over(wn).alias("nt"),
    )
    interp = (
        F.when(F.col("k").isNotNull(), F.col("k").cast("double"))
        .when(
            F.col("pk").isNotNull() & F.col("nk").isNotNull() & (F.col("nt") > F.col("pt")),
            F.col("pk").cast("double")
            + (F.col("nk").cast("double") - F.col("pk").cast("double"))
            * ((F.col("t_us") - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")).cast("double")),
        )
        .when(F.col("pk").isNotNull() & F.col("nk").isNotNull(), F.col("pk").cast("double"))
        .when(F.col("pk").isNotNull(), F.col("pk").cast("double"))
        .when(F.col("nk").isNotNull(), F.col("nk").cast("double"))
    )
    return f.select("user_id", "event_id", "k", interp.alias("k_interp"))


_PIT_7D_US = 7 * 86_400 * 1_000_000  # 7 days in microseconds


@query(
    "x_feature_pit_matrix",
    category="window",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, event_type, value, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS us, "
        "  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events), "
        "f AS (SELECT event_id, user_id, event_type, us, "
        "  last_value(k IGNORE NULLS) OVER ("
        "    PARTITION BY user_id ORDER BY us, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f_last_k, "
        "  CAST(COUNT(*) OVER wr AS BIGINT) AS f_cnt_7d, "
        "  COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER wr AS DOUBLE), 0.0) "
        "    AS f_sum_7d "
        "  FROM e WINDOW wr AS (PARTITION BY user_id ORDER BY us "
        f"    RANGE BETWEEN {_PIT_7D_US} PRECEDING AND 1 PRECEDING)) "
        "SELECT event_id, user_id, us AS ts_us, f_last_k, f_cnt_7d, f_sum_7d "
        "FROM f WHERE event_type = 'purchase'"
    ),
)
def feature_pit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training matrix — the feature-store join
    that decides whether an ML system leaks: for every purchase event
    (the label row), attach (1) the user's last observed ``props.k``
    STRICTLY BEFORE the label timestamp, (2) the user's event count in
    the preceding 7 days, (3) the decimal-exact value sum over the same
    trailing window — all frames END BEFORE the label row, so no
    feature can see its own label (the leakage bug as-of semantics
    exist to prevent).

    One shuffle total: partition by user, sort once on the total
    (ts_us, event_id) order, and evaluate all three features as frames
    over that single sort — a ROWS unbounded-to-(-1) last(ignorenulls)
    and a RANGE [-7d, -1us) count/sum pair.  At 100 TB this is the
    feature-backfill plan: entity-partitioned, one linear pass, O(1)
    state per row, no per-feature self-joins.

    Determinism: frame membership is value-based (microsecond range) or
    governed by the tie-broken total order; the trailing sum runs
    through the decimal(18,2) sandwich; empty frames coalesce to 0
    identically in both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("us"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    wrow = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_PIT_7D_US, -1)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("us").alias("ts_us"),
            F.last("k", ignorenulls=True).over(wrow).alias("f_last_k"),
            F.count("*").over(wrange).alias("f_cnt_7d"),
            F.coalesce(
                F.sum(F.col("value").cast("decimal(18,2)"))
                .over(wrange)
                .cast("double"),
                F.lit(0.0),
            ).alias("f_sum_7d"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_us", "f_last_k", "f_cnt_7d", "f_sum_7d")
    )


_OVL_CELL_US = 600_000_000  # 10-minute grid cells = the longer side's span


@query(
    "x_join_interval_overlap",
    category="join",
    oracle=(
        # The NAIVE range join IS the spec: the Spark side's grid-cell
        # rewrite must be provably lossless against it.
        "WITH a AS (SELECT event_id AS error_id, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS sa, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS ea "
        "  FROM events WHERE event_type = 'error'), "
        "b AS (SELECT event_id AS purchase_id, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS sb, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS eb "
        "  FROM events WHERE event_type = 'purchase') "
        "SELECT error_id, purchase_id, "
        "CAST(least(ea, eb) - greatest(sa, sb) AS BIGINT) AS overlap_us "
        "FROM a JOIN b ON sa < eb AND sb < ea"
    ),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap pair join: every (error-window, purchase-
    window) pair whose intervals intersect, with the exact overlap
    duration — errors open a 10-minute incident window, purchases a
    5-minute checkout window, and the join answers "which checkouts
    ran inside an incident".  Spark has no interval-join physical
    operator, so the naive form is a BNLJ/cartesian at any scale.

    Scale shape — the grid-cell blocking every distributed engine uses
    for overlap joins: bucket time into fixed cells no shorter than
    the longest interval, explode each interval into the cells it
    touches (<= 2 here), EQUI-JOIN on the cell id, then apply the
    exact overlap residual.  Exactly-once WITHOUT a dedup shuffle: a
    candidate pair is kept only in the ATTRIBUTION cell — the cell
    containing max(start_a, start_b) — so a pair co-resident in two
    cells is emitted by exactly one (the standard dedup-free grid
    join).  The oracle is the naive range join itself, which makes
    every driver run a losslessness proof of the rewrite.  At 100 TB:
    shuffle is equi-keyed on cell (AQE-splittable), fan-out bounded by
    interval_len/cell + 1, and a skewed cell salts like any hot join
    key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros(F.col("ts")).alias("s")
    )
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("s").alias("sa"),
        (F.col("s") + 600_000_000).alias("ea"),
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("s").alias("sb"),
        (F.col("s") + 300_000_000).alias("eb"),
    )
    cell = _OVL_CELL_US
    ax = a.select(
        "*", F.explode(F.sequence(F.expr(f"sa DIV {cell}"), F.expr(f"(ea - 1) DIV {cell}"))).alias("c")
    )
    bx = b.select(
        "*", F.explode(F.sequence(F.expr(f"sb DIV {cell}"), F.expr(f"(eb - 1) DIV {cell}"))).alias("c")
    )
    return (
        ax.join(bx, "c")
        .filter(
            (F.col("sa") < F.col("eb"))
            & (F.col("sb") < F.col("ea"))
            & (F.expr(f"greatest(sa, sb) DIV {cell}") == F.col("c"))
        )
        .select(
            "error_id",
            "purchase_id",
            (F.least("ea", "eb") - F.greatest("sa", "sb")).cast("long").alias("overlap_us"),
        )
    )
