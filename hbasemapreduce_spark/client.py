"""User-facing client API: the reference genre's Scan/job surface on
DataFrames.

The reference's users (SURVEY.md §3.1 — `[public-api]` HBase MapReduce
genre; the checkout itself is empty, SURVEY.md §0) drive everything
through a ``Scan`` builder — start/stop row, column projection, value
filters, limits — handed to a table-input job.  This module gives a
migrating user that same surface, compiled to a DECLARATIVE DataFrame
so Catalyst sees every predicate and projection:

    t = Table(spark, sf_dir, "orders", row_key="o_orderkey")
    df = (t.scan()
           .with_start_row(1000).with_stop_row(5000)
           .add_columns("o_orderkey", "o_totalprice")
           .with_filter(F.col("o_totalprice") > 1000.0)
           .with_limit(100)
           .to_df())

Design rule: the builder NEVER executes anything and never touches
RDDs — ``to_df()`` only composes ``filter``/``select``/``limit`` in
the canonical order (range -> value filters -> projection -> limit),
so predicate pushdown, column pruning and partition pruning fire
exactly as if the user had written the DataFrame by hand
(plan-asserted in tests/test_client.py).  The group_count/group_agg
job helpers are the TableMapReduceUtil analog: a shuffle-once partial+
final hash aggregate over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .registry import query


class Scan:
    """Immutable scan builder over one table; every ``with_*``/``add_*``
    returns a NEW Scan, so partial scans can be shared and forked the
    way reference users reuse Scan templates."""

    def __init__(self, df: DataFrame, row_key: str):
        self._df = df
        self._row_key = row_key
        self._start = None
        self._stop = None
        self._prefix: str | None = None
        self._filters: tuple[Column, ...] = ()
        self._columns: tuple[str, ...] = ()
        self._limit: int | None = None

    def _copy(self) -> "Scan":
        s = Scan(self._df, self._row_key)
        s._start, s._stop, s._prefix = self._start, self._stop, self._prefix
        s._filters, s._columns, s._limit = self._filters, self._columns, self._limit
        return s

    def with_start_row(self, v) -> "Scan":
        """Inclusive range start on the row key (HBase withStartRow)."""
        s = self._copy()
        s._start = v
        return s

    def with_stop_row(self, v) -> "Scan":
        """EXCLUSIVE range stop on the row key (HBase withStopRow)."""
        s = self._copy()
        s._stop = v
        return s

    def with_prefix(self, prefix: str) -> "Scan":
        """Row-key string prefix (HBase PrefixFilter)."""
        s = self._copy()
        s._prefix = prefix
        return s

    def add_columns(self, *cols: str) -> "Scan":
        """Projection (HBase addColumn); empty = full row."""
        s = self._copy()
        s._columns = s._columns + cols
        return s

    def with_filter(self, cond: Column) -> "Scan":
        """Value filter (HBase SingleColumnValueFilter and friends);
        multiple calls AND together, like a FilterList(MUST_PASS_ALL)."""
        s = self._copy()
        s._filters = s._filters + (cond,)
        return s

    def with_limit(self, n: int) -> "Scan":
        """Result cap (HBase setLimit); combined with a row-key sort so
        the page is DETERMINISTIC, not scan-order-dependent."""
        s = self._copy()
        s._limit = n
        return s

    def with_time_range(self, ts_col: str, min_ts: str, max_ts: str) -> "Scan":
        """HBase ``Scan.setTimeRange(minStamp, maxStamp)``: keep cells
        whose timestamp falls in [min, max) — min inclusive, max
        exclusive, like the HBase API.  Composes as two more pushable
        value filters, so it costs nothing beyond the scan it narrows."""
        return self.with_filter(
            (F.col(ts_col) >= F.lit(min_ts).cast("timestamp"))
            & (F.col(ts_col) < F.lit(max_ts).cast("timestamp"))
        )

    def to_df(self) -> DataFrame:
        """Compile to a DataFrame — no execution, no RDDs: range and
        value predicates become pushable filters, the projection prunes
        the parquet ReadSchema, and a limited scan sorts on the row key
        first (total order -> stable page)."""
        df = self._df
        key = F.col(self._row_key)
        if self._start is not None:
            df = df.filter(key >= self._start)
        if self._stop is not None:
            df = df.filter(key < self._stop)
        if self._prefix is not None:
            df = df.filter(key.startswith(self._prefix))
        for cond in self._filters:
            df = df.filter(cond)
        if self._columns:
            df = df.select(*self._columns)
        if self._limit is not None:
            df = df.orderBy(self._row_key).limit(self._limit)
        return df

    def read_versions(
        self,
        n: int,
        *,
        ts_col: str,
        qualifier_cols: list[str],
        tiebreak_col: str,
    ) -> DataFrame:
        """HBase ``Scan.readVersions(n)``: the n NEWEST versions of each
        cell, where a cell is (row key, qualifier) and versions order by
        the timestamp column (ties broken by ``tiebreak_col`` so the
        result is total-ordered and deterministic).  Emits the scan's
        rows plus a ``version`` rank (1 = newest).

        Spark shape (SURVEY.md §1.1): one window ``row_number`` over
        (key, qualifiers) — a single shuffle on the cell identity; at
        100 TB this is the same partitioning a later per-cell
        aggregation would need anyway."""
        from pyspark.sql import Window

        w = Window.partitionBy(self._row_key, *qualifier_cols).orderBy(
            F.col(ts_col).desc(), F.col(tiebreak_col).desc()
        )
        df = self.to_df().withColumn("version", F.row_number().over(w))
        return df.filter(F.col("version") <= n)

    # -- job helpers: the TableMapReduceUtil analog ------------------

    def group_count(self, *group_cols: str) -> DataFrame:
        """RowCounter-per-group: scan -> partial+final count aggregate."""
        return self.to_df().groupBy(*group_cols).agg(F.count("*").alias("cnt"))

    def group_agg(self, group_cols: list[str], **aggs: Column) -> DataFrame:
        """Named aggregates over the scan (aliased by kwarg name), e.g.
        ``scan.group_agg(["lang"], n=F.count("*"), toks=F.sum("n"))``."""
        return self.to_df().groupBy(*group_cols).agg(
            *[c.alias(name) for name, c in aggs.items()]
        )


class Table:
    """Entry point a reference user maps their table handle onto."""

    def __init__(self, spark: SparkSession, sf_dir: str, name: str, *, row_key: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self.name = name
        self.row_key = row_key

    def scan(self) -> Scan:
        return Scan(load_table(self._spark, self._sf_dir, self.name), self.row_key)

    def get(self, *row_keys) -> Scan:
        """Batch Get (HBase ``Table.get(List<Get>)``): N point lookups
        compiled to ONE ``IN``-filtered scan — not N driver round trips.
        The IN list reaches the parquet scan as a pushed filter, so
        row-group min/max stats skip everything outside the requested
        keys; on a sorted/bucketed 100 TB layout that reads a handful of
        row groups instead of the table.  Returns a :class:`Scan` so
        projection (``addColumn``) composes like any other scan."""
        return self.scan().with_filter(F.col(self.row_key).isin(list(row_keys)))


@query(
    "x_cell_versions",
    category="scan",
    oracle=(
        "WITH mx AS (SELECT MAX(ts) AS m FROM events), "
        "live AS (SELECT e.user_id, e.event_type, e.ts, e.event_id, e.value "
        "         FROM events e, mx WHERE e.ts >= mx.m - INTERVAL 7 DAY), "
        "v AS (SELECT user_id, event_type, "
        "      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, value, "
        "      row_number() OVER (PARTITION BY user_id, event_type "
        "                         ORDER BY ts DESC, event_id DESC) AS version "
        "      FROM live) "
        "SELECT user_id, event_type, version, ts_us, event_id, value "
        "FROM v WHERE version <= 3"
    ),
)
def cell_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase cell semantics end-to-end (SURVEY.md §1.1): cells are
    (row key = user_id, qualifier = event_type, ts, value); a 7-day TTL
    drops expired versions (cutoff anchored to MAX(ts), so the result
    is deterministic on a static corpus — a live deployment anchors to
    the wall clock exactly as HBase does); ``readVersions(3)`` keeps
    the 3 newest surviving versions per cell, ranked.

    The TTL cutoff is a 1-row broadcast scalar (same whitelisted
    pattern as stream_late_data's watermark anchor); the version rank
    is one window over the cell identity."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cut"))
    live = ev.crossJoin(F.broadcast(cutoff)).filter(F.col("ts") >= F.col("cut"))
    return (
        Scan(live, "user_id")
        .add_columns("user_id", "event_type", "ts", "event_id", "value")
        .read_versions(3, ts_col="ts", qualifier_cols=["event_type"], tiebreak_col="event_id")
        .select(
            "user_id",
            "event_type",
            "version",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_id",
            "value",
        )
    )


@query(
    "x_client_scan",
    category="scan",
    oracle=(
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "WHERE o_orderkey >= 1000 AND o_orderkey < 20000 "
        "AND o_totalprice > 150000.0 "
        "ORDER BY o_orderkey LIMIT 200"
    ),
)
def client_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The client surface end-to-end under the driver's oracle: a
    range + value-filter + projection + limited scan built through the
    fluent API compiles to the same pushed-down plan as hand-written
    DataFrame code (plan equality asserted in tests/test_client.py)."""
    return (
        Table(spark, sf_dir, "orders", row_key="o_orderkey")
        .scan()
        .with_start_row(1000)
        .with_stop_row(20000)
        .with_filter(F.col("o_totalprice") > 150000.0)
        .add_columns("o_orderkey", "o_orderpriority", "o_totalprice")
        .with_limit(200)
        .to_df()
    )


@query(
    "x_client_get",
    category="scan",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice "
        "FROM orders WHERE o_orderkey IN (1, 7, 500, 1000, 2500, 9999, 14999)"
    ),
)
def client_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genre's other read path: batch point Gets.  Seven keys become
    one IN-filtered, column-pruned scan (pushdown asserted in
    tests/test_client.py) — the Spark analog of HBase's multiget RPC
    batching, with row-group stats standing in for the block index."""
    return (
        Table(spark, sf_dir, "orders", row_key="o_orderkey")
        .get(1, 7, 500, 1000, 2500, 9999, 14999)
        .add_columns("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .to_df()
    )


class Mutation:
    """The genre's write path on the same declarative footing: HBase
    ``checkAndPut`` (per-row conditional update) and ``Delete`` are
    per-row decisions, so they compile to ``when``/``filter`` —
    a projection, not a join, and never a driver round trip."""

    def __init__(self, df: DataFrame):
        self._df = df

    def delete_where(self, cond: Column) -> "Mutation":
        """HBase Delete-by-filter: rows matching cond disappear from
        the post-mutation snapshot."""
        return Mutation(self._df.filter(~cond))

    def check_and_put(self, check: Column, **sets: Column) -> "Mutation":
        """HBase checkAndPut: where `check` holds, apply the column
        assignments; elsewhere the row is untouched.  Multiple calls
        chain like a batched RPC."""
        df = self._df
        for col, val in sets.items():
            df = df.withColumn(col, F.when(check, val).otherwise(F.col(col)))
        return Mutation(df)

    def increment(
        self,
        key: str,
        deltas: DataFrame,
        delta_col: str,
        target: str,
    ) -> "Mutation":
        """HBase ``Increment`` batched: fold a (key, delta) stream into
        the counter column ``target`` — counter += SUM(deltas) per key.
        HBase does one atomic RPC per increment; the batch equivalent
        is ONE aggregate of the delta stream + ONE left join against
        the base (broadcast when the touched-key set is small), so a
        billion increments against a counter table cost two shuffles
        total, not a billion round trips.  Rows with no deltas keep
        their counter (left join + coalesce 0)."""
        agg = deltas.groupBy(key).agg(F.sum(delta_col).alias("__inc"))
        df = self._df.join(agg, key, "left").withColumn(
            target,
            F.col(target) + F.coalesce(F.col("__inc"), F.lit(0).cast("long")),
        ).drop("__inc")
        return Mutation(df)

    def append(
        self,
        key: str,
        deltas: DataFrame,
        delta_col: str,
        order_cols: list[str],
        target: str,
    ) -> "Mutation":
        """HBase ``Append`` batched: concatenate an ORDERED stream of
        string deltas onto the value column ``target`` — HBase appends
        are ordered by the region server's arrival order; the batch
        equivalent makes that order explicit (``order_cols``), so the
        fold is deterministic under any partitioning.  One aggregate
        of the delta stream (sort_array over (order, delta) structs ->
        the arrival-ordered concat) + one left join against the base —
        the same two-shuffle budget as :meth:`increment`, for the
        genre's audit-log / event-trail column family.

        ``order_cols`` MUST totally order each key's deltas.  The sort
        struct is ``(*order_cols, delta_col)``, so if two deltas of a
        key tie on every order column, the delta VALUE becomes the
        final tiebreaker: Spark's result is then deterministic-by-
        delta, while an engine-side ``string_agg(... ORDER BY
        order_cols)`` (the x_client_append oracle pattern) leaves tie
        order unspecified — a latent cross-engine divergence.  The
        shipped key's ``(ts_us, event_id)`` is total; callers adding
        keys must either guarantee the same or accept value-order
        ties."""
        agg = deltas.groupBy(key).agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(*order_cols, delta_col))
                    ),
                    lambda s: s[delta_col],
                ),
                "",
            ).alias("__app")
        )
        # HBase Append's primary case is a not-yet-existing cell —
        # a NULL target must behave as '', not poison the concat
        df = self._df.join(agg, key, "left").withColumn(
            target,
            F.concat(
                F.coalesce(F.col(target), F.lit("")),
                F.coalesce(F.col("__app"), F.lit("")),
            ),
        ).drop("__app")
        return Mutation(df)

    def snapshot(self) -> DataFrame:
        return self._df


@query(
    "x_client_mutate",
    category="scan",
    oracle=(
        "WITH m AS ("
        "  SELECT o_orderkey, o_orderstatus, "
        "  CASE WHEN o_orderstatus = 'O' AND o_totalprice > 200000.0 "
        "       THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority, "
        "  CASE WHEN o_orderstatus = 'O' AND o_totalprice > 200000.0 "
        "       THEN CAST(CAST(o_totalprice * 1.02 AS DECIMAL(18,6)) AS DOUBLE) "
        "       ELSE o_totalprice END AS o_totalprice "
        "  FROM orders WHERE NOT o_orderstatus = 'P') "
        "SELECT o_orderpriority, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price "
        "FROM m GROUP BY o_orderpriority"
    ),
)
def client_mutate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write path end-to-end: Delete-by-filter drops 'P' orders,
    checkAndPut escalates big open orders (priority + a 2% surcharge),
    and the post-mutation snapshot is aggregated — all one declarative
    plan (filter + conditional projection + hash aggregate); HBase does
    N conditional RPCs, Spark does zero."""
    base = Table(spark, sf_dir, "orders", row_key="o_orderkey").scan().to_df()
    check = (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000.0)
    snap = (
        Mutation(base)
        .delete_where(F.col("o_orderstatus") == "P")
        .check_and_put(
            check,
            o_orderpriority=F.lit("1-URGENT"),
            o_totalprice=(F.col("o_totalprice") * 1.02).cast("decimal(18,6)").cast("double"),
        )
        .snapshot()
    )
    return snap.groupBy("o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
    )


@query(
    "x_client_increment",
    category="scan",
    oracle=(
        "WITH base AS (SELECT c_custkey, c_mktsegment, "
        "  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) "
        "    AS counter_cents FROM customer), "
        "inc AS (SELECT user_id AS c_custkey, "
        "  CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS d "
        "  FROM events WHERE event_type = 'purchase' GROUP BY 1), "
        "snap AS (SELECT b.c_mktsegment, "
        "  b.counter_cents + COALESCE(i.d, 0) AS counter_cents, "
        "  CASE WHEN i.d IS NOT NULL THEN 1 ELSE 0 END AS touched "
        "  FROM base b LEFT JOIN inc i USING (c_custkey)) "
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "  CAST(SUM(touched) AS BIGINT) AS n_touched, "
        "  CAST(SUM(counter_cents) AS BIGINT) AS sum_counter_cents "
        "FROM snap GROUP BY 1"
    ),
)
def client_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase ``Increment`` end-to-end: purchase events fold into each
    customer's balance counter as exact cents (counter += sum of that
    user's purchase values), then the post-mutation snapshot aggregates
    per market segment with a touched-row census — the clickstream
    counter-table pattern that is one-RPC-per-event in HBase and two
    shuffles TOTAL here (delta aggregate + fold join).  Completes the
    client mutation surface: Delete + checkAndPut (x_client_mutate)
    were projections; Increment is the one genre mutation that is
    genuinely a join, and the delta side arrives pre-aggregated to one
    row per touched key so the join is broadcast-able whenever the
    touched-key set is.  Money is exact integer cents end-to-end
    (DECIMAL(18,2)*100 on both engines) — no float drift in a counter
    that compounds."""
    base = (
        Table(spark, sf_dir, "customer", row_key="c_custkey")
        .scan()
        .add_columns("c_custkey", "c_mktsegment", "c_acctbal")
        .to_df()
        .select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("counter_cents"),
        )
    )
    # Pre-aggregate the delta stream ONCE: the fold inside increment()
    # and the touched census both consume this one-row-per-key frame,
    # so the events table is scanned a single time (increment()'s
    # internal re-aggregate over it is a no-op-sized pass).
    inc = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("c_custkey"),
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("delta"),
        )
        .groupBy("c_custkey")
        .agg(F.sum("delta").alias("d"))
        .localCheckpoint(eager=False)
    )
    snap = (
        Mutation(base)
        .increment("c_custkey", inc, "d", "counter_cents")
        .snapshot()
    )
    # touched = the aggregated delta is non-NULL (a user whose only
    # purchase values are all NULL has d = NULL and counts UNtouched —
    # exactly the oracle's CASE WHEN i.d IS NOT NULL; keying on raw
    # row existence instead would diverge the engines on NULL values)
    inc_keys = inc.filter(F.col("d").isNotNull()).select(
        "c_custkey", F.lit(1).alias("touched")
    )
    return (
        snap.join(F.broadcast(inc_keys), "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.coalesce(F.col("touched"), F.lit(0)))
            .cast("long")
            .alias("n_touched"),
            F.sum("counter_cents").cast("long").alias("sum_counter_cents"),
        )
    )


@query(
    "x_client_scan_timerange",
    category="scan",
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_cents "
        "FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-20 00:00:00' "
        "AND event_type IN ('click', 'purchase') "
        "GROUP BY event_type"
    ),
)
def client_scan_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last piece of the genre's Scan API surface: setTimeRange.
    A ten-day [min, max) window plus a qualifier filter, built through
    the fluent Scan, feeding the TableMapReduceUtil-style group_agg —
    per-type event count, distinct users, and exact-cents value total.
    Time bounds are literal timestamps (the HBase API takes epoch
    longs), applied as ordinary pushable predicates: one scan, one
    partial+final aggregate, and the distinct-count shuffles only the
    ten-day slice the range kept.

    Money is exact integer cents end-to-end (DECIMAL(18,2)*100 on both
    engines); the timestamp literals parse identically under the UTC
    session the catalog pins."""
    return (
        Table(spark, sf_dir, "events", row_key="event_id")
        .scan()
        .with_time_range("ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00")
        .with_filter(F.col("event_type").isin("click", "purchase"))
        .group_agg(
            ["event_type"],
            n_events=F.count("*").cast("long"),
            n_users=F.countDistinct("user_id").cast("long"),
            sum_cents=F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).cast("long"),
        )
    )


@query(
    "x_client_append",
    category="scan",
    oracle=(
        "WITH d AS (SELECT user_id AS c_custkey, "
        "  substr(event_type, 1, 1) AS tag, "
        "  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id "
        "  FROM events WHERE event_type IN ('click', 'purchase', 'view')), "
        "a AS (SELECT c_custkey, "
        "  string_agg(tag, '' ORDER BY ts_us, event_id) AS app "
        "  FROM d GROUP BY 1) "
        "SELECT c.c_custkey, c.c_mktsegment, "
        "  COALESCE(a.app, '') AS event_trail, "
        "  CAST(length(COALESCE(a.app, '')) AS BIGINT) AS trail_len "
        "FROM customer c LEFT JOIN a USING (c_custkey)"
    ),
)
def client_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase ``Append`` end-to-end — the last mutation type in the
    client surface (Put/Delete via check_and_put/delete_where,
    Increment via x_client_increment; Append is the audit-trail
    mutation): each customer's event-trail column accumulates one tag
    character per click/view/purchase IN EVENT-TIME ORDER.  HBase
    orders appends by server arrival; the batch fold pins that order
    explicitly on (ts, event_id), so the trail string is deterministic
    under any partitioning — the struct-sorted collect_list makes
    arrival order irrelevant, the same discipline as x_session_paths.

    Scale shape: ONE delta aggregate (per-key, map-side partials
    combine the structs) + ONE left join against the base table — a
    billion appends cost two shuffles, not a billion RPCs; trail
    length is bounded by per-key event counts, the same bound the
    HBase cell would carry."""
    base = (
        Table(spark, sf_dir, "customer", row_key="c_custkey")
        .scan()
        .add_columns("c_custkey", "c_mktsegment")
        .to_df()
        .withColumn("event_trail", F.lit(""))
    )
    deltas = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase", "view"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.substring("event_type", 1, 1).alias("tag"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_id",
        )
    )
    snap = (
        Mutation(base)
        .append(
            "c_custkey", deltas, "tag", ["ts_us", "event_id"], "event_trail"
        )
        .snapshot()
    )
    return snap.select(
        "c_custkey",
        "c_mktsegment",
        "event_trail",
        F.length("event_trail").cast("long").alias("trail_len"),
    )
