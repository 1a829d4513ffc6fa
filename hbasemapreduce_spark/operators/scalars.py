"""§2.7 Scalar function families — one composite query per family.

Reference grounding (SURVEY.md §2.7): in HBase-MR all of this is
hand-written Java inside mappers (Bytes.toXxx + java.lang string/math);
here each family is a single JVM-side whole-stage-codegen'd projection.
All patterns chosen to behave identically in Java regex (Spark) and
RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


@query(
    "scalar_string",
    category="scalar",
    oracle=(
        "SELECT c_custkey, "
        "upper(c_mktsegment) AS seg_upper, "
        "substring(c_name, 1, 8) AS name_prefix, "
        "length(c_name) AS name_len, "
        "concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key, "
        "regexp_extract(c_name, '([0-9]+)', 1) AS name_digits "
        "FROM customer"
    ),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias("seg_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "scalar_date",
    category="scalar",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(year(o_orderdate) AS BIGINT) AS o_year, "
        "CAST(month(o_orderdate) AS BIGINT) AS o_month, "
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, "
        "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-09-02') AS BIGINT) AS days_to_cutoff "
        "FROM orders"
    ),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-09-02").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


@query(
    "scalar_math",
    category="scalar",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS revenue, "
        "abs(l_extendedprice - l_quantity * 1000) AS price_gap, "
        "CASE WHEN l_quantity <= 10 THEN 'low' WHEN l_quantity <= 30 THEN 'mid' "
        "ELSE 'high' END AS qty_bucket "
        "FROM lineitem"
    ),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("price_gap"),
        F.when(F.col("l_quantity") <= 10, "low")
        .when(F.col("l_quantity") <= 30, "mid")
        .otherwise("high")
        .alias("qty_bucket"),
    )


@query(
    "scalar_json",
    category="scalar",
    oracle=(
        "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket, "
        "COUNT(*) AS cnt "
        "FROM events GROUP BY 1"
    ),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + bucketing + aggregate in one plan."""
    return (
        load_table(spark, sf_dir, "events")
        .select((F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "scalar_array",
    category="scalar",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens, "
        "list_contains(string_split(text, ' '), 'spark') AS has_spark "
        "FROM documents"
    ),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "scalar_map",
    category="scalar",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS BIGINT) AS the_cnt "
        "FROM documents"
    ),
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a token->count map per doc, then look one token up.

    The map itself stays out of checked output (map iteration order is
    not hash-stable across engines — SURVEY.md §2.7); the looked-up
    value is deterministic.
    """
    toks = F.split("text", " ")
    tok_counts = F.map_from_entries(
        F.expr(
            "transform(array_distinct(split(text, ' ')), t -> "
            "struct(t AS key, size(filter(split(text, ' '), x -> x = t)) AS value))"
        )
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.element_at(tok_counts, "the"), F.lit(0)).cast("long").alias("the_cnt"),
    )


@query(
    "x_scalar_variant",
    category="scalar",
    oracle=(
        "WITH j AS (SELECT '{\"k\":' || CAST(o_orderkey AS VARCHAR) "
        "  || ',\"s\":\"' || o_orderstatus || '\"' "
        "  || ',\"cents\":' || CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) "
        "     * 100 AS BIGINT) AS VARCHAR) "
        "  || ',\"m\":null,\"tags\":[' || CAST(o_custkey % 10 AS VARCHAR) "
        "  || ',' || CAST(o_custkey % 7 AS VARCHAR) || ']}' AS js "
        "  FROM orders WHERE o_orderkey % 229 = 0) "
        "SELECT CAST(json_extract(js, '$.k') AS BIGINT) AS k_out, "
        "json_extract_string(js, '$.s') AS s_out, "
        "CAST(json_extract(js, '$.cents') AS BIGINT) AS cents_out, "
        "CAST(json_type(js, '$.m') = 'NULL' AS BIGINT) AS m_is_null, "
        "CAST(json_extract(js, '$.zz') AS BIGINT) AS missing_zz, "
        "CAST(json_extract(js, '$.tags[1]') AS BIGINT) AS tag1 "
        "FROM j"
    ),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT surface (parse_json / variant_get /
    try_variant_get / is_variant_null, new in 4.0) — scalar_json
    covers stringly get_json_object; this key proves the TYPED
    semi-structured path engines are converging on: each sampled order
    renders to a JSON document (explicit string concat, so both
    engines build byte-identical inputs), parses ONCE into a Variant
    value, and every downstream extraction is a typed variant_get
    against the parsed binary — no re-tokenizing per field, which is
    the entire point of the type at scale.  Covered semantics: typed
    paths ($.k bigint, $.s string), an array index ($.tags[1]), an
    explicit JSON null distinguished from absence (is_variant_null vs
    try_variant_get on a missing $.zz -> SQL NULL).

    The DuckDB oracle extracts the same paths from the same strings
    with its JSON functions — the values are engine-portable even
    though the Variant binary encoding is Spark's own.

    Scale shape: pure per-row projection, one parse + O(fields)
    binary-encoded lookups, whole-stage codegen, zero shuffles; the
    keyed sample (o_orderkey % 229) bounds checked output, not the
    plan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 229 == 0)
    js = F.concat(
        F.lit('{"k":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"s":"'),
        F.col("o_orderstatus"),
        F.lit('"'),
        F.lit(',"cents":'),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .cast("string"),
        F.lit(',"m":null,"tags":['),
        (F.col("o_custkey") % 10).cast("string"),
        F.lit(","),
        (F.col("o_custkey") % 7).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(js)
    return o.select(
        F.variant_get(v, "$.k", "bigint").alias("k_out"),
        F.variant_get(v, "$.s", "string").alias("s_out"),
        F.variant_get(v, "$.cents", "bigint").alias("cents_out"),
        F.is_variant_null(F.variant_get(v, "$.m", "variant"))
        .cast("long")
        .alias("m_is_null"),
        F.try_variant_get(v, "$.zz", "bigint").alias("missing_zz"),
        F.variant_get(v, "$.tags[1]", "bigint").alias("tag1"),
    )
