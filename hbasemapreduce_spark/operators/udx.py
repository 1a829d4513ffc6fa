"""§2.10 UDF / UDAF / UDTF surface.

The reference's entire "function surface" is arbitrary Java inside
mappers/reducers; our equivalents are Arrow-batched pandas UDFs
(Series->Series), grouped-map applyInPandas (the UDAF analog), and an
explode-based UDTF shape.  Built-ins everywhere else — these three keys
exist to prove the extension points, not as the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..registry import query


def _discounted_price_fn(price: pd.Series, discount: pd.Series) -> pd.Series:
    # Elementwise IEEE-754 ops — bit-identical to the SQL expression.
    return price * (1.0 - discount)


@query(
    "udf_scalar_pandas",
    category="udx",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS disc_price "
        "FROM lineitem"
    ),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Series->Series pandas UDF (Arrow batches, ~10-100x a
    row-at-a-time Python UDF; SNIPPETS.md pattern).

    The UDF is created lazily — pandas_udf needs an active session to
    parse its return type, and imports must stay session-free.
    """
    disc_price = pandas_udf(_discounted_price_fn, "double")
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # Integer-valued quantities sum exactly in float64 (all < 2**53),
    # so the result is order-independent and oracle-checkable.
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [len(pdf)],
            "sum_qty": [pdf["l_quantity"].sum()],
            "max_price": [pdf["l_extendedprice"].max()],
        }
    )


@query(
    "udaf_grouped_pandas",
    category="udx",
    oracle=(
        "SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty, "
        "MAX(l_extendedprice) AS max_price FROM lineitem GROUP BY l_returnflag"
    ),
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: the whole group arrives as one pandas
    DataFrame per key (shuffle on the group key, Arrow both ways)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            _group_stats,
            schema="l_returnflag string, n long, sum_qty double, max_price double",
        )
    )


@query(
    "udtf_explode_like",
    category="udx",
    oracle=(
        "SELECT ng, COUNT(*) AS cnt FROM ("
        "  SELECT substring(p_name, CAST(i AS INTEGER), 3) AS ng "
        "  FROM (SELECT p_name, unnest(range(1, length(p_name) - 1)) AS i "
        "        FROM part WHERE length(p_name) >= 3)"
        ") GROUP BY ng"
    ),
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row -> N-rows expansion: character trigrams of p_name.

    Expressed as explode(transform(sequence(...))) rather than a Python
    UDTF so the expansion stays JVM-side (SURVEY.md §2.10 prefers this
    for the oracle; a Spark 4 Python UDTF would be the escape hatch for
    logic arrays can't express).
    """
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.length("p_name") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(p_name) - 2), i -> substring(p_name, i, 3))"
                )
            ).alias("ng")
        )
        .groupBy("ng")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "x_udtf_python",
    category="udx",
    oracle=(
        "SELECT doc_id, unnest(range(len(string_split(text, ' ')))) AS pos, "
        "unnest(string_split(text, ' ')) AS token FROM documents"
    ),
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Spark 4 Python UDTF (table function class with eval()
    yielding rows) — the escape hatch for one-row -> N-rows logic that
    array expressions can't express.  Positional tokenization here so
    the oracle stays SQL-checkable (DuckDB zips parallel unnests).

    Scale note: Python UDTFs are row-at-a-time on the Python side —
    correct tool for complex per-row expansion, wrong tool for a hot
    path a builtin explode can serve (udtf_explode_like shows that
    preferred form).  Defined lazily: udtf() needs an active session.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: long, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("pipeline_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM _udtf_docs d, "
        "LATERAL pipeline_tokenize(d.text) t"
    )


def _clean_key_fn(s):
    # pure string normalization: strip + lower + collapse inner runs of
    # spaces — deterministic, no float involvement
    return " ".join(s.strip().lower().split())


@query(
    "x_udf_arrow",
    category="udx",
    oracle=(
        "SELECT p_partkey, "
        "  trim(regexp_replace(lower(p_name), ' +', ' ', 'g')) AS clean_name "
        "FROM part"
    ),
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's ARROW-OPTIMIZED Python UDF (``F.udf(useArrow=True)``)
    — the fourth extension point next to pandas_udf / applyInPandas /
    the Python UDTF: scalar Python semantics (row-at-a-time function
    body, no pandas in user code) but Arrow-batched transport, which
    removes most of the classic pickled-UDF serialization tax.  The
    function is pure string normalization, so the oracle reproduces it
    with regex SQL and the hash check proves the boundary crossing
    lossless.

    Scale note: still the slow path relative to built-ins (the body
    runs in Python per row) — this key exists to prove the surface,
    exactly like the other udx keys; the identical cleanup in
    production would be the oracle's regexp_replace expression,
    JVM-side."""
    clean = F.udf(_clean_key_fn, "string", useArrow=True)
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", clean("p_name").alias("clean_name")
    )
