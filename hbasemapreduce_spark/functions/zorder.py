"""Z-order (Morton) interleaving for multi-dimensional data skipping.

A 100 TB table queried by EITHER of two keys can't be range-sorted for
both — but sorting by the bit-interleaved Z-value keeps every output
file tight in BOTH dimensions at once, so parquet row-group min/max
stats skip files for predicates on either key (the technique behind
Delta/Iceberg OPTIMIZE ZORDER; public literature: Morton 1966).

Interleaving RAW key bits fails when the keys have unequal magnitudes:
the wider key's high bits monopolize the top of the z-value and the
curve degenerates to a plain sort on that key (measured here —
l_orderkey's ~3 extra bits made per-file l_partkey spans full-width).
So both keys are first NORMALIZED to a common 16-bit space with exact
integer arithmetic:

    k' = ((k - min) * 65535) DIV max(max - min, 1)

min/max come from a 1-row broadcast aggregate (no collect), and the
division is INTEGER division on both engines (Spark ``DIV``, DuckDB
``//``) — float floor(a/b) can round up across an integer boundary and
is not used.  The interleave itself is generated from one bit loop for
both engines, so they agree by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZBITS = 16  # per-key bits AFTER normalization; z < 2^32
ZMAX = (1 << ZBITS) - 1


def normalize(col: str, mn: str, mx: str) -> Column:
    """Exact-integer rescale of `col` into [0, ZMAX] given min/max
    columns (from a broadcast 1-row aggregate)."""
    return F.expr(
        f"CAST((({col} - {mn}) * {ZMAX}) DIV GREATEST({mx} - {mn}, 1) AS BIGINT)"
    )


def normalize_sql(col: str, mn: str, mx: str) -> str:
    """DuckDB twin of :func:`normalize` (`//` = integer division)."""
    return f"CAST((({col} - {mn}) * {ZMAX}) // GREATEST({mx} - {mn}, 1) AS BIGINT)"


def z_value(a: Column, b: Column) -> Column:
    """Interleave the low ZBITS bits of two normalized integer columns:
    bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1."""
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def z_value_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`z_value` — same loop, same bit layout."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
