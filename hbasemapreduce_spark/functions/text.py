"""Text-analysis building blocks for the LLM-data-pipeline operators
(SURVEY.md §2.9, BASELINE.json:6 north-star).

Everything here is pure pyspark.sql.functions (JVM-side, codegen'd) —
no Python UDFs in any hot path.  Token streams are arrays; exploding is
deferred to the aggregation that needs it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def tokens(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_shingles(text: Column | str = "text", n: int = 3) -> Column:
    """n-token shingles as strings (MinHash input units)."""
    t = tokens(text)
    return F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 0)), "
        f"i -> array_join(slice(split(text, ' '), i, {n}), ' '))"
    )


def stopword_ratio(text: Column | str = "text") -> Column:
    t = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
    return n_stop / F.size(t)
