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


def stopword_ratio(text: Column | str = "text") -> Column:
    t = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stops, x)))
    return n_stop / F.size(t)


def winnow_fingerprints(df, text_col: str = "text", out_col: str = "fps", *, k: int = 8, w: int = 16):
    """Add a winnowing-fingerprint array column (Schleimer et al.,
    SIGMOD'03): md5 each k-char gram, keep the min hash per w-gram
    window, distinct the survivors.  Shared substrings of >= k+w-1
    chars between two texts guarantee a shared fingerprint.

    The gram array is bound to a LAMBDA VARIABLE (transform over a
    1-element array) before the window pass reads it.  A lambda-bound
    value is an evaluation barrier: naming the array in a sibling
    projection instead lets Catalyst re-inline it into the per-window
    lambda (CollapseProject + generator pushdown), where Spark's
    interpreted higher-order functions re-hash every gram FOR EVERY
    WINDOW — measured 145 s vs ~4 s at sf0.001 for identical semantics.
    """
    # sequence(1, n) DESCENDS for n < 1 — both the gram pass and the
    # window pass need explicit empty guards
    hs = (
        f"CASE WHEN length({text_col}) < {k} THEN array() ELSE "
        f"transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> md5(substring({text_col}, i, {k}))) END"
    )
    wins = (
        f"element_at(transform(array({hs}), a -> "
        f"CASE WHEN size(a) < {w} THEN array() ELSE "
        f"array_distinct(transform(sequence(1, size(a) - {w - 1}), "
        f"j -> array_min(slice(a, j, {w})))) END), 1)"
    )
    return df.withColumn(out_col, F.expr(wins))
