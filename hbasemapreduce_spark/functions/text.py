"""Text-analysis building blocks for the LLM-data-pipeline operators
(SURVEY.md §2.9, BASELINE.json:6 north-star).

Everything here is pure pyspark.sql.functions (JVM-side, codegen'd),
with ONE deliberate Arrow exception: winnow_fingerprint_rows (see its
docstring — interpreted HOFs made the JVM form O(grams x w)).  Token
streams are arrays; exploding is deferred to the aggregation that
needs it.
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


def winnow_fingerprint_rows(
    df, id_col: str = "doc_id", text_col: str = "text", out_col: str = "fp", *, k: int = 8, w: int = 16
):
    """(id, fp) rows of winnowing fingerprints via Arrow ``mapInPandas``
    — semantically identical to exploding :func:`winnow_fingerprints`
    (equivalence is property-tested), but O(grams) instead of the HOF
    form's O(grams x w): Spark's higher-order functions are interpreted
    (never whole-stage-codegen'd), so the w=16 re-scan per window
    dominated the whole bench (7 s of an ~80 s 100-query run at sf0.1).
    Here the per-window min is a classic monotonic deque — each gram
    enters and leaves the deque once — and the md5/deque loop runs in
    CPython at Arrow batch granularity.

    This is the one deliberate exception to the "no Python outside
    udx/multimodal" plan gate (tests/test_plans.py pins it): the
    semantics ARE expressible in JVM HOFs, but not at a tolerable
    constant; a running-min ``aggregate()`` reformulation cannot beat
    O(grams x w) either, because building prefix-min ARRAYS with
    ``aggregate`` is quadratic in array-concat work.

    Scale shape: per-row compute only — no shuffle introduced, no
    state across rows; partitions stream through Arrow batches, so the
    100 TB story is identical to the HOF form's.
    """
    from hashlib import md5 as _md5

    from pyspark.sql.types import StringType, StructField, StructType

    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(out_col, StringType(), False),
        ]
    )
    min_len = k + w - 1

    def emit(batches):
        import pandas as pd

        from collections import deque

        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                if not isinstance(t, str) or len(t) < min_len:
                    continue  # HOF form yields an empty array here
                grams = [
                    _md5(t[i : i + k].encode("utf-8")).hexdigest()
                    for i in range(len(t) - k + 1)
                ]
                # monotonic deque: front index always holds the window
                # min; ties keep the earliest index (same VALUE either
                # way, and only the value is emitted)
                dq: deque = deque()
                seen: dict = {}  # insertion-ordered distinct
                for j, g in enumerate(grams):
                    while dq and grams[dq[-1]] > g:
                        dq.pop()
                    dq.append(j)
                    if dq[0] <= j - w:
                        dq.popleft()
                    if j >= w - 1:
                        seen[grams[dq[0]]] = None
                ids.extend([doc_id] * len(seen))
                fps.extend(seen)
            yield pd.DataFrame({id_col: ids, out_col: fps})

    return df.select(id_col, text_col).mapInPandas(emit, schema)
