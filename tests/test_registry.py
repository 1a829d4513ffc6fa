"""Registry ordering guards (VERDICT r1 item 7, r2 items 1/3/7, r3 item
6, r4 item 1).

The driver's CORRECTNESS check covers exactly the FIRST 50 keys of
``queries()`` in emission order (proven in r2: CORRECTNESS_r02's key set
equals the r2 registry's first 50).  Emission order is therefore part of
the contract surface, and the intended r5 window is pinned here exactly
so no future registration can reshuffle it.

Also hosts the all-keys plan-analysis smoke gate (VERDICT r3 item 3):
round 3 shipped a plan-time AnalysisException (`x_cell_versions`) that
the ~9-minute oracle suite would have caught but a quick pre-commit run
did not.  ``test_every_registered_key_analyzes`` forces Catalyst analysis
of every registered DataFrame at sf0.001 in seconds — no execution — so
any plan-time failure in ANY key fails fast and locally.
"""

from __future__ import annotations

import json
import pathlib

from hbasemapreduce_spark.registry import (
    _CONTRACT_PRIORITY,
    _R5_WINDOW,
    _R6_BACKLOG,
    CONTRACT_KEYS,
    all_specs,
)

DRIVER_WINDOW = 50

_REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_checked_keys() -> set[str]:
    """Union of keys with driver correctness evidence, rounds 1-4."""
    keys: set[str] = set()
    for r in (1, 2, 3, 4):
        p = _REPO / f"CORRECTNESS_r0{r}.json"
        keys |= set(json.loads(p.read_text()).keys())
    return keys


def test_contract_is_60_keys():
    assert len(_CONTRACT_PRIORITY) == 60
    assert len(CONTRACT_KEYS) == 60  # no duplicates


def test_all_contract_keys_registered():
    assert CONTRACT_KEYS <= set(all_specs())


def test_r5_window_is_pinned_exactly():
    assert len(_R5_WINDOW) == DRIVER_WINDOW
    assert len(set(_R5_WINDOW)) == DRIVER_WINDOW
    assert list(all_specs())[:DRIVER_WINDOW] == _R5_WINDOW


def test_r5_window_keys_never_driver_checked():
    # VERDICT r4 item 1: every r5 slot is spent on a key with NO prior
    # driver evidence (all 60 contract keys are r3/r4-green, so none
    # need a slot).  x_sim_knn_graph_ivf is the r5-built scale variant.
    assert not (set(_R5_WINDOW) & _driver_checked_keys())


def test_r5_window_plus_backlog_covers_all_unchecked():
    # Window ∪ backlog must equal the full never-driver-checked set —
    # nothing silently dropped from the rotation plan.  New keys added
    # during round 5 (beyond x_sim_knn_graph_ivf) must be appended to
    # _R6_BACKLOG to keep this invariant.
    unchecked = set(all_specs()) - _driver_checked_keys()
    assert unchecked == set(_R5_WINDOW) | set(_R6_BACKLOG)
    assert not (set(_R5_WINDOW) & set(_R6_BACKLOG))


def test_out_of_window_contract_keys_are_fresh():
    # All 60 contract keys sit outside the r5 window; each must carry
    # r3-or-r4 driver evidence (they do — that's why they rotated out).
    specs = list(all_specs())
    out = [k for k in specs[DRIVER_WINDOW:] if k in CONTRACT_KEYS]
    assert len(out) == 60
    checked = _driver_checked_keys()
    assert all(k in checked for k in out)


def test_extras_sort_after_contract_even_if_driver_resorts():
    # Defense for an alphabetically-sorting driver: every beyond-contract
    # key carries the x_ prefix, which sorts after every contract key.
    keys = sorted(all_specs())
    assert all(k.startswith("x_") for k in keys[60:])
    assert not any(k.startswith("x_") for k in keys[:60])


def test_every_registered_key_analyzes(spark):
    """Plan-analysis smoke gate: force Catalyst analysis (schema
    resolution) of every registered key at sf0.001.  Catches any
    plan-time AnalysisException — like r3's `x_cell_versions`
    unix_micros-on-NTZ crash — in seconds, without executing a single
    job.  Schemas must also be non-empty: a query that resolves to zero
    columns is a registration bug."""
    import tests.conftest as c

    failures = []
    for key, spec in all_specs().items():
        try:
            schema = spec.fn(spark, c.SF_DIR).schema
            if len(schema.fields) == 0:
                failures.append(f"{key}: empty schema")
        except Exception as e:  # noqa: BLE001 — collect all, report together
            failures.append(f"{key}: {type(e).__name__}: {e}")
    assert not failures, "plan-analysis failures:\n" + "\n".join(failures)
