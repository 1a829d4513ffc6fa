"""Registry ordering guards (VERDICT r1 item 7, r2 items 1/3/7, r3 item
6, r4 item 1; r6 rotation continues the same discipline).

The driver's CORRECTNESS check covers exactly the FIRST 50 keys of
``queries()`` in emission order (proven in r2: CORRECTNESS_r02's key set
equals the r2 registry's first 50).  Emission order is therefore part of
the contract surface, and the intended r7 window is pinned here exactly
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
    _R6_WINDOW,
    _R7_BACKLOG,
    _R7_WINDOW,
    CONTRACT_KEYS,
    all_specs,
)

DRIVER_WINDOW = 50

_REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_checked_keys() -> set[str]:
    """Union of keys with driver correctness evidence, all rounds so far.

    Globs CORRECTNESS_r0*.json so the invariants below stay true both
    before and after the driver's r5 artifact lands (it had not yet at
    the start of round 6)."""
    keys: set[str] = set()
    for p in _REPO.glob("CORRECTNESS_r0*.json"):
        keys |= set(json.loads(p.read_text()).keys())
    return keys


def test_contract_is_60_keys():
    assert len(_CONTRACT_PRIORITY) == 60
    assert len(CONTRACT_KEYS) == 60  # no duplicates


def test_all_contract_keys_registered():
    assert CONTRACT_KEYS <= set(all_specs())


def test_r7_window_is_pinned_exactly():
    # VERDICT r6 item 2: the r7 window is the 50 _R5_WINDOW keys that
    # were skipped when the r5 driver artifacts never landed.
    assert _R7_WINDOW == _R5_WINDOW
    assert len(_R7_WINDOW) == DRIVER_WINDOW
    assert len(set(_R7_WINDOW)) == DRIVER_WINDOW
    assert list(all_specs())[:DRIVER_WINDOW] == _R7_WINDOW


def test_r7_window_keys_never_driver_checked():
    # Every r7 slot is spent on a first-timer: no key in the window has
    # evidence in ANY landed correctness artifact (r1-r4, r6; r5 never
    # landed — that is exactly why these keys rotate in).
    assert not (set(_R7_WINDOW) & _driver_checked_keys())


def test_r7_backlog_keys_follow_r7_window():
    # Hedge for a missing/late r7 driver artifact: the never-checked
    # backlog keys occupy emission positions 51+ so they are the first
    # keys a larger-than-50 driver window (or a re-run) would pick up.
    specs = list(all_specs())
    assert specs[DRIVER_WINDOW : DRIVER_WINDOW + len(_R7_BACKLOG)] == _R7_BACKLOG


def test_rotation_plan_covers_all_unchecked():
    # (r7 window ∪ r7 backlog) must equal the full set of keys without
    # driver evidence from any landed artifact — nothing silently
    # dropped.  New keys added during round 7 must be appended to
    # _R7_BACKLOG to keep this invariant.
    unchecked = set(all_specs()) - _driver_checked_keys()
    assert unchecked == set(_R7_WINDOW) | set(_R7_BACKLOG)
    assert not (set(_R7_WINDOW) & set(_R7_BACKLOG))


def test_r6_window_plus_r7_backlog_cover_r6_backlog():
    # Historical invariant: the r6 window + r7 backlog cover the r5
    # rotation's deferred set (_R6_BACKLOG) exactly once each — the
    # committed plan was followed.  (_R7_BACKLOG may additionally hold
    # keys first registered during rounds 6-7; those are outside
    # _R6_BACKLOG by construction.)
    assert set(_R6_BACKLOG) <= set(_R6_WINDOW) | set(_R7_BACKLOG)
    assert not (set(_R6_WINDOW) & set(_R7_BACKLOG))
    assert len(set(_R6_WINDOW) & set(_R6_BACKLOG)) + len(
        set(_R7_BACKLOG) & set(_R6_BACKLOG)
    ) == len(_R6_BACKLOG)


def test_r7_window_oracles():
    # Every r7 slot carries a full-hash oracle except x_sim_ann_lsh —
    # rows-only by design (SURVEY §2: LSH bucket membership is
    # seed-dependent), kept in the window because VERDICT r6 item 2
    # orders the _R5_WINDOW promoted verbatim.
    specs = all_specs()
    missing = [k for k in _R7_WINDOW if specs[k].oracle is None]
    assert missing == ["x_sim_ann_lsh"]


def test_out_of_window_contract_keys_are_fresh():
    # All 60 contract keys sit outside the r7 window; each must carry
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
