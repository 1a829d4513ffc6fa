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
    _CONTRACT_REFRESH,
    _R5_WINDOW,
    _R6_BACKLOG,
    _R6_WINDOW,
    _R7_BACKLOG,
    _R7_WINDOW,
    _R8_BACKLOG,
    _R8_WINDOW,
    _R9_BACKLOG,
    _R9_WINDOW,
    _R10_WINDOW,
    CONTRACT_KEYS,
    all_specs,
)

DRIVER_WINDOW = 50

_REPO = pathlib.Path(__file__).resolve().parent.parent


def _driver_checked_keys(before_round: int | None = None) -> set[str]:
    """Union of keys with driver correctness evidence, all rounds so far.

    Globs CORRECTNESS_r*.json (two-digit rounds included).  Pass
    ``before_round`` to bound the evidence at a rotation point: the
    "window keys are first-timers" invariants are statements about the
    evidence AT STAGING TIME, so they must not be falsified the moment
    the current round's own artifact lands (the r7 failure mode —
    ADVICE r7 item 4)."""
    keys: set[str] = set()
    for p in _REPO.glob("CORRECTNESS_r*.json"):
        if before_round is not None and int(p.stem.split("_r")[1]) >= before_round:
            continue
        keys |= set(json.loads(p.read_text()).keys())
    return keys


def test_contract_is_60_keys():
    assert len(_CONTRACT_PRIORITY) == 60
    assert len(CONTRACT_KEYS) == 60  # no duplicates


def test_all_contract_keys_registered():
    assert CONTRACT_KEYS <= set(all_specs())


def test_r9_window_is_pinned_exactly():
    # VERDICT r8 item 1: the r9 window is the plan staged at the end of
    # r8 — the first 50 _R8_BACKLOG entries, promoted verbatim now that
    # CORRECTNESS_r08.json landed green.  (The [:50] truncation never
    # reaches _CONTRACT_REFRESH because _R8_BACKLOG holds 57 keys, so
    # the r8-era pre-validation of exactly this membership still holds.)
    assert _R9_WINDOW == _R8_BACKLOG[:DRIVER_WINDOW]
    assert len(_R9_WINDOW) == DRIVER_WINDOW
    assert len(set(_R9_WINDOW)) == DRIVER_WINDOW
    assert list(all_specs())[:DRIVER_WINDOW] == _R9_WINDOW


def test_r9_window_keys_never_driver_checked():
    # Every r9 slot is spent on a first-timer: no key in the window had
    # evidence in any artifact landed BEFORE the rotation (r1-r4,
    # r6-r8; r5 never landed).  Bounded at round 9 so the r9 artifact
    # itself cannot falsify this staging-time statement.
    assert not (set(_R9_WINDOW) & _driver_checked_keys(before_round=9))


def test_r8_window_keys_never_driver_checked():
    # Historical staging-time statement for the r8 rotation, bounded at
    # round 8 (the r8 artifact that later covered them does not count).
    assert not (set(_R8_WINDOW) & _driver_checked_keys(before_round=8))


def test_r8_window_now_driver_checked():
    # Rotation precondition: the keys that just rotated OUT did so
    # because the r8 driver artifact landed and covered all of them.
    assert set(_R8_WINDOW) <= _driver_checked_keys()
    assert set(_R7_WINDOW) <= _driver_checked_keys()


def test_r9_backlog_keys_follow_r9_window():
    # Hedge for a missing/late r9 driver artifact: the never-checked
    # backlog keys occupy emission positions 51+ so they are the first
    # keys a larger-than-50 driver window (or a re-run) would pick up.
    specs = list(all_specs())
    assert specs[DRIVER_WINDOW : DRIVER_WINDOW + len(_R9_BACKLOG)] == _R9_BACKLOG


def test_rotation_plan_covers_all_unchecked():
    # (r9 window ∪ r9 backlog) must equal the full set of keys without
    # pre-rotation driver evidence — nothing silently dropped.  New
    # keys added during round 9 must be appended to _R9_BACKLOG to keep
    # this invariant.  Bounded at round 9 (staging-time statement).
    unchecked = set(all_specs()) - _driver_checked_keys(before_round=9)
    assert unchecked == set(_R9_WINDOW) | set(_R9_BACKLOG)
    assert not (set(_R9_WINDOW) & set(_R9_BACKLOG))


def test_r10_window_is_staged():
    # VERDICT r8 item 4: the r10 plan ships in the same commit as the
    # r9 rotation.  The staged window = the remaining first-timers
    # (_R9_BACKLOG — 14 once the round-9 additions landed) + the
    # leading contract-refresh keys filling to 50 (oldest driver
    # evidence first, rows-only keys last), and emission positions
    # 51..100 are exactly that list, so an early/oversized driver run
    # needs no further rotation edit.
    assert len(_R10_WINDOW) == DRIVER_WINDOW
    assert _R10_WINDOW == [*_R9_BACKLOG, *_CONTRACT_REFRESH][:DRIVER_WINDOW]
    specs = list(all_specs())
    assert specs[DRIVER_WINDOW : 2 * DRIVER_WINDOW] == _R10_WINDOW


def test_contract_refresh_order_matches_artifacts():
    # _CONTRACT_REFRESH is all 60 contract keys, ordered
    # oldest-driver-evidence-first (ties broken by _CONTRACT_PRIORITY
    # position), EXCEPT the two rows-only-by-design keys which sort
    # last regardless of evidence age (VERDICT r8 item 7: window slots
    # go to hash-checkable keys first; dedup_minhash and
    # agg_approx_distinct get only the weaker rows check, and their
    # value evidence lives in full-hash portable twins).  Re-derived
    # here from the artifacts the list was staged against (rounds <= 7,
    # frozen so a future artifact that re-checks contract keys cannot
    # falsify this pin at landing time; the list itself is re-derived
    # at the next refresh rotation).
    assert sorted(_CONTRACT_REFRESH) == sorted(_CONTRACT_PRIORITY)
    rows_only = {"dedup_minhash", "agg_approx_distinct"}
    specs = all_specs()
    assert all(specs[k].oracle is None for k in rows_only)
    latest: dict[str, int] = {}
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        if rnd > 7:
            continue
        for k in json.loads(p.read_text()):
            latest[k] = max(latest.get(k, 0), rnd)
    expected = sorted(
        _CONTRACT_PRIORITY,
        key=lambda k: (
            k in rows_only,
            latest.get(k, 0),
            _CONTRACT_PRIORITY.index(k),
        ),
    )
    assert _CONTRACT_REFRESH == expected


def test_r9_window_oracles():
    # VERDICT r8 item 7: every r9 slot carries a full-hash oracle — no
    # rows-only keys in window fronts until the first-timer backlog
    # drains.  (The r10 window inherits this via the contract-refresh
    # reorder, pinned above.)
    specs = all_specs()
    assert [k for k in _R9_WINDOW if specs[k].oracle is None] == []
    assert [k for k in _R10_WINDOW if specs[k].oracle is None] == []


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


def test_r8_window_oracles():
    # Every r8 slot carries a full-hash oracle except the three
    # rows-only-by-design sketch keys (seed-dependent bucket/sketch
    # membership — each has a full-hash portable twin already
    # driver-checked: x_agg_distinct_kmv r7, x_dedup_simhash_portable
    # r6, x_agg_sketch_cms_portable r7).
    specs = all_specs()
    missing = [k for k in _R8_WINDOW if specs[k].oracle is None]
    assert missing == ["x_agg_sketch_hll", "x_dedup_simhash", "x_agg_sketch_cms"]


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
