"""SURVEY.md §2 inventory-count pin (VERDICT r7 item 6).

The §2 header's beyond-contract count drifted twice (r6: "+90" while the
registry held 110; r7: "+110" vs 227) because it was hand-maintained.
This test derives the number stated in SURVEY.md from the registry so
the document can never silently disagree with the code again: whoever
registers a key must bump the header in the same change.
"""

from __future__ import annotations

import pathlib
import re

from hbasemapreduce_spark.registry import CONTRACT_KEYS, all_specs

_SURVEY = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"


def test_survey_beyond_contract_count_matches_registry():
    text = _SURVEY.read_text()
    m = re.search(r"\*\*\+ (\d+) beyond-contract keys", text)
    assert m, "SURVEY.md §2 inventory-size header not found"
    stated = int(m.group(1))
    actual = len(all_specs()) - len(CONTRACT_KEYS)
    assert stated == actual, (
        f"SURVEY.md §2 says +{stated} beyond-contract keys but the "
        f"registry holds {actual} — update the header in the same "
        "change that registered the new key(s)"
    )


def test_survey_contract_count_matches_registry():
    text = _SURVEY.read_text()
    m = re.search(r"\*\*Inventory size: (\d+) contract keys\*\*", text)
    assert m, "SURVEY.md §2 contract-count header not found"
    assert int(m.group(1)) == len(CONTRACT_KEYS) == 60


def test_readme_key_count_matches_registry():
    # README drifted twice (287 at r7 close, 301 mid-r8) — same class
    # of rot as the SURVEY header, same fix: derive and pin.
    readme = _SURVEY.parent / "README.md"
    m = re.search(r"the (\d+)-key query registry", readme.read_text())
    assert m, "README registry key-count line not found"
    assert int(m.group(1)) == len(all_specs()), (
        f"README says {m.group(1)} keys, registry holds {len(all_specs())}"
    )
