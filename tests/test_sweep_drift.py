"""Sweep-drift tripwire (VERDICT r9 #8).

Rounds 8 and 9 both shipped registry entries committed AFTER the 3-SF
self-sweep ran, so the newest queries had no oracle evidence at any SF
("sweep-stale") — a gap only the judge noticed. This test makes it a
loud CI failure instead: every name in `__spark_entry__.queries()` must
appear in each committed CORRECTNESS_SELF* artifact.

The fast path after registering a new query is a targeted merge run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
        python scripts/run_correctness.py --only new_query_name
    (repeat for sf0.01 and sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACTS = [
    "CORRECTNESS_SELF_sf001.json",  # sf0.001
    "CORRECTNESS_SELF.json",  # sf0.01
    "CORRECTNESS_SELF_sf01.json",  # sf0.1
]


def _registry_names() -> set[str]:
    from bigdataindexing_spark import registry

    return set(registry.all_specs())


@pytest.mark.parametrize("artifact", ARTIFACTS)
def test_registry_covered_by_self_sweep(artifact):
    path = os.path.join(REPO, artifact)
    assert os.path.exists(path), (
        f"{artifact} missing — run scripts/run_correctness.py at its SF"
    )
    swept = set(json.load(open(path))["queries"])
    missing = sorted(_registry_names() - swept)
    assert not missing, (
        f"{artifact} lacks oracle evidence for {len(missing)} registered "
        f"queries: {missing} — run scripts/run_correctness.py --only "
        f"{','.join(missing)} at that SF before shipping them"
    )


@pytest.mark.parametrize("artifact", ARTIFACTS)
def test_self_sweep_has_no_recorded_failures(artifact):
    """The committed sweep artifacts must themselves be green — a merged
    targeted run that recorded a hash mismatch should fail CI, not sit
    quietly in the JSON."""
    path = os.path.join(REPO, artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} missing (covered by the test above)")
    payload = json.load(open(path))
    assert payload["failed"] == [], (
        f"{artifact} records oracle failures: {payload['failed']}"
    )
