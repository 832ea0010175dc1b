"""Store-layer session-safety sweep (VERDICT r5 #8).

Round 5 fixed sibling-``spark.newSession()`` cache hits reactively, store
by store, as each bug surfaced. This sweep drives EVERY registered
session-materialized store through a fresh sibling session in one
parametrized pass, so the next store added cannot reintroduce the bug
class: an application-keyed cache serving a temp view the new session's
catalog lacks, or a DataFrame bound to the wrong session.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from bigdataindexing_spark.stores import NON_STORE_DIRS, STORE_REGISTRY


def test_store_registry_covers_every_store_dir():
    """Every ``session_store_dir("<name>")`` call site in the source tree
    must be claimed by STORE_REGISTRY (or listed as deliberate non-store
    scratch space) — a new store added without a registry entry fails
    here instead of silently escaping the session sweep."""
    src = Path(__file__).resolve().parent.parent / "bigdataindexing_spark"
    names = set()
    for py in src.rglob("*.py"):
        names.update(re.findall(r'session_store_dir\("([^"]+)"\)', py.read_text()))
    assert names, "expected session_store_dir call sites"
    uncovered = names - set(STORE_REGISTRY) - NON_STORE_DIRS
    assert not uncovered, (
        f"stores missing from bigdataindexing_spark.stores.STORE_REGISTRY: "
        f"{sorted(uncovered)} — add an accessor so the newSession sweep "
        "covers them"
    )


@pytest.mark.parametrize("store_name", sorted(STORE_REGISTRY))
def test_store_survives_sibling_new_session(spark, sf_dir, store_name):
    """Materialize the store on the base session, then access it from a
    fresh ``spark.newSession()`` (same application id, EMPTY catalog):
    the accessor must return a usable DataFrame with the same row count
    — never a stale view name the new catalog can't resolve."""
    accessor = STORE_REGISTRY[store_name]
    base_df = accessor(spark, sf_dir)
    base_count = base_df.count()

    sibling = spark.newSession()
    sib_df = accessor(sibling, sf_dir)
    assert sib_df.count() == base_count
    # and the base session still works after the sibling touched the cache
    assert accessor(spark, sf_dir).count() == base_count
