"""Regenerate tests/golden_plans.json — the committed plan-audit golden
for serve-tagged benched queries (VERDICT r5 #7).

PLANS.md is a human-readable audit regenerated ad hoc; this golden is the
ENFORCED subset: for every serve-tagged query (the store-backed rows whose
plan shape is the product's serving contract), the regression-class plan
properties — exchange count, join strategies, Python stages, pushed-filter
scan count — are pinned per scale factor. The paired pytest
(tests/test_plans.py::test_serve_plans_match_committed_golden) re-audits
under the exact test-session settings and fails on ANY drift, so a
deliberate plan change requires re-running this script and committing the
diff.

Usage: python scripts/gen_plan_golden.py   (rewrites tests/golden_plans.json
for both sf0.001 and sf0.01 — the two SFs the pytest gate runs at)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry, tables  # noqa: E402
from bigdataindexing_spark.session import get_spark, tune_for_local_tests  # noqa: E402
from scripts.gen_plan_audit import audit  # noqa: E402

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden_plans.json",
)
# the regression-class fields (VERDICT r5 #7): a new exchange, a join
# falling back (BHJ -> SMJ), a new Python stage, or a pushed-count drop
GOLDEN_FIELDS = ("exchanges", "joins", "python", "pushed_scans")
SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def golden_for(spark, sf_dir: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name, spec in sorted(registry.all_specs().items()):
        if not spec.bench or "serve" not in spec.tags:
            continue
        a = audit(spec.builder(spark, sf_dir))
        out[name] = {k: a[k] for k in GOLDEN_FIELDS}
        tables.release_pinned()
        spark.catalog.clearCache()
    return out


def main() -> None:
    # mirror the pytest session EXACTLY (tests/conftest.py): same session
    # factory, same local tuning — the golden is only meaningful under the
    # settings the gate re-audits with
    spark = get_spark(
        app_name="bdi-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    tune_for_local_tests(spark)
    spark.sparkContext.setLogLevel("ERROR")
    golden = {
        os.path.basename(sf_dir.rstrip("/")): golden_for(spark, sf_dir)
        for sf_dir in SF_DIRS
    }
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {GOLDEN_PATH}")
    spark.stop()


if __name__ == "__main__":
    main()
