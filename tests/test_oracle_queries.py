"""Every registered query with a SQL oracle must hash-match duckdb.

This is the local mirror of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json). Run against sf0.01 with
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/ -q``.
"""

from __future__ import annotations

import pytest

from bigdataindexing_spark import registry
from tests.oracle import compare

SPECS = registry.all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    result = compare(df, duck, spec.oracle_text())
    assert result["match"], f"{name}: {result}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
