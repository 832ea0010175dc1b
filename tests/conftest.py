from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark.session import get_spark, tune_for_local_tests

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdi-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    tune_for_local_tests(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    from tests.oracle import make_duckdb

    con = make_duckdb(SF_DIR)
    yield con
    con.close()
