"""Delta transaction-log format contracts (sources/delta_log.py).

The three registered queries hash-gate snapshot CONTENTS against duckdb;
these tests pin the PROTOCOL properties: commit-file naming, action
shape (protocol/metaData/add/remove with a parseable stats sidecar),
state reconstruction across versions, stats-based file pruning, and the
reader's refusal to partial-read an unknown version.
"""

from __future__ import annotations

import json
import os

import pytest

from bigdataindexing_spark.sources.delta_log import (
    DELTA_READ_HI,
    build_delta_table,
    delta_snapshot_files,
    read_delta_snapshot,
)


@pytest.fixture(scope="module")
def table_dir(spark, sf_dir):
    return build_delta_table(spark, sf_dir)


def test_log_layout_matches_protocol(table_dir):
    log = sorted(os.listdir(os.path.join(table_dir, "_delta_log")))
    assert log == [f"{v:020d}.json" for v in (0, 1, 2)]
    # commit 0 must open with protocol + metaData, then only adds
    with open(os.path.join(table_dir, "_delta_log", log[0])) as f:
        actions = [json.loads(line) for line in f]
    assert "protocol" in actions[0]
    assert actions[0]["protocol"]["minReaderVersion"] == 1
    assert "metaData" in actions[1]
    meta = actions[1]["metaData"]
    assert meta["format"]["provider"] == "parquet"
    # schemaString is a Spark StructType JSON document
    schema = json.loads(meta["schemaString"])
    assert schema["type"] == "struct"
    for a in actions[2:]:
        assert set(a) == {"add"}
        add = a["add"]
        assert not os.path.isabs(add["path"])
        stats = json.loads(add["stats"])
        assert stats["numRecords"] > 0
        assert stats["minValues"]["doc_id"] <= stats["maxValues"]["doc_id"]


def test_state_reconstruction_across_versions(table_dir):
    v0 = {a["path"] for a in delta_snapshot_files(table_dir, 0)}
    v1 = {a["path"] for a in delta_snapshot_files(table_dir, 1)}
    v2 = {a["path"] for a in delta_snapshot_files(table_dir, 2)}
    assert v0 < v1, "append must strictly grow the file set"
    # the CoW delete swaps exactly one file for its rewrite
    assert "part-b.parquet" in v1 and "part-b.parquet" not in v2
    assert "part-b2.parquet" in v2
    # latest == explicit-latest-version
    latest = {a["path"] for a in delta_snapshot_files(table_dir)}
    assert latest == v2


def test_reader_refuses_unknown_version(table_dir):
    with pytest.raises(ValueError):
        delta_snapshot_files(table_dir, 99)


def test_stats_pruning_reads_fewer_files(spark, table_dir):
    all_files = delta_snapshot_files(table_dir)
    pruned = read_delta_snapshot(
        spark, table_dir, doc_id_range=(0, DELTA_READ_HI)
    )
    n_read = len(pruned.inputFiles())
    assert n_read < len(all_files), (n_read, len(all_files))
    # pruning is sound: no row in the dropped files matches the range
    full = read_delta_snapshot(spark, table_dir)
    want = full.filter(f"doc_id <= {DELTA_READ_HI}").count()
    got = pruned.filter(f"doc_id <= {DELTA_READ_HI}").count()
    assert got == want
