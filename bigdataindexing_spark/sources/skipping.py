"""File-level min/max data skipping: a manifest of per-file column stats
plus a range-clustered layout whose scans prune FILES before Spark ever
lists them.

This is the table-format technique (Delta/Iceberg data skipping, Parquet
row-group pruning lifted one level up) expressed minimally:

- **Clustered layout**: ``repartitionByRange(col)`` at write time puts
  each file in charge of a narrow value range of the clustering column —
  the physical precondition for skipping (an unclustered layout has every
  file spanning the whole domain and nothing can be skipped; the
  reference's Redis keyspace has no such lever at all, its KEYS scan
  always touches everything — PlanService.java:106).
- **Manifest**: per-file (num_rows, min, max) of the clustering column,
  harvested from Parquet FOOTERS ONLY by a distributed Arrow pass — no
  data pages are read. At 100 TB the manifest is thousands of rows
  (one per file), a broadcast-sized relation maintained incrementally on
  ingest exactly like the postings store (index/build.py).
- **Pruned scan**: a range predicate consults the manifest first and
  hands Spark only the overlapping files. Catalyst's own row-group
  pruning (PushedFilters) still applies INSIDE each surviving file; the
  manifest saves the listing/footer/scheduling cost of files that cannot
  match — the dominant cost of a narrow range query over a huge table.

Correctness is pruning-independent by construction (the same predicate is
re-applied to the surviving rows), so the oracle is the plain full-scan
SQL — skipping must be a pure I/O reduction, the same contract as
q39/q96's "salting is an execution-plan change only".
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import bounded_sort, table

N_CLUSTER_FILES = 16

# (applicationId, sf_dir) -> (layout dir, manifest rows) of the shipdate-
# clustered lineitem layout. Built once per session (a layout is a property
# of the table, not of any one query) — same build-once/serve-many policy as
# the inverted index and the LSH signature store. The manifest is harvested
# ONCE, right after the layout write, by the distributed footer pass and
# kept driver-side: that is exactly how Delta/Iceberg serve planning — the
# scan planner replays file stats from the transaction log, it never
# re-reads footers per query. Manifest size is O(files), never O(rows).
_CLUSTERED_DIR: dict[tuple[str, str], tuple[str, list[dict]]] = {}


def _footer_stats(col: str):
    """mapInPandas worker: per-file (path, rows, min, max) from Parquet
    footer metadata only — no data pages are decoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                meta = pq.ParquetFile(path).metadata
                idx = meta.schema.names.index(col)
                mins, maxs = [], []
                for g in range(meta.num_row_groups):
                    st = meta.row_group(g).column(idx).statistics
                    if st is not None and st.has_min_max:
                        mins.append(st.min)
                        maxs.append(st.max)
                out.append(
                    {
                        "file": path,
                        "num_rows": meta.num_rows,
                        "min_v": min(mins) if mins else None,
                        "max_v": max(maxs) if maxs else None,
                    }
                )
            yield pd.DataFrame(out)

    return gen


def file_stats_manifest(
    spark: SparkSession, files: list[str], col: str, value_type: str
) -> DataFrame:
    """Distributed footer harvest: one manifest row per data file.

    ``files`` is the layout's file listing (at real scale: the table
    format's add-file log); the stat harvest runs on executors via an
    Arrow pass, one footer read per file, so manifest build cost is
    O(files), independent of data volume."""
    paths = spark.createDataFrame([(f,) for f in sorted(files)], "file string")
    schema = (
        f"file string, num_rows bigint, min_v {value_type}, max_v {value_type}"
    )
    return paths.mapInPandas(_footer_stats(col), schema)


def clustered_lineitem_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list[dict]]:
    """Materialize (once per session) lineitem range-clustered by
    l_shipdate into N_CLUSTER_FILES files, plus its file-stats manifest.

    The manifest is harvested by ONE distributed footer pass at write time
    and collect()ed — bounded by FILE COUNT, the same driver-side metadata
    a table format replays from its log — so query planning later consults
    a list, not a Spark job."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CLUSTERED_DIR.get(key)
    if cached is not None:
        return cached
    path = tempfile.mkdtemp(prefix="bdi_clustered_lineitem_")
    (
        table(spark, sf_dir, "lineitem")
        .repartitionByRange(N_CLUSTER_FILES, F.col("l_shipdate"))
        .write.mode("overwrite")
        .parquet(path)
    )
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    manifest = [
        r.asDict()
        for r in file_stats_manifest(
            spark, files, "l_shipdate", "date"
        ).collect()
    ]
    _CLUSTERED_DIR[key] = (path, manifest)
    return path, manifest


def clustered_lineitem_dir(spark: SparkSession, sf_dir: str) -> str:
    return clustered_lineitem_layout(spark, sf_dir)[0]


def pruned_files(
    spark: SparkSession, sf_dir: str, lo, hi
) -> tuple[list[str], int]:
    """Plan-time pruning: intersect the range predicate with the cached
    manifest — pure driver-side work over O(files) rows, no Spark job
    (the scan-planning step of a table format's data skipping)."""
    _path, manifest = clustered_lineitem_layout(spark, sf_dir)
    keep = manifest_keep(manifest, lo, hi)
    return keep, len(manifest)


def manifest_keep(manifest: list[dict], lo, hi) -> list[str]:
    """Files the range predicate cannot rule out. A file with absent
    stats CANNOT be pruned — skipping may only drop files proven
    non-overlapping (the conservative contract every table format
    honors; dropping an unproven file would change results)."""
    return [
        m["file"]
        for m in manifest
        if m["min_v"] is None
        or (str(m["min_v"]) <= hi and str(m["max_v"]) >= lo)
    ]


SKIP_LO = "1995-06-01"
SKIP_HI = "1995-08-31"


@register(
    "q111_minmax_skipping",
    oracle="SELECT l_returnflag, COUNT(*) AS cnt, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    f"FROM lineitem WHERE l_shipdate BETWEEN DATE '{SKIP_LO}' "
    f"AND DATE '{SKIP_HI}' GROUP BY l_returnflag ORDER BY l_returnflag",
    tags=("source", "skipping", "layout"),
    doc="File-level min/max data skipping (the Delta/Iceberg manifest "
    "technique): lineitem is range-clustered by l_shipdate at write time "
    "(once per session), a footer-only manifest records each file's "
    "(min, max) once at write time, and this 3-month range query consults "
    "the cached manifest DRIVER-SIDE at plan time (no Spark job — the "
    "Delta/Iceberg log-replay pattern) to scan ONLY the files whose "
    "range overlaps — ~3/16 of the layout at sf0.1 — then re-applies the "
    "predicate so results are pruning-independent. At 100 TB the "
    "manifest stays file-count-sized and broadcastable while the saved "
    "work (listing, footers, task scheduling for non-matching files) "
    "grows with the table; tests/test_skipping.py asserts both the "
    "pruning (surviving files < total) and result equality with the "
    "full scan. Oracle: the plain full-scan SQL over lineitem.",
)
def q111_minmax_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    keep, _total = pruned_files(spark, sf_dir, SKIP_LO, SKIP_HI)
    # An empty survivor set still needs a valid (empty) scan of the schema
    src = (
        spark.read.parquet(*keep)
        if keep
        else spark.read.parquet(clustered_lineitem_dir(spark, sf_dir))
    )
    return (
        src.filter(
            F.col("l_shipdate").between(F.lit(SKIP_LO), F.lit(SKIP_HI))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .transform(lambda d: bounded_sort(d, "l_returnflag"))
    )
