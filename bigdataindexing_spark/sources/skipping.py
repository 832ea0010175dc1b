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

# (applicationId, sf_dir) -> directory of the shipdate-clustered lineitem
# layout. Built once per session (a layout is a property of the table, not
# of any one query) — same build-once/serve-many policy as the inverted
# index and the LSH signature store.
_CLUSTERED_DIR: dict[tuple[str, str], str] = {}


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


def clustered_lineitem_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per session) lineitem range-clustered by
    l_shipdate into N_CLUSTER_FILES files."""
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _CLUSTERED_DIR.get(key)
    if path is not None:
        return path
    path = tempfile.mkdtemp(prefix="bdi_clustered_lineitem_")
    (
        table(spark, sf_dir, "lineitem")
        .repartitionByRange(N_CLUSTER_FILES, F.col("l_shipdate"))
        .write.mode("overwrite")
        .parquet(path)
    )
    _CLUSTERED_DIR[key] = path
    return path


def pruned_files(
    spark: SparkSession, layout_dir: str, col: str, value_type: str, lo, hi
) -> tuple[list[str], int]:
    """Consult the manifest; return (surviving files, total files).

    The manifest collect() is bounded by FILE COUNT (the same driver-side
    metadata a table format replays from its log), never by row count."""
    files = [
        os.path.join(layout_dir, f)
        for f in os.listdir(layout_dir)
        if f.endswith(".parquet")
    ]
    manifest = file_stats_manifest(spark, files, col, value_type)
    keep = [
        r["file"]
        for r in manifest.filter(
            (F.col("min_v") <= F.lit(hi)) & (F.col("max_v") >= F.lit(lo))
        ).collect()
    ]
    return keep, len(files)


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
    "(min, max), and this 3-month range query scans ONLY the files whose "
    "range overlaps — ~3/16 of the layout at sf0.1 — then re-applies the "
    "predicate so results are pruning-independent. At 100 TB the "
    "manifest stays file-count-sized and broadcastable while the saved "
    "work (listing, footers, task scheduling for non-matching files) "
    "grows with the table; tests/test_skipping.py asserts both the "
    "pruning (surviving files < total) and result equality with the "
    "full scan. Oracle: the plain full-scan SQL over lineitem.",
)
def q111_minmax_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    layout = clustered_lineitem_dir(spark, sf_dir)
    keep, _total = pruned_files(
        spark, layout, "l_shipdate", "date", SKIP_LO, SKIP_HI
    )
    # An empty survivor set still needs a valid (empty) scan of the schema
    src = spark.read.parquet(*keep) if keep else spark.read.parquet(layout)
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
