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
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.sources.store_dirs import session_store_dir
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
    path = session_store_dir("clustered_lineitem")
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


def _coerce_bound(bound, stat):
    """Give ``bound`` the stat's type so comparisons are typed, never
    lexicographic: an ISO string bound against a date stat parses to a
    date; numeric stats expect numeric bounds and pass through (a string
    bound against an int stat would mis-prune — '9' > '10')."""
    import datetime as _dt

    if isinstance(stat, _dt.datetime) and isinstance(bound, str):
        return _dt.datetime.fromisoformat(bound)
    if isinstance(stat, _dt.date) and isinstance(bound, str):
        return _dt.date.fromisoformat(bound)
    return bound


def manifest_keep(manifest: list[dict], lo, hi) -> list[str]:
    """Files the range predicate cannot rule out. A file with absent
    stats CANNOT be pruned — skipping may only drop files proven
    non-overlapping (the conservative contract every table format
    honors; dropping an unproven file would change results). BOTH bounds
    must be present to prune: a one-sided stat (possible if a stats
    harvester records min/max independently) conservatively keeps the
    file rather than comparing against None."""
    out = []
    for m in manifest:
        mn, mx = m["min_v"], m["max_v"]
        if (
            mn is None
            or mx is None
            or (mn <= _coerce_bound(hi, mn) and mx >= _coerce_bound(lo, mx))
        ):
            out.append(m["file"])
    return out


SKIP_LO = "1995-06-01"
SKIP_HI = "1995-08-31"


@register(
    "q111_minmax_skipping",
    oracle="SELECT l_returnflag, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue "
    f"FROM lineitem WHERE l_shipdate BETWEEN DATE '{SKIP_LO}' "
    f"AND DATE '{SKIP_HI}' GROUP BY l_returnflag ORDER BY l_returnflag",
    tags=("source", "skipping", "layout", "serve"),
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
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (1 - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .transform(lambda d: bounded_sort(d, "l_returnflag"))
    )


# --- Z-order (multi-column) skipping ----------------------------------
# One clustering column gives one prunable dimension (the layout above);
# a Z-ORDER layout interleaves the bit-ranks of TWO columns so each file
# covers a small rectangle of the (l_shipdate, l_quantity) plane and a
# conjunctive range predicate prunes on BOTH — the Databricks OPTIMIZE
# ZORDER / Iceberg sort-order technique. Each column is quantized to a
# 6-bit equal-width bucket (row-local arithmetic; production systems use
# range ranks from column quantiles for skewed domains — same interleave
# afterwards), the 12-bit z-value range-partitions the write, and the
# manifest records per-file min/max of BOTH raw columns, so pruning
# correctness never depends on the bucketing at all.

Z_BITS = 6
Z_FILES = 16
# Table-level layout metadata (in a real system: from column stats).
Z_DATE_EPOCH = "1995-01-01"
Z_DATE_SPAN = 2500  # days covered by the lineitem shipdate domain
Z_QTY_MAX = 50

_ZORDER_DIR: dict[tuple[str, str], tuple[str, list[dict]]] = {}


def _zvalue(d_bucket, q_bucket):
    """Bit-interleave two Z_BITS-wide bucket columns (row-local)."""
    import functools
    import operator

    terms = []
    for i in range(Z_BITS):
        terms.append(
            F.shiftleft(
                F.shiftright(d_bucket, i).bitwiseAND(F.lit(1)).cast("long"),
                2 * i + 1,
            )
        )
        terms.append(
            F.shiftleft(
                F.shiftright(q_bucket, i).bitwiseAND(F.lit(1)).cast("long"),
                2 * i,
            )
        )
    return functools.reduce(operator.add, terms)


def _footer_stats_multi(cols: list[str]):
    """mapInPandas worker: per-file (path, rows, min_i/max_i per col) from
    Parquet footer metadata only."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                meta = pq.ParquetFile(path).metadata
                row = {"file": path, "num_rows": meta.num_rows}
                for ci, col in enumerate(cols):
                    idx = meta.schema.names.index(col)
                    mins, maxs = [], []
                    for g in range(meta.num_row_groups):
                        st = meta.row_group(g).column(idx).statistics
                        if st is not None and st.has_min_max:
                            mins.append(st.min)
                            maxs.append(st.max)
                    row[f"min_{ci}"] = min(mins) if mins else None
                    row[f"max_{ci}"] = max(maxs) if maxs else None
                out.append(row)
            yield pd.DataFrame(out)

    return gen


def file_stats_manifest_multi(
    spark: SparkSession, files: list[str], cols: list[str], value_types: list[str]
) -> DataFrame:
    paths = spark.createDataFrame([(f,) for f in sorted(files)], "file string")
    stat_cols = ", ".join(
        f"min_{i} {t}, max_{i} {t}" for i, t in enumerate(value_types)
    )
    return paths.mapInPandas(
        _footer_stats_multi(cols), f"file string, num_rows bigint, {stat_cols}"
    )


def zorder_lineitem_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, list[dict]]:
    """Materialize (once per session) lineitem Z-ordered on
    (l_shipdate, l_quantity), plus a two-column stats manifest."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ZORDER_DIR.get(key)
    if cached is not None:
        return cached
    path = session_store_dir("zorder_lineitem")
    n_buckets = 1 << Z_BITS
    d_bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            (
                F.datediff(F.col("l_shipdate"), F.lit(Z_DATE_EPOCH))
                * n_buckets
                / Z_DATE_SPAN
            ).cast("int"),
        ),
    )
    q_bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            (F.col("l_quantity") * n_buckets / (Z_QTY_MAX + 1)).cast("int"),
        ),
    )
    (
        table(spark, sf_dir, "lineitem")
        .withColumn("_z", _zvalue(d_bucket, q_bucket))
        .repartitionByRange(Z_FILES, F.col("_z"))
        .drop("_z")
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
        for r in file_stats_manifest_multi(
            spark, files, ["l_shipdate", "l_quantity"], ["date", "double"]
        ).collect()
    ]
    _ZORDER_DIR[key] = (path, manifest)
    return path, manifest


def manifest_keep_multi(manifest: list[dict], preds: list[tuple[int, object, object]]) -> list[str]:
    """Files no predicate dimension can rule out. ``preds`` is a list of
    (column index, lo, hi); bounds are compared TYPED against the stats
    (ISO strings coerce to the stat's date/datetime type, numerics pass
    through — never lexicographic). A file is pruned only when some
    dimension PROVES disjointness; absent or one-sided stats keep the
    file (same conservative contract as manifest_keep)."""
    keep = []
    for m in manifest:
        pruned = False
        for ci, lo, hi in preds:
            mn, mx = m.get(f"min_{ci}"), m.get(f"max_{ci}")
            if (
                mn is not None
                and mx is not None
                and (mn > _coerce_bound(hi, mn) or mx < _coerce_bound(lo, mx))
            ):
                pruned = True
                break
        if not pruned:
            keep.append(m["file"])
    return keep


ZQ_DATE_LO = "1996-01-01"
ZQ_DATE_HI = "1996-03-31"
ZQ_QTY_LO = 1
ZQ_QTY_HI = 10


@register(
    "q112_zorder_skipping",
    oracle="SELECT l_returnflag, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue "
    f"FROM lineitem WHERE l_shipdate BETWEEN DATE '{ZQ_DATE_LO}' "
    f"AND DATE '{ZQ_DATE_HI}' AND l_quantity BETWEEN {ZQ_QTY_LO} AND "
    f"{ZQ_QTY_HI} GROUP BY l_returnflag ORDER BY l_returnflag",
    tags=("source", "skipping", "layout", "zorder", "serve"),
    doc="Multi-column data skipping via a Z-ORDER clustered layout "
    "(Databricks OPTIMIZE ZORDER / Iceberg sort-order re-expressed in "
    "plain Spark): l_shipdate and l_quantity are quantized to 6-bit "
    "buckets row-locally, bit-interleaved into a z-value, and lineitem "
    "is range-partitioned on z at write time — each file then covers a "
    "small RECTANGLE of the (date, quantity) plane, so this conjunctive "
    "two-range query prunes files on BOTH dimensions from the cached "
    "two-column manifest (driver-side plan-time consult, like "
    "q111_minmax_skipping; a single-column layout can never prune on "
    "the second predicate — tests/test_skipping.py proves the "
    "difference). The predicate is re-applied to surviving rows, so "
    "pruning stays a pure I/O reduction; oracle is the plain full-scan "
    "SQL.",
)
def q112_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    _path, manifest = zorder_lineitem_layout(spark, sf_dir)
    keep = manifest_keep_multi(
        manifest,
        [
            (
                0,
                _dt.date.fromisoformat(ZQ_DATE_LO),
                _dt.date.fromisoformat(ZQ_DATE_HI),
            ),
            (1, ZQ_QTY_LO, ZQ_QTY_HI),
        ],
    )
    src = spark.read.parquet(*keep) if keep else spark.read.parquet(_path)
    return (
        src.filter(
            F.col("l_shipdate").between(F.lit(ZQ_DATE_LO), F.lit(ZQ_DATE_HI))
            & F.col("l_quantity").between(F.lit(ZQ_QTY_LO), F.lit(ZQ_QTY_HI))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (1 - F.col("l_discount").cast("decimal(12,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .transform(lambda d: bounded_sort(d, "l_returnflag"))
    )
