"""duckdb oracle harness: run a Spark DataFrame and an equivalent duckdb SQL
over the same Parquet tables, canonicalize both, and diff.

Mirrors the driver's comparison: row count, schema (column names), and a
value hash with doubles rounded to 4 decimals and timestamps rendered
ISO-8601. Two deliberate strictness choices so driver-visible divergences
reproduce locally (round-2 VERDICT items #1/#2):

- duckdb results are fetched over Arrow, not ``fetchall()``: Arrow
  preserves duckdb's HUGEINT/DECIMAL result types as ``decimal.Decimal``
  (``fetchall`` coerces them to Python int and hides the divergence the
  driver sees). ``Decimal`` canonicalizes as a 4-decimal float rendering,
  distinct from int — an un-CAST integer SUM oracle now fails here too.
- rows are compared BOTH order-insensitively and in delivered order:
  every declared query carries an explicit ORDER BY precisely so ordered
  output is deterministic; ``match`` requires both.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb

from bigdataindexing_spark.tables import TABLE_NAMES

def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.4f}"
    if isinstance(v, _dec.Decimal):
        # deliberately NOT int-normalized: a decimal128 result (duckdb
        # HUGEINT SUM) must render differently from BIGINT so the oracle
        # gets an explicit CAST instead of relying on lossy coercion
        return f"{float(v):.4f}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(
    cols: list[str], rows: list[tuple], *, sort_rows: bool = True
) -> list[tuple]:
    """Sort columns by name, canonicalize values; optionally sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    return sorted(out) if sort_rows else out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    tbl = con.execute(sql).arrow()
    cols = list(tbl.schema.names)
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def compare(df, con, sql: str) -> dict:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duckdb_result(con, sql)
    result = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    if not result["cols_match"]:
        result["match"] = False
        result["ordered_match"] = False
        return result
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    so = canon_rows(s_cols, s_rows, sort_rows=False)
    do = canon_rows(d_cols, d_rows, sort_rows=False)
    result["ordered_match"] = so == do
    result["match"] = sc == dc and result["ordered_match"]
    if sc != dc:
        s_only = [r for r in sc if r not in set(dc)][:5]
        d_only = [r for r in dc if r not in set(sc)][:5]
        result["spark_only_sample"] = s_only
        result["duck_only_sample"] = d_only
    elif not result["ordered_match"]:
        diverge = next(
            (i for i, (a, b) in enumerate(zip(so, do)) if a != b), None
        )
        result["first_order_divergence"] = {
            "row": diverge,
            "spark": so[diverge] if diverge is not None else None,
            "duck": do[diverge] if diverge is not None else None,
        }
    return result
