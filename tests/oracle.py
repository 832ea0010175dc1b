"""duckdb oracle harness: run a Spark DataFrame and an equivalent duckdb SQL
over the same Parquet tables, canonicalize both, and diff.

Mirrors the driver's comparison: row count, schema (column names), and an
order-insensitive value hash with doubles rounded to 4 decimals and
timestamps rendered ISO-8601.
"""

from __future__ import annotations

import datetime as _dt
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
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    return sorted(out)


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
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
        return result
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    result["match"] = sc == dc
    if not result["match"]:
        s_only = [r for r in sc if r not in set(dc)][:5]
        d_only = [r for r in dc if r not in set(sc)][:5]
        result["spark_only_sample"] = s_only
        result["duck_only_sample"] = d_only
    return result
