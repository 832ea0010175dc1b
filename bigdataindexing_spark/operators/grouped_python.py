"""U2 — grouped-aggregate pandas UDF and applyInPandas group transforms.

The two Python-in-the-aggregation-path shapes (SURVEY.md §2.9 U2): a
grouped-agg ``pandas_udf`` (UDAF: one scalar per group, usable inside
``groupBy().agg``) and ``applyInPandas`` (full-group transform: a pandas
frame per group in, a frame out). Both are Arrow-batched; both shuffle
once on the group key like any aggregation.

The demonstration functions are deliberately SQL-expressible (geometric
mean; per-group z-score) so the duckdb oracle can hash-match them — the
dataflow shape is the point, and a real deployment swaps the body for the
non-SQL logic (sketches, model scoring) without touching the plan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import bounded_sort, spread, table


@F.pandas_udf(T.DoubleType())
def geomean(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): geometric mean of positive values."""
    import numpy as np

    return float(np.exp(np.log(v[v > 0]).mean()))


@register(
    "q42_grouped_udaf_geomean",
    oracle="SELECT event_type, ROUND(EXP(AVG(LN(value))), 4) AS geo "
    "FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type",
    # py_floor: UDAF-timed by design (the declared U2 surface) — the row
    # carries the per-query Python-worker round-trip floor; bench.py
    # labels it in BENCH_DETAIL. Headline aggregates still include it.
    tags=("agg", "pandas-udf", "py_floor"),
    doc="U2 grouped-aggregate pandas UDF: per-event-type geometric mean "
    "inside groupBy().agg — the UDAF path (Arrow batch per group, partial "
    "aggregation unavailable so the group's values shuffle to one reducer; "
    "acceptable for bounded-cardinality keys — for high-cardinality keys "
    "use the partial-aggregable form, q55_geomean_partial_agg). Only "
    "(event_type, value) are projected before the shuffle: every other "
    "column (including the wide props JSON string) would otherwise ride "
    "the exchange and the Arrow transfer into the Python worker.",
)
def q42_grouped_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        spread(table(spark, sf_dir, "events"))
        .filter(F.col("value") > 0)
        .select("event_type", "value")
    )
    return (
        ev.groupBy("event_type")
        .agg(F.round(geomean("value"), 4).alias("geo"))
        # barrier=True: coalesce(1) would fold the Arrow-batched final
        # aggregate into one task, serializing every group's Python
        # round-trip; the single-partition exchange keeps the UDAF stage
        # parallel and sorts only its tiny output (measured 0.50->0.30s
        # at sf0.1)
        .transform(lambda d: bounded_sort(d, "event_type", barrier=True))
    )


@register(
    "q55_geomean_partial_agg",
    oracle="SELECT event_type, ROUND(EXP(AVG(LN(value))), 4) AS geo "
    "FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type",
    tags=("agg",),
    doc="The sketch/partial-aggregation path for q42's geometric mean: "
    "exp(avg(ln(x))) in built-in expressions. Unlike the grouped-agg "
    "pandas UDF (whole group to one reducer), avg() partial-aggregates "
    "map-side — each task ships one (sum, count) pair per key, so a "
    "high-cardinality or skewed key never concentrates its raw values on "
    "a single machine. Same algebraic decomposition a log-sum sketch "
    "uses; this is the form to copy into a real 100 TB pipeline.",
)
def q55_geomean_partial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.exp(F.avg(F.log("value"))), 4).alias("geo"))
        .transform(lambda d: bounded_sort(d, "event_type"))
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas body: z-score each event's value within its group."""
    std = pdf["value"].std(ddof=1)
    mean = pdf["value"].mean()
    out = pdf[["event_id", "event_type"]].copy()
    out["z"] = ((pdf["value"] - mean) / std).round(4)
    return out


@register(
    "q43_group_zscore",
    oracle="SELECT event_id, event_type, ROUND((value - AVG(value) OVER w) / "
    "(STDDEV_SAMP(value) OVER w), 4) AS z FROM events "
    "WINDOW w AS (PARTITION BY event_type) "
    "QUALIFY event_id < 500 ORDER BY event_id",
    tags=("window-agg", "pandas-udf"),
    doc="U2 applyInPandas: per-group full-frame transform (z-score within "
    "event_type) — one shuffle on the group key, pandas frame per group; "
    "the oracle is the equivalent windowed-aggregate SQL. The final sort "
    "sits behind a presort barrier so the range-sort sampling pass "
    "re-reads a small exchange instead of re-running the Python stage.",
)
def q43_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(table(spark, sf_dir, "events")).select(
        "event_id", "event_type", "value"
    )
    z = ev.groupBy("event_type").applyInPandas(
        _zscore, "event_id BIGINT, event_type STRING, z DOUBLE"
    )
    return bounded_sort(
        z.filter(F.col("event_id") < 500), "event_id", barrier=True
    )
