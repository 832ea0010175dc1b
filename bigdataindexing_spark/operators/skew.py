"""Skew-mitigation operators: salting for hot keys.

The ``events`` table has only a handful of ``event_type`` values, so a
plain groupBy hashes ~all rows to a few reducers — the classic hot-key
shuffle. Salting splits each hot key into ``N_SALTS`` sub-keys for the
first (partial) aggregation and folds the salts in a second, tiny
aggregation. At 100 TB this is the difference between one straggler task
holding a stage and an even spread; AQE's skew-join splitting covers the
join case, salting covers aggregation.

The oracle is the plain GROUP BY — salting must be a pure execution-plan
change with identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import spread, table

N_SALTS = 16


def salted_agg(
    df: DataFrame, key: str, agg_col: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-stage skew-safe aggregation: (key, salt) partials, then fold."""
    salted = df.withColumn(
        "salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "salt").agg(
        F.count(F.lit(1)).alias("pc"), F.sum(agg_col).alias("ps")
    )
    return partial.groupBy(key).agg(
        F.sum("pc").alias("cnt"), F.round(F.sum("ps"), 2).alias("sum_value")
    )


@register(
    "q39_salted_agg",
    oracle="SELECT event_type, COUNT(*) AS cnt, ROUND(SUM(ROUND(value, 4)), 2) "
    "AS sum_value FROM events GROUP BY event_type ORDER BY event_type",
    tags=("agg", "skew"),
    doc="Skew-salted aggregation over the hot event_type key (16 salts, "
    "two-stage fold). Must equal the plain GROUP BY exactly — salting is "
    "an execution-plan change only.",
)
def q39_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spread(table(spark, sf_dir, "events")).withColumn(
        "value", F.round("value", 4)
    )
    return salted_agg(ev, "event_type", "value").orderBy("event_type")
