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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's rows into n_salts sub-keys
    and replicate the small side once per salt, so a hot join key spreads
    over n_salts reducers instead of one straggler. Each big row carries
    exactly one salt and matches exactly one replica — semantics identical
    to the plain join."""
    spark = big.sparkSession
    salts = spark.range(n_salts).select(
        F.col("id").cast("int").alias("salt")
    )
    b = big.withColumn(
        "salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    s = small.crossJoin(F.broadcast(salts))
    return b.join(
        s, (F.col(big_key) == F.col(small_key)) & (b.salt == s.salt)
    ).drop("salt")


@register(
    "q96_salted_join",
    oracle="SELECT o_orderpriority, COUNT(*) AS cnt, "
    "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE o_orderstatus = 'F' "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    tags=("join", "skew"),
    doc="Skew-salted replicate join (16 salts): the big side salts each "
    "row deterministically, the small side replicates once per salt "
    "behind a broadcast, and the join key becomes (key, salt) — a hot "
    "orderkey's rows spread across 16 reducers instead of one straggler "
    "task. The manual form of what AQE skew-join splitting does "
    "adaptively (session.py enables that too); kept explicit because "
    "AQE only splits AFTER a stage materializes skewed partitions, "
    "while pre-salting avoids building them at all for known-hot keys. "
    "Oracle: the plain join + aggregate — salting must not change "
    "results.",
)
def q96_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(table(spark, sf_dir, "lineitem")).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority")
    )
    return (
        salted_join(li, orders, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
