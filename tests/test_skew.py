"""Skew-mitigation contracts: salting must be a pure execution-plan change.

The bench corpus has no hot join keys, so q96's salted path degenerates to
the plain join by design — these tests force BOTH paths: a synthetic
skewed relation exercises the actual (key, salt) fan-out, and the unskewed
path is asserted to take the plain-join branch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark import tables
from bigdataindexing_spark.operators.skew import (
    N_SALTS,
    salted_agg,
    salted_join,
)


def _cleanup():
    tables.release_pinned()


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    ev = (
        tables.table(spark, sf_dir, "events")
        .withColumn("value", F.round("value", 4))
    )
    plain = {
        r["event_type"]: (r["cnt"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(
                F.sum(F.round(F.col("value") * 10_000, 0).cast("long"))
                / 10_000.0,
                2,
            ).alias("sum_value"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["cnt"], r["sum_value"])
        for r in salted_agg(ev, "event_type", "value").collect()
    }
    assert salted == plain


def _skewed_frames(spark):
    # one hot key (0) with 5000 rows, 50 cold keys with 10 rows each
    big = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    ).union(
        spark.range(500).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("payload")
        )
    )
    small = spark.range(51).select(
        F.col("id").alias("sk"), (F.col("id") * 100).alias("attr")
    )
    return big, small


def test_salted_join_hot_path_matches_plain(spark):
    big, small = _skewed_frames(spark)
    plain = (
        big.join(small, big.k == small.sk)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("attr").alias("s"))
    )
    expected = {r["k"]: (r["c"], r["s"]) for r in plain.collect()}
    # hot_key_rows=100 -> the 5000-row key is detected hot (5% sample
    # keeps ~250 of its rows, well over the 5-row sampled threshold)
    joined = salted_join(big, small, "k", "sk", hot_key_rows=100)
    got = {
        r["k"]: (r["c"], r["s"])
        for r in joined.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("attr").alias("s"))
        .collect()
    }
    _cleanup()
    assert got == expected


def test_salted_join_detects_hot_key(spark):
    big, _ = _skewed_frames(spark)
    sampled = (
        big.select(F.col("k").alias("__hk"))
        .sample(False, 0.05, seed=7)
        .groupBy("__hk")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 5)
        .collect()
    )
    assert [r["__hk"] for r in sampled] == [0]


def test_salted_join_unskewed_takes_plain_branch(spark):
    big, small = _skewed_frames(spark)
    cold = big.filter(F.col("k") > 0)  # drop the hot key
    joined = salted_join(cold, small, "k", "sk", hot_key_rows=100_000)
    # plain branch: no __salt column ever enters the plan
    assert "__salt" not in joined.columns
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "__salt" not in plan
    assert joined.count() == cold.count()
    _cleanup()


def test_salted_join_salt_fanout_bounded(spark):
    big, small = _skewed_frames(spark)
    joined = salted_join(big, small, "k", "sk", hot_key_rows=100)
    # fan-out must not duplicate or drop rows: exactly one match per big row
    assert joined.count() == big.count()
    assert N_SALTS > 1
    _cleanup()


def test_banded_join_hot_bucket_aqe_skew_split(spark):
    """100 TB failure mode of the LSH band join (X2) that sf0.1 cannot
    surface: one band bucket goes hot (a near-constant band over boiler-
    plate docs) and the bucket self-join would land that bucket's entire
    pair space on one reducer. Contract: with AQE's skew-join handling on
    (the session default at scale — bench.py only disables AQE for the
    tiny local corpus), the hot partition is SPLIT — the executed plan
    marks the join skew=true — and the candidate-pair result is exact."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # scaled-down thresholds so the synthetic hot bucket (a few
        # hundred KB) is 'huge' relative to the cold ones, the same
        # RELATIVE shape a real hot bucket has against 64MB defaults
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16384",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.shuffle.partitions", "8")

        hot_n, cold_keys, cold_n = 1500, 40, 10
        # incompressible payload: shuffle blocks are compressed, so a
        # constant pad would vanish and the skew detector (which sees
        # compressed map-output sizes) would never trip
        pad = F.concat(F.md5(F.col("id").cast("string")),
                       F.md5((F.col("id") + 1).cast("string")),
                       F.md5((F.col("id") + 2).cast("string"))).alias("pad")
        hot = spark.range(hot_n).select(
            F.lit(0).alias("band"), F.lit(777).alias("bucket"),
            F.col("id").alias("doc_id"), pad,
        )
        cold = spark.range(cold_keys * cold_n).select(
            F.lit(1).alias("band"), (F.col("id") % cold_keys).alias("bucket"),
            (F.col("id") + hot_n).alias("doc_id"), pad,
        )
        bands = hot.union(cold)
        # pad rides BOTH join sides into the aggregate (sum of lengths)
        # so column pruning cannot strip it before the shuffle — the
        # shuffled bytes must look like real banded-signature rows for
        # the size-based skew detector to see the hot bucket
        a = bands.select(
            "band", "bucket", F.col("doc_id").alias("doc_a"),
            F.col("pad").alias("pad_a"),
        )
        b = bands.select(
            "band", "bucket", F.col("doc_id").alias("doc_b"),
            F.col("pad").alias("pad_b"),
        )
        cand = a.join(b, ["band", "bucket"]).filter(
            F.col("doc_a") < F.col("doc_b")
        )
        # run the count THROUGH one DataFrame object so its own
        # queryExecution carries the finalized adaptive plan (a bare
        # cand.count() plans a separate query and cand's plan would
        # still read isFinalPlan=false)
        counted = cand.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pad_a") + F.length("pad_b")).alias("padbytes"),
        )
        got = counted.collect()[0]["n"]
        want = hot_n * (hot_n - 1) // 2 + cold_keys * (cold_n * (cold_n - 1) // 2)
        assert got == want  # exact pairs: the split reassembles losslessly

        # the hot bucket was actually split: AQE marked the join skew=true
        plan = counted._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
