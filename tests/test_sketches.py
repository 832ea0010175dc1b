"""Sketch-operator guarantees (X27/X28): the registered oracles hash-gate
the sketch CONTENTS; these contracts pin the approximation PROPERTIES —
the one-sided errors that make each sketch safe to deploy."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark.operators import sketches
from bigdataindexing_spark.registry import queries
from bigdataindexing_spark.tables import table_view


def _exact_contaminated(spark, sf_dir):
    """Doc ids sharing any BLOOM_N-gram shingle with the eval split —
    ground truth for the no-false-negative check."""
    docs = table_view(spark, sf_dir, "documents")
    rows = spark.sql(f"""
        WITH d AS (
          SELECT doc_id, {sketches._SHINGLE_SPARK} AS s
          FROM (SELECT doc_id, split(lower(text), ' ') AS t FROM {docs})
          WHERE size(t) >= {sketches.BLOOM_N}
        ),
        ev AS (SELECT DISTINCT s FROM d WHERE doc_id % 97 = 0)
        SELECT DISTINCT doc_id FROM d LEFT SEMI JOIN ev USING (s)
        WHERE doc_id % 97 != 0
    """).collect()
    return {r["doc_id"] for r in rows}


def _bloom_flagged(spark, sf_dir):
    """Doc-level view of the registered query's flag predicate."""
    docs = table_view(spark, sf_dir, "documents")
    mask = sketches.bloom_mask(spark, sf_dir)
    spark.createDataFrame([(mask,)], "mask ARRAY<BIGINT>").createOrReplaceTempView(
        "bdi_bloom_mask_test"
    )
    pos = sketches._POS_SPARK.format(s="s", i="i")
    rows = spark.sql(f"""
        WITH d AS (
          SELECT doc_id, {sketches._SHINGLE_SPARK} AS s
          FROM (SELECT doc_id, split(lower(text), ' ') AS t FROM {docs}
                WHERE doc_id % 97 != 0)
          WHERE size(t) >= {sketches.BLOOM_N}
        )
        SELECT DISTINCT doc_id FROM d CROSS JOIN bdi_bloom_mask_test m
        WHERE forall(
          transform(sequence(0, {sketches.BLOOM_K - 1}), i -> {pos}),
          p -> (element_at(m.mask, CAST(p DIV 64 AS INT) + 1)
                & shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0)
    """).collect()
    return {r["doc_id"] for r in rows}


def test_bloom_never_false_negative(spark, sf_dir):
    """The Bloom guarantee decontamination depends on: every document
    with a TRUE shared shingle is flagged. False positives are allowed
    (and counted) — a missed contamination is not."""
    exact = _exact_contaminated(spark, sf_dir)
    flagged = _bloom_flagged(spark, sf_dir)
    assert exact, "fixture regressed: no truly contaminated docs"
    missed = exact - flagged
    assert not missed, f"bloom missed truly contaminated docs: {sorted(missed)[:5]}"
    # false-positive rate stays sane for a 64k-bit / 4-hash filter at
    # this load factor (loose bound: catches a broken hash layout where
    # everything collides, not ordinary collision noise)
    fp = flagged - exact
    assert len(fp) <= max(10, len(exact))


def test_bloom_registered_rollup_consistent(spark, sf_dir):
    """The registered per-lang rollup counts exactly the doc-level
    flags."""
    per_lang = {
        r["lang"]: r["flagged_docs"]
        for r in queries()["dedup_bloom_decontaminate"](spark, sf_dir).collect()
    }
    assert sum(per_lang.values()) == len(_bloom_flagged(spark, sf_dir))


def test_cms_overestimates_only(spark, sf_dir):
    """Count-min never undercounts: for every reported heavy hitter the
    sketch estimate >= the exact count (collisions only ADD)."""
    rows = queries()["txt_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == sketches.CMS_TOP
    for r in rows:
        assert r["cms_cnt"] >= r["true_cnt"], r
    # and the report is ordered by true count desc
    counts = [r["true_cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_cms_counters_bounded_and_mergeable(spark, sf_dir):
    """The counter table never exceeds D×W rows (the fixed sketch
    state), and the sum over any hash row equals the total token count —
    the additivity that makes shard sketches merge by summation."""
    cms = spark.table(sketches.cms_counters_view(spark, sf_dir))
    assert cms.count() <= sketches.CMS_D * sketches.CMS_W
    docs = table_view(spark, sf_dir, "documents")
    total = spark.sql(
        f"SELECT COUNT(1) AS n FROM (SELECT explode(split(lower(text), ' ')) AS t "
        f"FROM {docs}) WHERE t != ''"
    ).collect()[0]["n"]
    per_row = {
        r["d"]: r["s"]
        for r in cms.groupBy("d").agg(F.sum("cnt").alias("s")).collect()
    }
    assert set(per_row) == set(range(sketches.CMS_D))
    assert all(v == total for v in per_row.values())


def test_cms_stream_multibatch_additivity(spark, sf_dir, tmp_path):
    """ST12's exactly-once claim, exercised across REAL micro-batches:
    the corpus split into 3 files streamed one per trigger must merge to
    exactly the one-shot sketch (counters are additive; batchId-keyed
    partials make replay idempotent)."""
    import os

    from bigdataindexing_spark.streaming import queries as sq
    from bigdataindexing_spark.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "chunks")
    docs.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    cms_dir = str(tmp_path / "cms")
    sq.run_foreach_batch(stream, sq.cms_upsert_batch(cms_dir))
    batches = [n for n in os.listdir(cms_dir) if n.startswith("batch=")]
    assert len(batches) >= 3  # really ran multi-batch
    merged = {
        (r["d"], r["w"]): r["cnt"]
        for r in sq.read_cms(spark, cms_dir).collect()
    }
    oneshot = {
        (r["d"], r["w"]): r["cnt"]
        for r in sq.cms_partial_counters(docs).collect()
    }
    assert merged == oneshot


def test_quantile_sketch_error_bound_and_mergeability(spark, sf_dir):
    """q119: (a) every interpolated quantile is within one bin width of
    the EXACT percentile (the sketch's rank-error contract); (b) the
    per-shard partials merged by addition equal the one-pass corpus
    histogram (the mergeable algebra that makes the sketch streamable/
    distributable)."""
    from bigdataindexing_spark.tables import table

    est = {
        r["q"]: r["est"]
        for r in queries()["q119_quantile_sketch"](spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents")
    exact = docs.select(
        F.expr(
            "percentile(n_chars, array(0.5, 0.9, 0.99))"
        ).alias("p")
    ).collect()[0]["p"]
    for q, ex in zip(("p50", "p90", "p99"), exact):
        assert abs(est[q] - ex) <= sketches.QH_W, (q, est[q], ex)

    # merge algebra: partials summed across shards == one-pass histogram
    partials = sketches._build_quantile_hist(spark, sf_dir)
    merged = {
        r["bin"]: r["cnt"]
        for r in partials.groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect()
    }
    onepass = {
        r["bin"]: r["cnt"]
        for r in docs.select(
            F.floor(F.col("n_chars") / sketches.QH_W).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert merged == onepass
