"""Connected-components convergence contracts.

The round-2 review flagged that a fixed 2-hop label propagation silently
mislabels chain-shaped components (cosine similarity is not transitive,
so the embedding near-dup graph can have diameter > 2). cc_labels now
iterates to a label-sum fixpoint; these tests prove it on graphs a fixed
hop count cannot solve, and pin the sharded-window variants' relationship
to their global counterparts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark import tables
from bigdataindexing_spark.operators.dedup import cc_labels


def _labels(spark, edges, method="adaptive"):
    df = spark.createDataFrame(edges, "a long, b long")
    out = {
        r["id"]: r["label"]
        for r in cc_labels(df, "a", "b", method=method).collect()
    }
    tables.release_pinned()
    return out


def test_cc_chain_diameter_9(spark):
    # 1-2-3-...-10: diameter 9; every node must reach label 1. A fixed
    # 2-hop propagation would leave the tail nodes unconverged. Both the
    # pointer-jumping default and the plain-propagation baseline solve it.
    edges = [(i, i + 1) for i in range(1, 10)]
    assert _labels(spark, edges) == {i: 1 for i in range(1, 11)}
    assert _labels(spark, edges, method="propagate") == {
        i: 1 for i in range(1, 11)
    }


def test_cc_pointer_jump_is_logarithmic(spark):
    # Chain of 33 nodes (diameter 32). Plain propagation needs one round
    # per hop, more than the 25-round cap allows — so this chain only
    # converges if reach grows superlinearly. Both the always-jump mode
    # and the production default (adaptive: jump from round 3) must
    # solve it.
    from bigdataindexing_spark.operators.dedup import CC_MAX_ITERATIONS

    n = 33
    assert n - 1 > CC_MAX_ITERATIONS  # propagate alone could NOT finish
    edges = [(i, i + 1) for i in range(1, n)]
    assert _labels(spark, edges, method="pointer_jump") == {
        i: 1 for i in range(1, n + 1)
    }
    assert _labels(spark, edges) == {i: 1 for i in range(1, n + 1)}


def test_cc_two_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)]
    got = _labels(spark, edges)
    assert {k: v for k, v in got.items() if k < 10} == {1: 1, 2: 1, 3: 1}
    assert {k: v for k, v in got.items() if k >= 10} == {
        10: 10, 11: 10, 12: 10, 13: 10
    }


def test_cc_star_and_clique(spark):
    edges = [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (7, 9)]
    got = _labels(spark, edges)
    assert got[5] == got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == got[9] == 7


def test_sharded_pack_conserves_tokens(spark, sf_dir):
    # q98 shards the q67 packing window; sharding must neither drop nor
    # duplicate tokens — the per-lang token totals are identical.
    from bigdataindexing_spark.operators.pipeline import (
        q67_sequence_pack,
        q98_sequence_pack_sharded,
    )

    glob = {
        r["lang"]: r["t"]
        for r in q67_sequence_pack(spark, sf_dir)
        .groupBy("lang")
        .agg(F.sum("pack_tokens").alias("t"))
        .collect()
    }
    shard = {
        r["lang"]: r["t"]
        for r in q98_sequence_pack_sharded(spark, sf_dir)
        .groupBy("lang")
        .agg(F.sum("pack_tokens").alias("t"))
        .collect()
    }
    assert glob == shard


def test_sharded_budget_bounded_by_global_budget(spark, sf_dir):
    # each (lang, shard) stream fills at most budget/n_shards tokens, so
    # the per-lang total can never exceed the global budget
    from bigdataindexing_spark.operators.pipeline import (
        TOKEN_BUDGET,
        q99_budget_select_sharded,
    )

    for r in q99_budget_select_sharded(spark, sf_dir).collect():
        assert r["tokens"] <= TOKEN_BUDGET


def test_cc_caches_fully_reclaimed_by_release_pinned(spark, sf_dir):
    """cc_labels persists per-round label relations; after the caller
    materializes the result and the session sweep runs (release_pinned,
    as bench.py and the driver do between queries), NO cached RDD may
    survive — the round-4 advice leak was the final round's cache living
    outside the pinned registry forever."""
    from bigdataindexing_spark import tables
    from bigdataindexing_spark.registry import queries

    tables.release_pinned()
    spark.catalog.clearCache()
    queries()["dedup_cluster_cc"](spark, sf_dir).collect()
    assert len(tables._PINNED) >= 1  # the returned round's cache is pinned
    tables.release_pinned()
    spark.catalog.clearCache()  # drop the builder-level store caches too
    # JVM truth, not Python bookkeeping: no persisted RDD blocks remain
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.size() == 0, f"{jmap.size()} cached RDDs leaked"
