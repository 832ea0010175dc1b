"""Convergence contract for q118b_pagerank_converged (VERDICT r7 #6).

No SQL oracle can express a data-dependent iteration count, so the
operator's correctness rests on the fixed-point definition of PageRank
itself: at convergence, applying one more power-iteration step moves the
rank vector by (almost) nothing, and the ranks form a probability
distribution. Both are checked on the REAL operator output at the test
scale factor, not on a toy graph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark.operators.graph import (
    PR_DAMPING,
    PR_TOL,
    _EDGE_STORE,
    pagerank_iterate,
)


def _one_more_step(spark, sf_dir, pr):
    ranked_edges = _EDGE_STORE.df(spark, sf_dir)
    n = pr.count()
    base = (1.0 - PR_DAMPING) / n
    contrib = ranked_edges.join(
        F.broadcast(pr), ranked_edges["src"] == pr["node"]
    ).select(F.col("dst"), (F.col("pr") / F.col("d")).alias("w"))
    return contrib.groupBy("dst").agg(F.sum("w").alias("s")).select(
        F.col("dst").alias("node"),
        (F.lit(base) + F.lit(PR_DAMPING) * F.col("s")).alias("pr"),
    )


def test_pagerank_fixed_point_and_distribution(spark, sf_dir):
    pr = pagerank_iterate(spark, sf_dir).localCheckpoint()

    # probability distribution: ranks sum to 1 (power iteration preserves
    # total mass exactly up to float error on this dangling-free graph)
    total = pr.agg(F.sum("pr").alias("s")).collect()[0]["s"]
    assert abs(total - 1.0) < 1e-9, total

    # every node ranked, every rank at least the teleport floor
    n = pr.count()
    floor = (1.0 - PR_DAMPING) / n
    low = pr.agg(F.min("pr").alias("m")).collect()[0]["m"]
    assert low >= floor - 1e-12, (low, floor)

    # fixed point: ONE more exact power step moves L1 by < the declared
    # tolerance (the operator's own stopping criterion, re-verified
    # externally against an independently-constructed step)
    nxt = _one_more_step(spark, sf_dir, pr)
    l1 = (
        nxt.alias("a")
        .join(pr.alias("b"), "node")
        .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr"))).alias("l1"))
        .collect()[0]["l1"]
    )
    assert l1 < PR_TOL, l1
