"""MaxScore early-termination contracts (idx_maxscore_topk).

The oracle already proves pruned == exact at every SF; these tests pin
the two things the hash can't see: the term-partition algebra itself,
and that pruning genuinely FIRES on this corpus (an early-termination
operator whose essential set is always 'all terms' would pass the
oracle while pruning nothing).
"""

from __future__ import annotations

from bigdataindexing_spark.index.search import (
    MAXSCORE_K,
    MAXSCORE_TERMS,
    _essential_terms,
    idx_maxscore_topk,
    search_index_table,
)

from pyspark.sql import functions as F


def test_essential_partition_algebra():
    maxw = {"rare": 3.0, "a": 0.5, "b": 0.4, "c": 0.3}
    # theta above every non-essential tail sum except the full set
    assert _essential_terms(maxw, theta=1.3) == ["rare"]
    # tail after ['rare','a'] sums 0.7 < 0.8 -> two essentials
    assert _essential_terms(maxw, theta=0.8) == ["rare", "a"]
    # unreachable theta -> everything essential (no pruning, still sound)
    assert _essential_terms(maxw, theta=float("-inf")) == [
        "rare",
        "a",
        "b",
        "c",
    ]
    # soundness invariant: the non-essential tail ALWAYS sums below theta
    for theta in (0.1, 0.35, 0.71, 1.2, 2.0, 4.0):
        ess = _essential_terms(maxw, theta)
        tail = [t for t in maxw if t not in ess]
        assert sum(maxw[t] for t in tail) < theta or not tail


def test_pruning_fires_and_result_matches_unpruned(spark, sf_dir):
    # exact unpruned disjunction straight off the store
    rows = search_index_table(spark, sf_dir, "term_rows").filter(
        F.col("token").isin(list(MAXSCORE_TERMS))
    )
    lens = search_index_table(spark, sf_dir, "doclens")
    meta = search_index_table(spark, sf_dir, "termmeta").filter(
        F.col("token").isin(list(MAXSCORE_TERMS))
    )
    from bigdataindexing_spark.index.search import BM25_K1

    exact = (
        rows.join(F.broadcast(meta.select("token", "idf")), "token")
        .join(lens.select("doc_id", "norm"), "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (BM25_K1 + 1))
                / (F.col("tf") + F.col("norm"))
            ).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(MAXSCORE_K)
        .collect()
    )
    pruned = idx_maxscore_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in exact]

    # pruning fires on this corpus: the rare high-idf term's theta seed
    # must render at least one common term non-essential
    maxw = {
        r["token"]: r["maxw"]
        for r in search_index_table(spark, sf_dir, "term_maxw")
        .filter(F.col("token").isin(list(MAXSCORE_TERMS)))
        .collect()
    }
    seed_theta = pruned[MAXSCORE_K - 1]["score"] if len(pruned) >= MAXSCORE_K else float("-inf")
    ess = _essential_terms(maxw, seed_theta)
    assert len(ess) < len(maxw), (
        f"essential={ess} — no pruning margin; retune MAXSCORE_TERMS"
    )
