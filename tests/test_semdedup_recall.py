"""Recall contracts for the SemDeDup family (VERDICT r8 #7).

dedup_semantic's accepted miss class is near-dup pairs straddling a cell
boundary; dedup_semantic_multiprobe repairs it by probing each vector's
2nd-nearest cell too. Candidate pairs in the multi-probe variant are a
STRICT SUPERSET of the single-cell variant's (the home cell is always
probed), so the found-pair set — and therefore recall against the exact
quadratic pairs — can only grow. This test pins both facts numerically:

1. every pair the single-cell variant drops is also dropped (or kept as
   the group representative) by multi-probe — the superset property;
2. pair recall vs the exact sim_cosine_neardup ground truth is monotone:
   recall(multiprobe) >= recall(single), and multi-probe recall clears
   an absolute floor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark.operators.similarity import (
    SEM_TAU,
    assign_cells,
    assign_cells_topk,
    cosine,
    sim_cosine_neardup,
    train_centroids,
    _q9col,
)
from bigdataindexing_spark.tables import spread, table


def _found_pairs(spark, sf_dir, nprobe: int) -> set[tuple[int, int]]:
    """(va, vb) near-dup pairs the cell-bucketed scan finds at the given
    probe width — the pair set BEFORE the min-id verdict reduction, which
    is the right granularity for a recall contract."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    centroids = train_centroids(emb)
    cells = (
        assign_cells(emb, centroids).withColumn("rk", F.lit(1))
        if nprobe == 1
        else assign_cells_topk(emb, centroids, nprobe)
    )
    from bigdataindexing_spark.functions.vectors import as_double

    e = emb.select("vec_id", as_double("embedding").alias("v"))
    a = cells.select("cell", F.col("vec_id").alias("va"))
    b = cells.select(F.col("cell").alias("cell_b"), F.col("vec_id").alias("vb"))
    pairs = (
        a.join(b, (a["cell"] == b["cell_b"]) & (a["va"] < b["vb"]))
        .select("va", "vb")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("va"), F.col("v").alias("xa"))
    eb = e.select(F.col("vec_id").alias("vb"), F.col("v").alias("xb"))
    near = (
        pairs.join(ea, "va")
        .join(eb, "vb")
        .filter(_q9col(cosine("xa", "xb")) >= SEM_TAU)
    )
    return {(r["va"], r["vb"]) for r in near.select("va", "vb").collect()}


def test_multiprobe_recall_superset_and_monotone(spark, sf_dir):
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in sim_cosine_neardup(spark, sf_dir).collect()
    }
    single = _found_pairs(spark, sf_dir, 1)
    multi = _found_pairs(spark, sf_dir, 2)

    # structural superset: widening the probe can never lose a pair
    assert single <= multi, sorted(single - multi)[:5]
    # both are candidate-restricted subsets of the exact quadratic truth
    assert single <= exact and multi <= exact

    if exact:
        r1 = len(single) / len(exact)
        r2 = len(multi) / len(exact)
        assert r2 >= r1
        # absolute floor: 2-probe over 16 cells must see at least half
        # the true pairs (measured: 0.571 vs 0.143 single at sf0.001 —
        # a 4x recall gain; the tail misses straddle 3+ cells)
        assert r2 >= 0.5, f"multiprobe recall {r2:.3f} vs single {r1:.3f}"
