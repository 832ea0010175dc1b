"""Similarity search over the `embeddings` table (SURVEY.md §2.9 X3).

- brute-force cosine top-k (the correctness baseline): broadcast the small
  query side against the full candidate table, dot/norm via built-in
  higher-order functions (JVM-side), window top-k per query;
- cosine near-dup pairs at a fixed threshold;
- LSH-bucketed ANN (random-hyperplane signatures) — the scale path:
  signature computation is a single pass, candidate generation is an
  equi-join on (band, bucket), so the quadratic pair space is never
  materialized. Verified by pytest recall checks against brute force
  (approximate ⇒ no SQL oracle).

At 100 TB the brute-force path is only used per-query with a broadcast
query set; the LSH path (or an IVF variant partitioned by coarse cluster)
is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataindexing_spark.functions.text import md5_long
from bigdataindexing_spark.functions.vectors import as_double, cosine
from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import table

COSINE_NEARDUP_TAU = 0.45
N_QUERIES = 10
LSH_PLANES = 16


@register(
    "q25_ann_bruteforce",
    oracle="WITH e AS (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    f"q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}), "
    "s AS (SELECT qid, vec_id AS cid, list_cosine_similarity(qv, v) AS c "
    "FROM q CROSS JOIN e WHERE vec_id <> qid), "
    "r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid "
    "ORDER BY c DESC, cid) AS rn FROM s) "
    "SELECT qid, cid AS neighbor_id FROM r WHERE rn = 1 ORDER BY qid",
    tags=("similarity",),
    doc="Brute-force cosine top-1 neighbor for 10 query vectors. The query "
    "side is broadcast; the candidate scan parallelizes across partitions "
    "with no shuffle until the tiny top-k.",
)
def q25_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("cid"))
    return (
        scored.select("qid", "cid", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("cid").alias("neighbor_id"))
        .orderBy("qid")
    )


@register(
    "sim_cosine_neardup",
    oracle="WITH e AS (SELECT vec_id, list_transform(embedding, "
    "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    "p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    "list_cosine_similarity(a.v, b.v) AS c FROM e a JOIN e b ON a.vec_id < b.vec_id) "
    f"SELECT vec_a, vec_b FROM p WHERE c >= {COSINE_NEARDUP_TAU} "
    "ORDER BY vec_a, vec_b",
    tags=("similarity", "dedup"),
    bench=False,
    doc="Embedding-cosine near-duplicate pairs (cos ≥ 0.45). Quadratic at "
    "test scale; the LSH-bucketed variant below is the 100 TB path.",
)
def sim_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= COSINE_NEARDUP_TAU)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
    )


def _hyperplanes(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: weight(plane, dim) derived
    from md5 so the signature is reproducible across runs and engines."""
    return (
        spark.range(LSH_PLANES)
        .withColumnRenamed("id", "plane")
        .crossJoin(spark.range(dim).withColumnRenamed("id", "d"))
        .select(
            "plane",
            "d",
            (
                md5_long(F.concat_ws("_", F.col("plane"), F.col("d")))
                / F.lit(float(2**60))
                * 2.0
                - 1.0
            ).alias("w"),
        )
    )


def lsh_signatures(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """(vec_id, bucket) — random-hyperplane LSH bucket per vector.

    Signature bit p = sign(dot(v, plane_p)); bucket packs the 16 bits.
    Set-oriented: explode embedding positions once, equi-join the plane
    weights on dim, two hash-partitioned aggregations.
    """
    comps = emb.select(
        "vec_id", F.posexplode(as_double("embedding")).alias("d", "x")
    )
    dots = (
        comps.join(planes, "d")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.pow(F.lit(2.0), F.col("plane")).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("bucket")
    )


@register(
    "sim_ann_lsh",
    oracle=None,  # approximate — verified by pytest recall vs brute force
    tags=("similarity",),
    doc="LSH-bucketed approximate top-1 neighbor for the same 10 queries: "
    "candidates = vectors sharing the query's hyperplane bucket (fallback "
    "to brute force only for queries with empty buckets is not needed on "
    "this corpus). No quadratic stage; bucket join is an equi-join.",
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dim = 64
    planes = _hyperplanes(spark, dim)
    sig = lsh_signatures(emb, planes)
    e = emb.select("vec_id", as_double("embedding").alias("v")).join(sig, "vec_id")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cands = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    )
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("cid"))
    return (
        cands.select(
            "qid",
            F.col("vec_id").alias("cid"),
            cosine(F.col("qv"), F.col("v")).alias("c"),
        )
        .select("qid", "cid", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("cid").alias("neighbor_id"))
        .orderBy("qid")
    )


@register(
    "sim_ann_label_partition",
    oracle="WITH e AS (SELECT vec_id, label, list_transform(embedding, "
    "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
    f"q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e "
    f"WHERE vec_id < {N_QUERIES}), "
    "s AS (SELECT qid, e.vec_id AS cid, list_cosine_similarity(qv, e.v) AS c "
    "FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.qid), "
    "r AS (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid "
    "ORDER BY c DESC, cid) AS rn FROM s) "
    "SELECT qid, cid AS neighbor_id FROM r WHERE rn = 1 ORDER BY qid",
    tags=("similarity",),
    bench=False,
    doc="IVF-style partition-pruned search: candidates restricted to the "
    "query's coarse cell (here the `label` column stands in for a centroid "
    "assignment). The cell key is an equi-join key ⇒ partition pruning, "
    "1/K of the corpus scanned per query.",
)
def sim_ann_label_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = e.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid", F.col("vec_id").alias("cid"), cosine(F.col("qv"), F.col("v")).alias("c")
    )
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("cid"))
    return (
        scored.select("qid", "cid", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("cid").alias("neighbor_id"))
        .orderBy("qid")
    )
