"""Cascade delete over the shredded store.

Spark-native equivalent of the reference's recursive delete
(PlanService.java:135–200): the victim closure is computed by traversing
the ``edges`` relation (fixed 3-level hierarchy ⇒ 2 join hops, no KEYS
glob over the keyspace, PlanService.java:161), then every per-type table
is anti-joined against its slice of the closure. Set-oriented and atomic
per write — readers never observe a half-deleted tree (the reference's
delete-then-reinsert update is not atomic, §4.2-3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataindexing_spark.documents.shred import ShreddedTables


def closure(edges: DataFrame, root_ids: DataFrame, depth: int = 3) -> DataFrame:
    """(obj_type, obj_id) — all objects reachable from the roots.

    ``root_ids`` is a DataFrame with columns (obj_type, obj_id). The
    hierarchy has fixed depth, so a bounded loop of equi-joins suffices
    (each hop is one broadcast-able join against edges).
    """
    frontier = root_ids
    seen = root_ids
    for _ in range(depth - 1):
        children = (
            edges.join(
                frontier,
                (edges.parent_type == frontier.obj_type)
                & (edges.parent_id == frontier.obj_id),
            )
            .select(
                F.col("child_type").alias("obj_type"),
                F.col("child_id").alias("obj_id"),
            )
            .distinct()
        )
        frontier = children
        seen = seen.unionByName(children).distinct()
    return seen


def cascade_delete(t: ShreddedTables, plan_ids: list[str]) -> ShreddedTables:
    """Remove the given plans and their full object closure."""
    spark = t.plans.sparkSession
    # literal array, not createDataFrame: the roots relation is rescanned
    # on every closure hop, and a Python-RDD-backed scan pays a Python
    # worker round trip per rescan (see schema.local_strings_df)
    roots = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit("plan").alias("obj_type"),
                        F.lit(i).alias("obj_id"),
                    )
                    for i in plan_ids
                ]
            )
        ).alias("r")
    ).select("r.obj_type", "r.obj_id")
    return cascade_delete_roots(t, roots)


def cascade_delete_roots(t: ShreddedTables, roots: DataFrame) -> ShreddedTables:
    """Cascade delete with the victim roots as a DataFrame(obj_type,
    obj_id) — keeps the whole delete inside one lazy plan (no driver-side
    id list), which is what full-replace composes on."""
    victims = closure(t.edges, roots)

    def prune(df: DataFrame, obj_type: str) -> DataFrame:
        vs = victims.filter(F.col("obj_type") == obj_type).select(
            F.col("obj_id").alias("object_id")
        )
        return df.join(vs, "object_id", "left_anti")

    edges = t.edges.join(
        victims,
        (t.edges.parent_type == victims.obj_type)
        & (t.edges.parent_id == victims.obj_id),
        "left_anti",
    )
    return ShreddedTables(
        plans=prune(t.plans, "plan"),
        plan_services=prune(t.plan_services, "planservice"),
        services=prune(t.services, "service"),
        member_cost_shares=prune(t.member_cost_shares, "membercostshare"),
        edges=edges,
    )
