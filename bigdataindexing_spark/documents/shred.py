"""Shred (normalize) hierarchical plan documents into flat relations.

Spark-native equivalent of the reference's recursive Redis shredding
(PlanService.java:26–85): where the reference writes one KV pair per nested
object plus string-encoded relation keys, we produce one DataFrame per
objectType plus an ``edges`` relation — the adjacency list as a real table:

    plans(object_id, org, plan_type, creation_date)
    plan_services(object_id, org)
    services(object_id, org, name)
    member_cost_shares(object_id, org, deductible, copay)
    edges(parent_type, parent_id, field, ord, child_type, child_id)

Array order (the reference's ``Arrays.toString`` rendering,
PlanService.java:66) is carried as the explicit ``ord`` column from
``posexplode`` so reassembly is deterministic through any shuffle.

At scale: shredding is a handful of narrow projections + one posexplode —
no shuffle at all until the per-type writes; each output table can be
written partitioned/bucketed by object_id.
"""

from __future__ import annotations

from dataclasses import dataclass, fields

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ShreddedTables:
    plans: DataFrame
    plan_services: DataFrame
    services: DataFrame
    member_cost_shares: DataFrame
    edges: DataFrame

    def as_dict(self) -> dict[str, DataFrame]:
        return {f.name: getattr(self, f.name) for f in fields(self)}


def _cost_share_rows(col: F.Column) -> list[F.Column]:
    return [
        col.getField("objectId").alias("object_id"),
        col.getField("_org").alias("org"),
        col.getField("deductible").alias("deductible"),
        col.getField("copay").alias("copay"),
    ]


def shred(docs: DataFrame, doc_col: str = "doc") -> ShreddedTables:
    """Normalize parsed plan docs (struct column) into per-type tables."""
    d = F.col(doc_col)
    plans = docs.select(
        d.getField("objectId").alias("object_id"),
        d.getField("_org").alias("org"),
        d.getField("planType").alias("plan_type"),
        d.getField("creationDate").alias("creation_date"),
    )

    pcs = docs.select(d.getField("planCostShares").alias("cs"))
    # linkedPlanServices elements with their ordinal
    lps = docs.select(
        d.getField("objectId").alias("plan_id"),
        F.posexplode_outer(d.getField("linkedPlanServices")).alias("ord", "ps"),
    ).filter(F.col("ps").isNotNull())

    plan_services = lps.select(
        F.col("ps").getField("objectId").alias("object_id"),
        F.col("ps").getField("_org").alias("org"),
    ).filter(F.col("object_id").isNotNull())
    services = lps.select(
        F.col("ps").getField("linkedService").getField("objectId").alias("object_id"),
        F.col("ps").getField("linkedService").getField("_org").alias("org"),
        F.col("ps").getField("linkedService").getField("name").alias("name"),
    ).filter(F.col("object_id").isNotNull())
    pscs = lps.select(F.col("ps").getField("planserviceCostShares").alias("cs"))
    member_cost_shares = (
        pcs.select(*_cost_share_rows(F.col("cs")))
        .unionByName(pscs.select(*_cost_share_rows(F.col("cs"))))
        .filter(F.col("object_id").isNotNull())
    )

    def edge(parent_type, parent_id, field, ord_col, child_type, child_id):
        return [
            F.lit(parent_type).alias("parent_type"),
            parent_id.alias("parent_id"),
            F.lit(field).alias("field"),
            ord_col.alias("ord"),
            F.lit(child_type).alias("child_type"),
            child_id.alias("child_id"),
        ]

    e1 = docs.select(
        *edge(
            "plan",
            d.getField("objectId"),
            "planCostShares",
            F.lit(0),
            "membercostshare",
            d.getField("planCostShares").getField("objectId"),
        )
    )
    e2 = lps.select(
        *edge(
            "plan",
            F.col("plan_id"),
            "linkedPlanServices",
            F.col("ord"),
            "planservice",
            F.col("ps").getField("objectId"),
        )
    )
    e3 = lps.select(
        *edge(
            "planservice",
            F.col("ps").getField("objectId"),
            "linkedService",
            F.lit(0),
            "service",
            F.col("ps").getField("linkedService").getField("objectId"),
        )
    )
    e4 = lps.select(
        *edge(
            "planservice",
            F.col("ps").getField("objectId"),
            "planserviceCostShares",
            F.lit(0),
            "membercostshare",
            F.col("ps").getField("planserviceCostShares").getField("objectId"),
        )
    )
    # sparse patch documents may omit child objects entirely — a null
    # child_id is "field not present", not an edge
    edges = (
        e1.unionByName(e2)
        .unionByName(e3)
        .unionByName(e4)
        .filter(F.col("child_id").isNotNull())
    )
    return ShreddedTables(plans, plan_services, services, member_cost_shares, edges)


def write_tables(tables: ShreddedTables, out_dir: str) -> None:
    """Materialize the shredded store as Parquet (the Redis replacement)."""
    for name, df in tables.as_dict().items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def read_tables(spark, out_dir: str) -> ShreddedTables:
    return ShreddedTables(
        **{
            name: spark.read.parquet(f"{out_dir}/{name}.parquet")
            for name in ("plans", "plan_services", "services", "member_cost_shares", "edges")
        }
    )
