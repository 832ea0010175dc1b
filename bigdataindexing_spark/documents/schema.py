"""Plan-document schema + deterministic fixtures.

The document shape mirrors the reference's canonical sample
(/root/reference/usecase.json:1–53) and its JSON Schema
(/root/reference/bdi-demo/src/main/resources/plan-schema.json): a 3-level
hierarchy plan → {planCostShares, linkedPlanServices[]} →
{linkedService, planserviceCostShares}, every object carrying
(objectId, objectType, _org).

The declared write-schema is a Spark StructType; draft-07 `required` sets
(plan-schema.json:7–15, 21–27, 87–93, 99–104, 152–158) become null-check
predicates in validate.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cost_share_type() -> T.StructType:
    return T.StructType(
        [
            T.StructField("objectId", T.StringType()),
            T.StructField("objectType", T.StringType()),
            T.StructField("_org", T.StringType()),
            T.StructField("deductible", T.LongType()),
            T.StructField("copay", T.LongType()),
        ]
    )


SERVICE_TYPE = T.StructType(
    [
        T.StructField("objectId", T.StringType()),
        T.StructField("objectType", T.StringType()),
        T.StructField("_org", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

PLAN_SERVICE_TYPE = T.StructType(
    [
        T.StructField("objectId", T.StringType()),
        T.StructField("objectType", T.StringType()),
        T.StructField("_org", T.StringType()),
        T.StructField("linkedService", SERVICE_TYPE),
        T.StructField("planserviceCostShares", _cost_share_type()),
    ]
)

PLAN_SCHEMA = T.StructType(
    [
        T.StructField("objectId", T.StringType()),
        T.StructField("objectType", T.StringType()),
        T.StructField("_org", T.StringType()),
        T.StructField("planType", T.StringType()),
        T.StructField("creationDate", T.StringType()),
        T.StructField("planCostShares", _cost_share_type()),
        T.StructField("linkedPlanServices", T.ArrayType(PLAN_SERVICE_TYPE)),
    ]
)

# draft-07 `required` sets, expressed as struct-relative column paths
REQUIRED_PATHS = [
    "objectId",
    "objectType",
    "_org",
    "planType",
    "creationDate",
    "planCostShares",
    "planCostShares.objectId",
    "planCostShares.objectType",
    "planCostShares._org",
    "planCostShares.deductible",
    "planCostShares.copay",
]
# required fields inside each linkedPlanServices element
REQUIRED_ELEMENT_PATHS = [
    "objectId",
    "objectType",
    "_org",
    "linkedService",
    "linkedService.objectId",
    "linkedService.name",
    "planserviceCostShares",
    "planserviceCostShares.copay",
]

_ORGS = ("example.com", "acme.com", "globex.org")
_PLAN_TYPES = ("inNetwork", "outOfNetwork")
_DEDUCTIBLES = (0, 10, 1000, 2000)
_SERVICE_NAMES = ("Yearly physical", "well baby", "Dental checkup", "X ray", "MRI scan")


def make_plan(i: int) -> dict:
    """Deterministic synthetic plan document #i (usecase.json shape)."""
    n_services = i % 4
    return {
        "objectId": f"plan-{i}",
        "objectType": "plan",
        "_org": _ORGS[i % 3],
        "planType": _PLAN_TYPES[i % 2],
        "creationDate": f"{(i % 28) + 1:02d}-{(i % 12) + 1:02d}-20{10 + i % 9}",
        "planCostShares": {
            "objectId": f"mcs-p{i}",
            "objectType": "membercostshare",
            "_org": _ORGS[i % 3],
            "deductible": _DEDUCTIBLES[i % 4],
            "copay": (i * 7) % 200,
        },
        "linkedPlanServices": [
            {
                "objectId": f"ps-{i}-{j}",
                "objectType": "planservice",
                "_org": _ORGS[i % 3],
                "linkedService": {
                    "objectId": f"svc-{i}-{j}",
                    "objectType": "service",
                    "_org": _ORGS[i % 3],
                    "name": _SERVICE_NAMES[(i + j) % 5],
                },
                "planserviceCostShares": {
                    "objectId": f"mcs-s{i}-{j}",
                    "objectType": "membercostshare",
                    "_org": _ORGS[i % 3],
                    "deductible": _DEDUCTIBLES[(i + j + 1) % 4],
                    "copay": (i * 11 + j * 3) % 200,
                },
            }
            for j in range(n_services)
        ],
    }


def invalid_plans() -> list[str]:
    """Negative-validation fixtures (FIXTURES.md): one per missing required
    root field, one missing nested required, one type violation."""
    docs: list[str] = []
    for missing in ("objectId", "objectType", "_org", "planType", "creationDate",
                    "planCostShares"):
        d = make_plan(1)
        del d[missing]
        docs.append(json.dumps(d))
    d = make_plan(2)
    del d["linkedPlanServices"][0]["linkedService"]["name"]
    docs.append(json.dumps(d))
    d = make_plan(3)
    d["planCostShares"]["copay"] = "not-a-number"
    docs.append(json.dumps(d))
    docs.append("{not valid json at all")
    return docs


def raw_plan_json(spark: SparkSession, n: int = 20, include_invalid: bool = False) -> DataFrame:
    """DataFrame(value string) of raw JSON document bodies — the Spark
    analogue of the reference's HTTP POST body stream."""
    values = [json.dumps(make_plan(i)) for i in range(n)]
    if include_invalid:
        values += invalid_plans()
    return local_strings_df(spark, values)


def local_strings_df(spark: SparkSession, values: list[str]) -> DataFrame:
    """(value string) DataFrame over driver-local strings, as a JVM plan.

    ``spark.createDataFrame(local_rows)`` backs the scan with a
    Python-pickled RDD: every downstream job that rescans it pays a
    Python-worker round trip (~2s per action for the 20-document corpus —
    measured; the multi-join contracts rescan it a dozen times). A literal
    array + explode keeps the same rows entirely JVM-side (13x faster) and
    is the honest representation of a driver-synthesized fixture. Real
    ingest reads files and never hits this path.
    """
    return spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in values])).alias("value")
    )


def parsed_plans(spark: SparkSession, n: int = 20) -> DataFrame:
    """Valid plan documents parsed to the declared schema: (doc struct)."""
    raw = raw_plan_json(spark, n)
    return raw.select(F.from_json("value", PLAN_SCHEMA).alias("doc"))
