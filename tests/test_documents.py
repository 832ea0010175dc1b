"""Executable contracts for the document pipeline (SURVEY.md §5.2).

These pin the semantics of the reference's core operators —
shred (PlanService.java:26–85), reassemble (:87–133), merge (:218–261,
with the §4.2-6 array bug fixed), cascade delete (:135–200), schema
validation (PlanController.java:88–95) and ETag (:111–131) — as behavior
contracts, since the reference itself ships no tests.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdataindexing_spark.documents import delete as del_mod
from bigdataindexing_spark.documents import etag as etag_mod
from bigdataindexing_spark.documents import merge as merge_mod
from bigdataindexing_spark.documents.reassemble import reassemble
from bigdataindexing_spark.documents.schema import (
    PLAN_SCHEMA,
    REQUIRED_PATHS,
    make_plan,
    parsed_plans,
    raw_plan_json,
)
from bigdataindexing_spark.documents.shred import shred
from bigdataindexing_spark.documents.validate import validate

N_DOCS = 20


@pytest.fixture(scope="module")
def store(spark):
    docs = parsed_plans(spark, N_DOCS)
    t = shred(docs)
    for df in t.as_dict().values():
        df.cache().count()
    yield t
    for df in t.as_dict().values():
        df.unpersist()


def _docs_json(df, doc_col="doc"):
    rows = df.select(
        F.col(doc_col).getField("objectId").alias("id"),
        F.to_json(doc_col).alias("js"),
    ).collect()
    return {r["id"]: json.loads(r["js"]) for r in rows}


def test_shred_reassemble_roundtrip(spark, store):
    original = _docs_json(parsed_plans(spark, N_DOCS))
    rebuilt = _docs_json(reassemble(store))
    assert sorted(original) == sorted(rebuilt)
    for k in original:
        assert rebuilt[k] == original[k], f"roundtrip mismatch for {k}"


def test_shred_table_shapes(store):
    # doc i has i%4 services; 20 docs -> sum(i%4) = 30 planservices
    assert store.plans.count() == N_DOCS
    assert store.plan_services.count() == 30
    assert store.services.count() == 30
    assert store.member_cost_shares.count() == N_DOCS + 30
    # edges: 1 planCostShares per plan + 30 array edges + 2 per planservice
    assert store.edges.count() == N_DOCS + 30 + 60


def test_validation_quarantine(spark):
    raw = raw_plan_json(spark, 5, include_invalid=True)
    valid, quarantine = validate(raw)
    assert valid.count() == 5
    reasons = [set(r["reason"]) for r in quarantine.collect()]
    assert len(reasons) == 9
    flat = set().union(*reasons)
    assert "objectId" in flat and "planType" in flat
    assert "linkedPlanServices[].linkedService.name" in flat
    # type violation (copay: "not-a-number") -> that leaf parses to null
    assert "planCostShares.copay" in flat
    # the unparseable body quarantines with every required path missing
    # (PERMISSIVE from_json yields an all-null struct for garbage input)
    assert any(len(r) >= len(REQUIRED_PATHS) for r in reasons)


def test_merge_scalar_overwrite(spark, store):
    patch = spark.createDataFrame(
        [(json.dumps({"objectId": "plan-5", "planType": "outOfNetwork"}),)],
        "value string",
    ).select(F.from_json("value", PLAN_SCHEMA).alias("doc"))
    merged = merge_mod.merge(store, patch)
    docs = _docs_json(reassemble(merged))
    assert docs["plan-5"]["planType"] == "outOfNetwork"
    # untouched fields and sibling docs unchanged
    assert docs["plan-5"]["creationDate"] == make_plan(5)["creationDate"]
    assert docs["plan-4"] == _docs_json(parsed_plans(spark, N_DOCS))["plan-4"]


def test_merge_object_field_merge(spark, store):
    # same objectId -> field-wise merge (copay changes, deductible kept)
    patch_doc = {
        "objectId": "plan-6",
        "planCostShares": {"objectId": "mcs-p6", "copay": 99},
    }
    patch = spark.createDataFrame([(json.dumps(patch_doc),)], "value string").select(
        F.from_json("value", PLAN_SCHEMA).alias("doc")
    )
    docs = _docs_json(reassemble(merge_mod.merge(store, patch)))
    cs = docs["plan-6"]["planCostShares"]
    assert cs["copay"] == 99
    assert cs["deductible"] == make_plan(6)["planCostShares"]["deductible"]
    assert cs["_org"] == make_plan(6)["planCostShares"]["_org"]


def test_merge_array_upsert_existing(spark, store):
    # plan-7 has services ps-7-0..2; patch element ps-7-1 with new copay
    patch_doc = {
        "objectId": "plan-7",
        "linkedPlanServices": [
            {
                "objectId": "ps-7-1",
                "planserviceCostShares": {"objectId": "mcs-s7-1", "copay": 177},
            }
        ],
    }
    patch = spark.createDataFrame([(json.dumps(patch_doc),)], "value string").select(
        F.from_json("value", PLAN_SCHEMA).alias("doc")
    )
    docs = _docs_json(reassemble(merge_mod.merge(store, patch)))
    lps = docs["plan-7"]["linkedPlanServices"]
    # order preserved: ps-7-0, ps-7-1, ps-7-2
    assert [e["objectId"] for e in lps] == ["ps-7-0", "ps-7-1", "ps-7-2"]
    assert lps[1]["planserviceCostShares"]["copay"] == 177
    # merged, not replaced: linkedService untouched
    assert lps[1]["linkedService"]["objectId"] == "svc-7-1"


def test_merge_array_upsert_new_appends(spark, store):
    # §4.2-6 contract: unknown objectId appends; nothing is removed
    new_elem = make_plan(7)["linkedPlanServices"][0].copy()
    new_elem["objectId"] = "ps-7-99"
    patch_doc = {"objectId": "plan-7", "linkedPlanServices": [new_elem]}
    patch = spark.createDataFrame([(json.dumps(patch_doc),)], "value string").select(
        F.from_json("value", PLAN_SCHEMA).alias("doc")
    )
    docs = _docs_json(reassemble(merge_mod.merge(store, patch)))
    lps = docs["plan-7"]["linkedPlanServices"]
    assert [e["objectId"] for e in lps] == [
        "ps-7-0",
        "ps-7-1",
        "ps-7-2",
        "ps-7-99",
    ]


def test_cascade_delete(spark, store):
    after = del_mod.cascade_delete(store, ["plan-7"])
    assert after.plans.filter(F.col("object_id") == "plan-7").count() == 0
    # plan-7's closure: 3 planservices + their services + 4 cost shares
    assert after.plan_services.filter(
        F.col("object_id").startswith("ps-7-")
    ).count() == 0
    assert after.services.filter(F.col("object_id").startswith("svc-7-")).count() == 0
    assert (
        after.member_cost_shares.filter(
            F.col("object_id").isin("mcs-p7", "mcs-s7-0", "mcs-s7-1", "mcs-s7-2")
        ).count()
        == 0
    )
    assert after.edges.filter(F.col("parent_id").startswith("ps-7-")).count() == 0
    # nothing else touched
    assert after.plans.count() == N_DOCS - 1
    rebuilt = _docs_json(reassemble(after))
    assert rebuilt["plan-6"] == _docs_json(parsed_plans(spark, N_DOCS))["plan-6"]


def test_etag_contract(spark, store):
    docs = reassemble(store)
    tagged = etag_mod.with_etag(docs)
    etags = {r["object_id"]: r["etag"] for r in tagged.collect()}
    # deterministic: recompute -> identical
    etags2 = {r["object_id"]: r["etag"] for r in etag_mod.with_etag(reassemble(store)).collect()}
    assert etags == etags2
    # any field change -> different etag
    patch = spark.createDataFrame(
        [(json.dumps({"objectId": "plan-5", "planType": "CHANGED"}),)], "value string"
    ).select(F.from_json("value", PLAN_SCHEMA).alias("doc"))
    etags3 = {
        r["object_id"]: r["etag"]
        for r in etag_mod.with_etag(reassemble(merge_mod.merge(store, patch))).collect()
    }
    assert etags3["plan-5"] != etags["plan-5"]
    assert etags3["plan-6"] == etags["plan-6"]
    # if_none_match: client holding current etags fetches nothing; a stale
    # client fetches exactly the changed doc
    client = spark.createDataFrame(
        [(k, v) for k, v in etags.items()], "object_id string, etag string"
    )
    refetch = etag_mod.if_none_match(etag_mod.with_etag(reassemble(store)), client)
    assert refetch.count() == 0
    refetch2 = etag_mod.if_none_match(
        etag_mod.with_etag(reassemble(merge_mod.merge(store, patch))), client
    )
    assert [r["object_id"] for r in refetch2.collect()] == ["plan-5"]


def test_replace_put_semantics(spark, store):
    """Full-replace (PUT): replace ≡ cascade-delete closure + save, and
    ≠ merge — children absent from the replacement vanish
    (PlanService.java:202–215 updatePlan semantics, atomic here)."""
    from bigdataindexing_spark.documents import contracts as C

    repl = C._replacement_docs(spark)
    replaced = _docs_json(reassemble(merge_mod.replace(store, repl)))
    original = _docs_json(parsed_plans(spark, N_DOCS))
    # delete-then-save semantics at the document level: everything else
    # untouched, plan-3 is exactly the replacement body
    expected = dict(original)
    expected["plan-3"] = C.REPLACEMENT_PLAN_3
    assert replaced == expected
    # field-removal case separates replace from merge: plan-3's original
    # children ps-3-0/1/2 are absent from the replacement
    assert [
        e["objectId"] for e in replaced["plan-3"]["linkedPlanServices"]
    ] == ["ps-3-9"]
    merged = _docs_json(reassemble(merge_mod.merge(store, repl)))
    assert [
        e["objectId"] for e in merged["plan-3"]["linkedPlanServices"]
    ] == ["ps-3-0", "ps-3-1", "ps-3-2", "ps-3-9"]
    # the old closure is gone from the physical store, not just hidden by
    # reassembly
    t2 = merge_mod.replace(store, repl)
    ps_ids = {r["object_id"] for r in t2.plan_services.select("object_id").collect()}
    assert "ps-3-0" not in ps_ids and "ps-3-9" in ps_ids
    mcs_ids = {
        r["object_id"] for r in t2.member_cost_shares.select("object_id").collect()
    }
    assert "mcs-p3" not in mcs_ids and "mcs-p3-new" in mcs_ids


def test_precondition_gate(spark, store):
    """If-Match conditional write (PlanController.java:213–221): fresh ETag
    applies, stale ETag → 412, missing ETag or unknown target → 404, and
    rejected attempts leave the store byte-identical."""
    from bigdataindexing_spark.documents import etag as etag_mod
    from bigdataindexing_spark.documents.contracts import doc_precondition

    rows = {r["check"]: r["ok"] for r in doc_precondition(spark, "").collect()}
    assert rows == {
        "fresh_etag_applied": True,
        "rejected_targets_unwritten": True,
        "reject_statuses": True,
    }

    # unit-level: the gate's split is exact — accepted carries ONLY the
    # fresh-etag attempt, rejected carries the other three with the right
    # status codes
    docs = etag_mod.with_etag(reassemble(store))
    cur5 = (
        docs.filter(F.col("object_id") == "plan-5")
        .select("etag")
        .collect()[0][0]
    )
    attempts = spark.createDataFrame(
        [
            ("plan-5", cur5),
            ("plan-6", "deadbeef"),
            ("plan-7", None),
            ("plan-999", "cafebabe"),
        ],
        "object_id STRING, if_match STRING",
    )
    accepted, rejected = etag_mod.precondition_gate(docs, attempts)
    assert [r["object_id"] for r in accepted.collect()] == ["plan-5"]
    rej = {r["object_id"]: r["status"] for r in rejected.collect()}
    assert rej == {"plan-6": 412, "plan-7": 404, "plan-999": 404}
