"""Property-based contracts for the document engine (hypothesis).

The deterministic contracts in test_documents.py pin specific examples of
the reference's semantics (PlanService.java:26–261); these generate random
document shapes — varying copays/plan types, truncated service arrays,
random patch subsets — and assert the INVARIANTS that must hold for any
input:

- shred → reassemble is the identity on valid documents;
- merge is idempotent (applying the same patch twice = once);
- a patch carrying only objectIds is a no-op;
- replace (PUT) reproduces exactly the replacement documents — children
  absent from the replacement vanish (the merge/replace distinction).

Examples are kept small (each one runs real Spark jobs); the point is
shape coverage, not volume.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdataindexing_spark.documents import merge as merge_mod
from bigdataindexing_spark.documents.reassemble import reassemble
from bigdataindexing_spark.documents.schema import (
    PLAN_SCHEMA,
    local_strings_df,
    make_plan,
)
from bigdataindexing_spark.documents.shred import shred

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def plan_doc_sets(draw):
    idxs = draw(
        st.lists(st.integers(0, 40), min_size=1, max_size=4, unique=True)
    )
    docs = []
    for i in idxs:
        d = make_plan(i)
        d["planCostShares"]["copay"] = draw(st.integers(0, 500))
        d["planType"] = draw(
            st.sampled_from(["inNetwork", "outOfNetwork"])
        )
        if d["linkedPlanServices"] and draw(st.booleans()):
            d["linkedPlanServices"].pop()
        docs.append(d)
    return docs


def _parse(spark, docs):
    return local_strings_df(spark, [json.dumps(d) for d in docs]).select(
        F.from_json("value", PLAN_SCHEMA).alias("doc")
    )


def _reassembled_json(tables):
    rows = (
        reassemble(tables)
        .select(
            F.col("doc").getField("objectId").alias("id"),
            F.to_json("doc").alias("js"),
        )
        .collect()
    )
    return {r["id"]: json.loads(r["js"]) for r in rows}


def _canon(doc: dict) -> str:
    return json.dumps(doc, sort_keys=True)


@given(docs=plan_doc_sets())
@settings(**SETTINGS)
def test_shred_reassemble_roundtrip_property(spark, docs):
    out = _reassembled_json(shred(_parse(spark, docs)))
    assert len(out) == len(docs)
    for d in docs:
        assert _canon(out[d["objectId"]]) == _canon(d)


@given(docs=plan_doc_sets(), data=st.data())
@settings(**SETTINGS)
def test_merge_idempotent_property(spark, docs, data):
    store = shred(_parse(spark, docs))
    # sparse patch: a random subset of docs, each patching root planType
    # and (where present) one nested cost-share copay
    subset = data.draw(
        st.lists(
            st.sampled_from([d["objectId"] for d in docs]),
            min_size=1,
            max_size=len(docs),
            unique=True,
        )
    )
    patches = []
    for d in docs:
        if d["objectId"] not in subset:
            continue
        p = {
            "objectId": d["objectId"],
            "planType": data.draw(
                st.sampled_from(["inNetwork", "outOfNetwork"])
            ),
            "planCostShares": {
                "objectId": d["planCostShares"]["objectId"],
                "copay": data.draw(st.integers(0, 999)),
            },
        }
        patches.append(p)
    patch_df = _parse(spark, patches)
    once = _reassembled_json(merge_mod.merge(store, patch_df))
    twice = _reassembled_json(
        merge_mod.merge(merge_mod.merge(store, patch_df), patch_df)
    )
    assert {k: _canon(v) for k, v in once.items()} == {
        k: _canon(v) for k, v in twice.items()
    }
    # and the patch actually applied
    for p in patches:
        assert once[p["objectId"]]["planType"] == p["planType"]
        assert (
            once[p["objectId"]]["planCostShares"]["copay"]
            == p["planCostShares"]["copay"]
        )


@given(docs=plan_doc_sets())
@settings(**SETTINGS)
def test_id_only_patch_is_noop(spark, docs):
    store = shred(_parse(spark, docs))
    patch = _parse(
        spark, [{"objectId": d["objectId"]} for d in docs]
    )
    before = _reassembled_json(store)
    after = _reassembled_json(merge_mod.merge(store, patch))
    assert {k: _canon(v) for k, v in before.items()} == {
        k: _canon(v) for k, v in after.items()
    }


@given(docs=plan_doc_sets(), data=st.data())
@settings(**SETTINGS)
def test_replace_reproduces_replacement_exactly(spark, docs, data):
    store = shred(_parse(spark, docs))
    # replacement for one doc: drop ALL services and change a scalar —
    # replace must make the store reflect exactly this document
    victim = data.draw(st.sampled_from(docs))
    repl = make_plan(0)
    repl["objectId"] = victim["objectId"]
    repl["planCostShares"] = dict(
        victim["planCostShares"], copay=data.draw(st.integers(0, 999))
    )
    repl["linkedPlanServices"] = []
    out = _reassembled_json(
        merge_mod.replace(store, _parse(spark, [repl]))
    )
    assert _canon(out[victim["objectId"]]) == _canon(repl)
    # sibling documents untouched
    for d in docs:
        if d["objectId"] != victim["objectId"]:
            assert _canon(out[d["objectId"]]) == _canon(d)
