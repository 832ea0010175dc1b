"""Content-hash ETags for documents.

Replaces the reference's ``plan.hashCode()`` ETag
(PlanController.java:111–112, 141–142) — which is JVM-instance-specific and
held in a per-process HashMap (:41), breaking with >1 replica — with a
deterministic sha256 of the canonical JSON rendering. Canonical because
``to_json`` of a struct renders fields in schema order, which is fixed by
PLAN_SCHEMA.

Conditional semantics (If-None-Match 304 / If-Match 412,
PlanController.java:127–131, 213–221) become pure column comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_etag(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    return docs.withColumn("etag", F.sha2(F.to_json(F.col(doc_col)), 256))


def precondition_gate(
    docs_with_etag: DataFrame,
    attempts: DataFrame,
    if_match_col: str = "if_match",
) -> tuple[DataFrame, DataFrame]:
    """Split write attempts by the If-Match precondition
    (PlanController.java:213–221).

    ``attempts`` carries ``object_id`` plus an ``if_match`` column (the
    client's presented ETag, nullable). Returns ``(accepted, rejected)``:

    - **accepted** — attempts whose ``if_match`` equals the target's
      current content ETag; these are safe to hand to ``merge``/``replace``.
    - **rejected** — the quarantine relation, with ``status``/``reason``
      columns mirroring the reference's behavior: **404** when no ETag was
      presented (PlanController.java:214–217 throws ResourceNotFound for a
      missing If-Match) or the target does not exist, **412** when an ETag
      was presented but is stale (:218–221, PreConditionFailedException).

    Pure column comparisons over one broadcast-able join — no per-request
    state; the reference's per-JVM ``cacheMap`` (:41) becomes the
    recomputable content hash, so the gate is replica-safe.
    """
    cur = docs_with_etag.select(
        "object_id", F.col("etag").alias("current_etag")
    )
    j = attempts.join(cur, "object_id", "left")
    missing = F.col(if_match_col).isNull() | (F.col(if_match_col) == "")
    unknown = F.col("current_etag").isNull()
    stale = F.col(if_match_col) != F.col("current_etag")
    rejected = j.filter(missing | unknown | stale).select(
        "object_id",
        F.when(missing | unknown, F.lit(404)).otherwise(F.lit(412)).alias(
            "status"
        ),
        F.when(missing, F.lit("etag not provided in request"))
        .when(unknown, F.lit("resource not found"))
        .otherwise(F.lit("etag in request does not match current hash"))
        .alias("reason"),
    )
    accepted = j.filter(~missing & ~unknown & ~stale).drop("current_etag")
    return accepted, rejected


def if_none_match(docs_with_etag: DataFrame, client_etags: DataFrame) -> DataFrame:
    """Rows the client must re-fetch (etag differs or unknown id) —
    the 304 short-circuit is the complement."""
    c = client_etags.select(
        F.col("object_id"), F.col("etag").alias("client_etag")
    )
    return (
        docs_with_etag.join(c, "object_id", "left")
        .filter(
            F.col("client_etag").isNull() | (F.col("client_etag") != F.col("etag"))
        )
        .drop("client_etag")
    )
