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
