"""Search queries served through the inverted index (SURVEY.md §2.9 X5).

The declared queries run the index build inside the plan (build + lookup in
one DAG) so the oracle can verify end-to-end equivalence with a raw scan
formulation (`LIKE`-padded containment ≡ posting-list membership under
space tokenization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.index.build import term_rows
from bigdataindexing_spark.registry import register
from bigdataindexing_spark.tables import spread, table


@register(
    "idx_term_lookup",
    oracle="SELECT doc_id FROM documents "
    "WHERE ' ' || lower(text) || ' ' LIKE '% spark %' ORDER BY doc_id",
    tags=("index",),
    doc="Term lookup through the inverted index: build postings, probe one "
    "token. Oracle is the equivalent full-scan LIKE — the index result must "
    "match the scan exactly.",
)
def idx_term_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = term_rows(spread(table(spark, sf_dir, "documents")))
    return (
        rows.filter(F.col("token") == "spark").select("doc_id").orderBy("doc_id")
    )


@register(
    "idx_top_terms",
    oracle="WITH u AS (SELECT DISTINCT doc_id, UNNEST(string_split(lower(text), ' ')) "
    "AS token FROM documents) "
    "SELECT token, COUNT(*) AS df FROM u WHERE token <> '' GROUP BY token "
    "ORDER BY df DESC, token LIMIT 10",
    tags=("index",),
    doc="Document-frequency top-10 terms from the postings table.",
)
def idx_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = term_rows(spread(table(spark, sf_dir, "documents")))
    return (
        rows.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "token")
        .limit(10)
    )


@register(
    "idx_delete_anti_join",
    oracle="WITH u AS (SELECT DISTINCT doc_id, UNNEST(string_split(lower(text), ' ')) "
    "AS token FROM documents WHERE doc_id >= 100) "
    "SELECT token, COUNT(*) AS df FROM u WHERE token <> '' GROUP BY token "
    "ORDER BY df DESC, token LIMIT 10",
    tags=("index",),
    doc="S6 document deletion from the index: left-anti join of the flat "
    "postings rows against the deleted-id set, then re-aggregate — the "
    "Spark rewrite of the reference's per-document Elasticsearch DELETE "
    "(IndexingListener.java:127–131). The oracle is the index rebuilt from "
    "the surviving documents.",
)
def idx_delete_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"))
    rows = term_rows(docs)
    deletes = docs.select("doc_id").filter(F.col("doc_id") < 100)
    remaining = rows.join(F.broadcast(deletes), "doc_id", "left_anti")
    return (
        remaining.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "token")
        .limit(10)
    )
