"""Inverted-index build (SURVEY.md §2.9 X5) — the reference's core purpose
(async Elasticsearch indexing, IndexingListener.java:115–125) re-expressed
as a batch DataFrame job producing Parquet index tables.

Two tables:
- ``postings(token, df, doc_ids)`` — one row per token with document
  frequency and the sorted posting list;
- ``term_rows(token, doc_id, tf)`` — the flat exploded form used for
  join-shaped term lookups (this is what search queries actually hit; the
  collect_list form is for export/serving).

Scale notes: the explode→groupBy(token) is one shuffle keyed by token;
writes are ``sortWithinPartitions(token)`` so Parquet row-group statistics
give term-lookup skipping at serve time (the Spark-native analogue of the
reference's ES inverted index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataindexing_spark.functions.text import tokens


def term_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(token, doc_id, tf) — term frequency per document."""
    return (
        docs.select(id_col, F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(token, df, doc_ids) — posting lists, sorted for determinism."""
    rows = term_rows(docs, id_col, text_col)
    return rows.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
    )


def write_index(docs: DataFrame, out_dir: str) -> None:
    """Materialize both index tables, sorted-within-partitions by token.

    The flat rows are computed ONCE (persisted) and both tables derive
    from them — the postings aggregation reads the cached rows instead of
    re-tokenizing the corpus, halving the build's scan+explode work."""
    rows = term_rows(docs).persist()
    try:
        rows.repartition("token").sortWithinPartitions("token").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/term_rows.parquet")
        rows.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        ).repartition("token").sortWithinPartitions("token").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/postings.parquet")
    finally:
        rows.unpersist()
