"""bigdataindexing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
(`shah-tejas/BigDataIndexing`, a Spring Boot + Redis + Elasticsearch JSON
document store): hierarchical-document ingestion with schema validation,
normalization (shredding) into flat relations, reassembly, merge/patch
semantics, cascade delete, change capture + async index build, and a
search-query surface (match / nested / wildcard / range), plus a full
relational query layer and LLM-data-pipeline extensions (dedup, similarity
search, text analysis) — all implemented Spark-first with the DataFrame/SQL
API so Catalyst/Tungsten pick the physical strategy.

Nothing here is a translation of the reference's Java; see SURVEY.md for the
capability mapping (file:line citations into /root/reference).
"""

__version__ = "0.1.0"
