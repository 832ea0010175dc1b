"""Registry of every session-materialized store (VERDICT r5 #8).

Each entry adapts one build-once/serve-many store accessor to a uniform
``(spark, sf_dir) -> DataFrame`` shape so tests can drive the WHOLE store
layer through hostile session conditions in one parametrized sweep —
most importantly a sibling ``spark.newSession()``, whose fresh catalog
has none of the temp views and whose identity breaks ``is``-cached
DataFrames (the ADVICE-r4 bug class: an application-keyed cache hit
served a view/DataFrame bound to a different session).

ADD EVERY NEW STORE HERE. The paired tests (tests/test_stores.py)
parametrize over this dict; they also cross-check this registry against
the ``session_store_dir(...)`` call sites in the source tree, so a store
added without a registry entry fails the sweep instead of silently
skipping coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Accessor = Callable[[SparkSession, str], DataFrame]


def _shingle_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return dedup.shingle_sig_store(spark, sf_dir)


def _shingle_sig_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return spark.table(dedup.shingle_sig_view(spark, sf_dir))


def _shingle_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return spark.table(dedup.shingle_pair_counts_view(spark, sf_dir))


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return dedup.jaccard_pairs_store(spark, sf_dir)


def _lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return spark.table(dedup.lsh_band_view(spark, sf_dir))


def _simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import dedup

    return dedup.simhash_sig_store(spark, sf_dir)


def _hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import pipeline

    return pipeline.hll_sketch_store(spark, sf_dir)


def _lsh_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    return similarity.lsh_signature_index(spark, sf_dir)


def _lsh_sig_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    return spark.table(similarity.lsh_signature_view(spark, sf_dir))


def _lsh_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    return spark.table(similarity.lsh_postings_view(spark, sf_dir))


def _lsh_base_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    return spark.read.parquet(
        similarity.lsh_base_postings_dir(spark, sf_dir)
    )


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    path, _books = similarity._pq_store(spark, sf_dir)
    return spark.read.parquet(path)


def _cms_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import sketches

    return spark.table(sketches.cms_counters_view(spark, sf_dir))


def _lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import similarity

    return spark.table(similarity.lsh_bucket_stats_view(spark, sf_dir))


def _delta_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import delta_log

    return delta_log.read_delta_snapshot(
        spark, delta_log.build_delta_table(spark, sf_dir)
    )


def _delta_stream_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import delta_log

    return delta_log.read_delta_snapshot(
        spark, delta_log.build_stream_delta_table(spark, sf_dir)
    )


def _maint_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    path, _manifest = maintenance._maintained_layout(spark, sf_dir)
    return spark.read.parquet(path)


def _maint_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    path, versions, _snaps = maintenance._time_travel_layout(spark, sf_dir)
    return maintenance.read_layout_snapshot(
        spark, maintenance.read_manifest_as_of(path, versions[-1])
    )


def _maint_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    path, versions, snaps = maintenance._vacuumed_layout(spark, sf_dir)
    live = [s for s in snaps if s is not None]
    return live[-1]  # the current (post-vacuum) snapshot


def _clustered_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import skipping

    path, _manifest = skipping.clustered_lineitem_layout(spark, sf_dir)
    return spark.read.parquet(path)


def _zorder_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import skipping

    path, _manifest = skipping.zorder_lineitem_layout(spark, sf_dir)
    return spark.read.parquet(path)


def _rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.index import rollup

    return spark.read.parquet(rollup.hourly_rollup_dir(spark, sf_dir))


def _base_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.index import search

    return search.base_postings_table(spark, sf_dir)


def _search_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.index import search

    return search.search_index_table(spark, sf_dir, "postings")


def _maint_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    _path, _v0, _v1, snap = maintenance._merged_layout(spark, sf_dir)
    return snap


def _maint_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    _path, _versions, snap = maintenance._stream_merged_layout(spark, sf_dir)
    return snap


def _schema_evo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    _path, _v0, _v1, snap = maintenance._evolved_layout(spark, sf_dir)
    return snap


def _maint_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import maintenance

    _path, _manifest, mor = maintenance._mor_layout(spark, sf_dir)
    return mor


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import graph

    return graph._EDGE_STORE.df(spark, sf_dir)


def _quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import sketches

    return spark.table(sketches.quantile_hist_view(spark, sf_dir))


def _adaptive_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import sketches

    return spark.table(sketches._AQ_STORE.view(spark, sf_dir))


def _positional_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.index import search

    return search._POS_STORE.df(spark, sf_dir)


def _bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.operators import text_analysis

    return spark.table(text_analysis._BIGRAM_LM_STORE.view(spark, sf_dir))


def _partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdataindexing_spark.sources import layout

    return spark.read.parquet(layout._partitioned_orders(spark, sf_dir))


# store name (the session_store_dir() prefix) -> uniform accessor
STORE_REGISTRY: dict[str, Accessor] = {
    "shingle_sig": _shingle_sig,
    "shingle_sig_view": _shingle_sig_view,
    "shingle_pair_counts": _shingle_pair_counts,
    "jaccard_pairs": _jaccard_pairs,
    "lsh_bands": _lsh_bands,
    "simhash_sig": _simhash_sig,
    "hll_sketch": _hll_sketch,
    "lsh_sig": _lsh_sig,
    "lsh_sig_view": _lsh_sig_view,
    "lsh_postings": _lsh_postings,
    "lsh_base_postings": _lsh_base_postings,
    "pq_codes": _pq_codes,
    "cms_counters": _cms_counters,
    "maint_serve": _maint_serve,
    "maint_time_travel": _maint_time_travel,
    "maint_vacuum": _maint_vacuum,
    "clustered_lineitem": _clustered_lineitem,
    "zorder_lineitem": _zorder_lineitem,
    "rollup_hourly": _rollup_hourly,
    "base_postings": _base_postings,
    "search_idx": _search_idx,
    "maint_merge": _maint_merge,
    "maint_stream_merge": _maint_stream_merge,
    "maint_mor": _maint_mor,
    "schema_evo": _schema_evo,
    "pr_edges": _pr_edges,
    "quantile_hist": _quantile_hist,
    "adaptive_quantile_hist": _adaptive_quantile_hist,
    "positional_postings": _positional_postings,
    "bigram_lm": _bigram_lm,
    "partitioned_orders": _partitioned_orders,
    "lsh_bucket_stats": _lsh_bucket_stats,
    "delta_tbl": _delta_tbl,
    "delta_stream_tbl": _delta_stream_tbl,
}

# session_store_dir() call sites that are deliberately NOT stores:
# checkpoint scratch space / per-invocation stream outputs, not
# build-once/serve-many relations (stream_scd2, like stream_cms, is a
# fresh per-invocation stream output — each replay is the point)
NON_STORE_DIRS = {
    "cc_checkpoint", "stream_cms", "stream_scd2", "stream_quantile",
    "stream_adaptive_quantile",  # ST16: per-invocation stream output
    "delta_tmp",  # X60: single-file staging dir, moved into the table
    "delta_stream_src",  # st18: arrival directory (replay input, not a store)
}
