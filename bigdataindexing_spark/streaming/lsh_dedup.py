"""Incremental near-duplicate detection: streaming MinHash-LSH.

The batch operator (operators/dedup.py `dedup_minhash_lsh`) answers "find
all near-dup pairs in a corpus"; at 100 TB the question a pipeline
actually asks daily is "which of TODAY'S documents near-duplicate anything
seen so far" — re-running the batch join over the whole history per crawl
is quadratic in time. This module keeps the LSH band buckets as STREAMING
STATE: each (band, bucket) key holds the signatures of every document
that ever hashed into it, new arrivals compare against exactly that
bucket's members (the LSH candidate guarantee — near-dups collide in ≥1
band with high probability), and state grows O(docs·bands) — the same
memory the batch index takes, amortized across arrivals.

Parity: the banding expression, signature function, and the
signature-agreement prefilter are the batch implementation's own
(imported, not re-derived), so the streamed candidate set equals the
batch candidate set on the same input; candidates are exact-verified with
the shared `_jaccard_pairs` and the oracle is the batch `_JACCARD_SQL`.

The reference has no analogue (its queue → Elasticsearch path is
at-most-once CRUD indexing, IndexingListener.java:115–131); this is the
streaming extension of SURVEY §2.9 X2.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataindexing_spark.operators.dedup import (
    _JACCARD_SQL,
    _SHINGLE_SIG_SCHEMA,
    _shingle_docs,
    _jaccard_pairs,
    _shingle_sig_batches,
    BAND_ROWS,
    EST_JACCARD_CUTOFF,
    NUM_MINHASHES,
)
from bigdataindexing_spark.registry import register
from bigdataindexing_spark.streaming.core import run_available_now, stream_table

_PAIR_SCHEMA = "doc_a BIGINT, doc_b BIGINT"
_STATE_SCHEMA = "doc_ids ARRAY<BIGINT>, sigs ARRAY<ARRAY<BIGINT>>"


def _bucket_pairs(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """Per-(band, bucket) state: every member's signature. Each arriving
    doc emits (smaller_id, larger_id) for members whose signature
    agreement clears the batch prefilter cutoff, then joins the bucket."""
    import numpy as np

    if state.exists:
        doc_ids, sigs = state.get
        doc_ids = [int(d) for d in doc_ids]
        sig_mat = np.asarray([list(s) for s in sigs], dtype=np.int64)
    else:
        doc_ids = []
        sig_mat = np.empty((0, 0), dtype=np.int64)
    rows: list[tuple[int, list[int]]] = []
    for pdf in pdfs:
        rows.extend(
            (int(d), [int(x) for x in s])
            for d, s in zip(pdf["doc_id"], pdf["sig"])
        )
    rows.sort(key=lambda r: r[0])  # deterministic arrival order per batch
    if rows:
        # ONE ndarray for the whole batch, appended to the bucket's
        # existing matrix up front — each arrival's agreement check is
        # then a single vectorized compare against a slice, instead of
        # re-converting the (growing) member list per row: conversion
        # cost per batch drops from O(members² · sig_len) to
        # O(members · sig_len)
        batch_mat = np.asarray([sig for _, sig in rows], dtype=np.int64)
        full_mat = (
            np.vstack([sig_mat, batch_mat])
            if sig_mat.size
            else batch_mat
        )
        n_existing = len(doc_ids)
    else:
        full_mat = sig_mat
        n_existing = len(doc_ids)
    pairs: list[tuple[int, int]] = []
    for k, (did, _sig) in enumerate(rows):
        n_members = n_existing + k
        if n_members:
            est = (full_mat[:n_members] == full_mat[n_members]).mean(axis=1)
            for j in np.nonzero(est >= EST_JACCARD_CUTOFF)[0]:
                a, b = sorted((doc_ids[int(j)], did))
                pairs.append((a, b))
        doc_ids.append(did)
    state.update((doc_ids, [list(map(int, r)) for r in full_mat]))
    yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


def stream_lsh_candidates(docs_stream: DataFrame) -> DataFrame:
    """documents stream (doc_id, text) → candidate-pair stream."""
    sig = docs_stream.select("doc_id", "text").mapInPandas(
        _shingle_sig_batches, _SHINGLE_SIG_SCHEMA
    )
    n_bands = NUM_MINHASHES // BAND_ROWS
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.hash(
            *[F.get("sig", b * BAND_ROWS + r) for r in range(BAND_ROWS)]
        ),
    )
    bands = sig.select(
        "doc_id", "sig", F.posexplode(band_hashes).alias("band", "bucket")
    )
    return bands.groupBy("band", "bucket").applyInPandasWithState(
        _bucket_pairs,
        outputStructType=_PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


@register(
    "st9_stream_lsh_dedup",
    oracle=_JACCARD_SQL,
    tags=("streaming", "dedup"),
    bench=False,
    doc="ST-extension of X2: incremental MinHash-LSH near-dup detection "
    "with band buckets as applyInPandasWithState streaming state — new "
    "documents compare only against their buckets' members, so a daily "
    "crawl dedups against all history without re-joining it. Drained "
    "candidates (availableNow replay) are exact-Jaccard verified with "
    "the batch verifier; the oracle is the full batch near-dup result, "
    "which the stream must reproduce exactly (candidate parity by "
    "construction — shared banding/signature/prefilter code).",
)
def st9_stream_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = stream_table(spark, sf_dir, "documents")
    pairs = run_available_now(
        stream_lsh_candidates(docs), output_mode="append"
    ).distinct()
    return _jaccard_pairs(_shingle_docs(spark, sf_dir), pairs=pairs)
