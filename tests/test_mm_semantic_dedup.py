"""Cross-modal two-stage dedup contracts (mm_semantic_dedup).

The duckdb oracle hash-gates the full output; these tests re-derive the
two stages independently and pin the verdict algebra: content drops
point at a byte-identical lower-id payload, semantic drops point at a
same-cell content-survivor above the cosine threshold, and the two
reason classes partition the dropped set.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from bigdataindexing_spark.operators.multimodal import (
    as_media,
    mm_semantic_dedup,
)
from bigdataindexing_spark.operators.similarity import (
    SEM_TAU,
    assign_cells,
    train_centroids,
)
from bigdataindexing_spark.tables import spread, table


@pytest.fixture(scope="module")
def verdicts(spark, sf_dir):
    return {r["doc_id"]: r for r in mm_semantic_dedup(spark, sf_dir).collect()}


def test_every_doc_has_one_verdict(spark, sf_dir, verdicts):
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(verdicts) == n_docs
    for r in verdicts.values():
        if r["kept"]:
            assert r["reason"] is None and r["rep"] is None
        else:
            assert r["reason"] in ("content", "semantic")
            assert r["rep"] is not None and r["rep"] < r["doc_id"]


def test_content_drops_are_byte_identical(spark, sf_dir, verdicts):
    sha = {
        r["doc_id"]: r["sha"]
        for r in as_media(spread(table(spark, sf_dir, "documents")))
        .select("doc_id", F.sha2("payload", 256).alias("sha"))
        .collect()
    }
    for d, r in verdicts.items():
        if r["reason"] == "content":
            assert sha[r["rep"]] == sha[d]
            assert verdicts[r["rep"]]["reason"] != "content"
        elif r["reason"] == "semantic":
            # semantic drops are content SURVIVORS: nobody with their
            # bytes has a smaller id
            assert min(k for k, s in sha.items() if s == sha[d]) == d


def test_semantic_drops_meet_threshold_in_cell(spark, sf_dir, verdicts):
    emb = spread(table(spark, sf_dir, "embeddings"))
    cells = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb, train_centroids(emb)).collect()
    }
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in emb.select("vec_id", "embedding").collect()
    }
    semantic = [(d, r["rep"]) for d, r in verdicts.items() if r["reason"] == "semantic"]
    for d, rep in semantic:
        assert cells[d] == cells[rep], (d, rep)
        c = float(
            vecs[d] @ vecs[rep]
            / (np.linalg.norm(vecs[d]) * np.linalg.norm(vecs[rep]))
        )
        assert c >= SEM_TAU - 1e-6, (d, rep, c)
        # the representative is a content survivor (it may itself be
        # semantically dropped by a yet-smaller id — the SemDeDup
        # min-id convention, same as dedup_semantic)
        assert verdicts[rep]["reason"] != "content", (d, rep)
