"""Cross-operator consistency contracts for the approximate operators.

- MinHash-LSH near-dup output must equal the exact n-gram-Jaccard output
  on the test corpus (this is what justifies giving the LSH operator the
  exact-Jaccard SQL oracle).
- Multi-table ANN-LSH must return exactly one neighbor per query (totality
  via brute-force fallback) and its neighbors' similarity must be within a
  sane factor of the true top-1 (deterministic — md5-derived planes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataindexing_spark.functions.vectors import as_double, cosine
from bigdataindexing_spark.operators import dedup, similarity
from bigdataindexing_spark.tables import table


def test_minhash_equals_exact_jaccard(spark, sf_dir):
    exact = dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    lsh = dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, lsh))
    assert len(exact) > 0, "corpus should contain planted near-dups"


def test_ann_lsh_total_and_sane(spark, sf_dir):
    res = {r["qid"]: r["neighbor_id"] for r in similarity.sim_ann_lsh(spark, sf_dir).collect()}
    assert sorted(res) == list(range(similarity.N_QUERIES))
    truth = {
        r["qid"]: r["neighbor_id"]
        for r in similarity.q25_ann_bruteforce(spark, sf_dir).collect()
    }
    # deterministic planes -> deterministic recall; require the approximate
    # neighbor to be a real vector and self-exclusion to hold
    for qid, nid in res.items():
        assert nid != qid
    # report-style sanity: approximate similarity >= 60% of true best on avg
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    pairs = [(int(q), int(n)) for q, n in res.items()] + [
        (int(q), int(n)) for q, n in truth.items()
    ]
    pdf = spark.createDataFrame(pairs, ["qid", "nid"])
    a = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    b = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    sims = {
        (r["qid"], r["nid"]): r["c"]
        for r in pdf.join(a, "qid").join(b, "nid")
        .select("qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("c"))
        .collect()
    }
    approx_avg = sum(sims[(q, n)] for q, n in res.items()) / len(res)
    true_avg = sum(sims[(q, n)] for q, n in truth.items()) / len(truth)
    assert approx_avg >= 0.5 * true_avg


def test_ivf_total_and_recall(spark, sf_dir):
    """IVF ANN: every query answered; recall@1 vs brute force >= 0.8
    (nprobe=3 of 16 cells; the trained quantizer and probe order are
    deterministic, so this is a fixed number per scale factor)."""
    from bigdataindexing_spark.registry import queries

    qs = queries()
    ivf = {r["qid"]: r["neighbor_id"] for r in qs["sim_ann_ivf"](spark, sf_dir).collect()}
    bf = {r["qid"]: r["neighbor_id"] for r in qs["q25_ann_bruteforce"](spark, sf_dir).collect()}
    assert sorted(ivf) == sorted(bf)  # total: one answer per query
    agree = sum(ivf[q] == bf[q] for q in bf)
    assert agree >= 0.8 * len(bf)


def test_pq_total_and_recall(spark, sf_dir):
    """PQ ANN: every query answered, self-excluded; with the exact rerank
    of the top-20 ADC shortlist, recall@1 vs brute force >= 0.8 (the
    codebooks, codes, and LUTs are all deterministic, so this is a fixed
    number per scale factor)."""
    from bigdataindexing_spark.registry import queries

    qs = queries()
    pq = {
        r["qid"]: r["neighbor_id"]
        for r in qs["sim_ann_pq"](spark, sf_dir).collect()
    }
    bf = {
        r["qid"]: r["neighbor_id"]
        for r in qs["q25_ann_bruteforce"](spark, sf_dir).collect()
    }
    assert sorted(pq) == sorted(bf)  # total: one answer per query
    assert all(pq[q] != q for q in pq)  # self-excluded
    agree = sum(pq[q] == bf[q] for q in bf)
    assert agree >= 0.8 * len(bf)


def test_ivfpq_total_recall_and_pruning(spark, sf_dir):
    """IVF-PQ composite ANN: every query answered, self-excluded;
    recall@1 vs brute force >= 0.8 (deterministic quantizer, codebooks,
    probe order — a fixed number per scale factor: 0.9 at sf0.001/0.01).
    The composite must also genuinely PRUNE: candidates scored per query
    are bounded by the probed cells, never the whole corpus — asserted
    structurally by the cell equi-join in the plan (no CartesianProduct
    against the code table)."""
    from bigdataindexing_spark.registry import queries

    qs = queries()
    df = qs["sim_ann_ivfpq"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    ivfpq = {r["qid"]: r["neighbor_id"] for r in df.collect()}
    bf = {
        r["qid"]: r["neighbor_id"]
        for r in qs["q25_ann_bruteforce"](spark, sf_dir).collect()
    }
    assert sorted(ivfpq) == sorted(bf)  # total: one answer per query
    assert all(ivfpq[q] != q for q in ivfpq)  # self-excluded
    agree = sum(ivfpq[q] == bf[q] for q in bf)
    assert agree >= 0.8 * len(bf)


def test_pinned_relations_release(spark, sf_dir):
    # Builders pin() their multi-branch relations; a long-lived session
    # must be able to drop them all by reference — no storage leak
    # (ADVICE r1: persist() without matching unpersist).
    from bigdataindexing_spark import tables
    from bigdataindexing_spark.registry import queries

    tables.release_pinned()  # start clean
    # dedup_span_fraction pin()s its live span relation
    # (the Jaccard/containment family now reads the pair-count store)
    df = queries()["dedup_span_fraction"](spark, sf_dir)
    df.collect()
    assert len(tables._PINNED) >= 1
    released = tables.release_pinned()
    assert released >= 1
    assert not tables._PINNED
    # idempotent on an empty pin list
    assert tables.release_pinned() == 0


def test_hot_shingle_df_cap_noop_on_corpus(spark, sf_dir, tmp_path, monkeypatch):
    """The df cap in the shared pair-count store is a scale-safety valve:
    it must be a no-op on this corpus (max observed shingle df at sf0.1 is
    25, far under the default 1000), and the capped plan must actually
    contain the df-filter anti-join stage."""
    from bigdataindexing_spark.sources import store_dirs

    # build a capped store under a throwaway key so the session store for
    # the real queries is untouched
    def fresh_store(monkey_cap: int):
        dedup._PAIRCOUNT_STORE_DIR.pop(
            (spark.sparkContext.applicationId, sf_dir), None
        )
        dedup._PAIRCOUNT_VIEWS.pop(
            (spark.sparkContext.applicationId, sf_dir), None
        )
        monkeypatch.setattr(dedup, "HOT_SHINGLE_DF_CAP", monkey_cap)
        view = dedup.shingle_pair_counts_view(spark, sf_dir)
        rows = sorted(
            map(tuple, spark.table(view).collect())
        )
        return rows

    capped = fresh_store(dedup.HOT_SHINGLE_DF_CAP)
    uncapped = fresh_store(1 << 40)  # effectively infinite
    assert capped == uncapped
    assert len(capped) > 0

    # the df-filter stage exists: the store build plan anti-joins against
    # the hot-shingle relation (HAVING COUNT > cap)
    dedup._PAIRCOUNT_STORE_DIR.pop((spark.sparkContext.applicationId, sf_dir), None)
    dedup._PAIRCOUNT_VIEWS.pop((spark.sparkContext.applicationId, sf_dir), None)
    monkeypatch.setattr(dedup, "HOT_SHINGLE_DF_CAP", 1000)
    store = dedup.shingle_sig_view(spark, sf_dir)
    plan = spark.sql(f"""
        WITH u AS (
          SELECT doc_id, size(shingles) AS n, explode(shingles) AS s
          FROM {store}
        ),
        hot AS (
          SELECT s FROM u GROUP BY s HAVING COUNT(1) > {dedup.HOT_SHINGLE_DF_CAP}
        ),
        uc AS (
          SELECT u.* FROM u LEFT ANTI JOIN hot ON u.s = hot.s
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(1) AS i
        FROM uc a JOIN uc b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_pair_count_store_shared(spark, sf_dir):
    """dedup_ngram_jaccard, q104_containment_pairs, and the verified pair
    store all read ONE materialized pair-count relation — the expensive
    shingle self-join runs once per session."""
    from bigdataindexing_spark.registry import queries

    qs = queries()
    qs["dedup_ngram_jaccard"](spark, sf_dir).collect()
    key = (spark.sparkContext.applicationId, sf_dir)
    path = dedup._PAIRCOUNT_STORE_DIR[key]
    # containment reuses the same store path (no second build)
    qs["q104_containment_pairs"](spark, sf_dir).collect()
    assert dedup._PAIRCOUNT_STORE_DIR[key] == path
    # the serve-side plans are scans of the store, not self-joins
    plan = qs["dedup_ngram_jaccard"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_hot_shingle_cap_binding_matches_capped_oracle(spark, tmp_path, monkeypatch):
    """When the df cap BINDS (a shingle hotter than the cap exists), the
    Spark pair-count store and the REGISTERED capped duckdb oracles must
    still compute the SAME function, for the whole df-capped family —
    Jaccard, containment, AND cluster-cc (ADVICE r5: capped Spark vs
    uncapped oracle diverged above the cap). The oracles are taken
    verbatim from the registry: since they are lazy callables (ADVICE
    r6), the env override set HERE — long after import — must flow into
    both the store build and the oracle text; any cap-semantics drift on
    either side fails this test."""
    import duckdb as _duckdb

    from bigdataindexing_spark.registry import all_specs
    from tests.oracle import canon_rows, duckdb_result, spark_result

    # six docs, all sharing the hot trigram "common common common":
    # docs 1/2 are near-dups through non-hot shingles (df=2 each); docs
    # 3/4 share ONLY the hot shingle, with exactly jac=0.2 uncapped —
    # the pair the cap must drop.
    texts = [
        (1, "common common common w1 w2 w3 w4 w5"),
        (2, "common common common w1 w2 w3 w4 w6"),
        (3, "common common common aaa bbb"),
        (4, "common common common ccc ddd"),
        (5, "common common common e1 e2 e3"),
        (6, "common common common f1 f2 f3"),
    ]
    sf = str(tmp_path / "capcorpus")
    spark.createDataFrame(texts, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    cap = 4  # hot trigram df=6 > 4 -> the cap binds
    monkeypatch.setenv("BDI_HOT_SHINGLE_DF_CAP", str(cap))
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )

    specs = all_specs()
    results = {}
    for name in (
        "dedup_ngram_jaccard", "q104_containment_pairs", "dedup_cluster_cc"
    ):
        got_cols, got_rows = spark_result(specs[name].builder(spark, sf))
        exp_cols, exp_rows = duckdb_result(con, specs[name].oracle_text())
        assert canon_rows(got_cols, got_rows) == canon_rows(
            exp_cols, exp_rows
        ), name
        results[name] = got_rows

    # the capped result is non-trivial and the cap actually bound:
    # (1,2) survives via non-hot shingles, (3,4) is dropped with the cap
    pairs = {(r[0], r[1]) for r in results["dedup_ngram_jaccard"]}
    assert (1, 2) in pairs and (3, 4) not in pairs
    _, unc_rows = duckdb_result(con, dedup._JACCARD_SQL)
    assert (3, 4) in {(r[0], r[1]) for r in unc_rows}
    # containment saw the same candidate prefilter
    cpairs = {(r[0], r[1]) for r in results["q104_containment_pairs"]}
    assert (3, 4) not in cpairs
    # and the cluster graph only links the surviving pair
    clusters = {r[0]: r[1] for r in results["dedup_cluster_cc"]}
    assert clusters.get(2) == 1 and 3 not in clusters and 4 not in clusters
