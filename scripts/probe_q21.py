"""Measure TPC-H-Q21-shape variants at sf0.1 under bench conditions
(VERDICT r5 #3: get q80 under 3x duckdb, wiring the runtime bloom-filter
pruning contract into its execution path where it helps).

Variants:
  A  canonical EXISTS/NOT-EXISTS text (current q80)
  B  candidate-order semi-restricted COUNT-DISTINCT fold: the per-order
     supplier stats aggregate runs over lineitem SEMI-JOINED to the
     (selective) candidate-order set first — the r5-measured fold was
     slower because it aggregated the FULL fact table
  C  same restriction, expand-free two-level groupBy
  D  variant A executed in a session with runtime bloom-filter join
     pruning forced on (creationSideThreshold up, application threshold 0)

Interleaved best-of-N (A B C D per pass) per the round-3 methodology:
first-sweep warmup effects make one-after-another comparisons lie.

Usage: python scripts/probe_q21.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark.session import get_spark  # noqa: E402
from bigdataindexing_spark.tables import register_views  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

A = (
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "AND n_name = 'NATION_5' "
    "AND EXISTS (SELECT 1 FROM lineitem l2 "
    "WHERE l2.l_orderkey = l1.l_orderkey "
    "AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
    "WHERE l3.l_orderkey = l1.l_orderkey "
    "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name"
)

_L1 = (
    "l1 AS (SELECT s_name, l_orderkey, l_suppkey "
    "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
    "JOIN orders ON o_orderkey = l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND l_returnflag = 'R' "
    "AND n_name = 'NATION_5'), "
    "cand AS (SELECT DISTINCT l_orderkey FROM l1) "
)

B = (
    "WITH " + _L1 + ", probe AS ("
    "SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS nsupp, "
    "COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nret "
    "FROM lineitem JOIN cand USING (l_orderkey) GROUP BY l_orderkey) "
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM l1 JOIN probe USING (l_orderkey) "
    "WHERE nsupp > 1 AND nret = 1 "
    "GROUP BY s_name ORDER BY numwait DESC, s_name"
)

C = (
    "WITH " + _L1 + ", per_supp AS ("
    "SELECT l_orderkey, l_suppkey, "
    "MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r "
    "FROM lineitem JOIN cand USING (l_orderkey) "
    "GROUP BY l_orderkey, l_suppkey), "
    "probe AS (SELECT l_orderkey, COUNT(*) AS nsupp, SUM(has_r) AS nret "
    "FROM per_supp GROUP BY l_orderkey) "
    "SELECT s_name, COUNT(*) AS numwait "
    "FROM l1 JOIN probe USING (l_orderkey) "
    "WHERE nsupp > 1 AND nret = 1 "
    "GROUP BY s_name ORDER BY numwait DESC, s_name"
)

# B/C gotcha guarded by the result check below: "WITH l1 ... , cand ..."
# must produce the same rows as A (numwait counts qualifying l1 LINES).


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(app_name="q21-probe", cpus="32")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, SF_DIR)

    bloom = spark.newSession()
    bloom.conf.set("spark.sql.shuffle.partitions", "4")
    # AQE on: matches the bloom plan-contract test conditions
    bloom.conf.set("spark.sql.adaptive.enabled", "true")
    bloom.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    bloom.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    bloom.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
    )
    bloom.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", "0"
    )
    bloom.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    register_views(bloom, SF_DIR)

    variants = [("A", spark, A), ("B", spark, B), ("C", spark, C), ("D", bloom, A)]
    # correctness first
    base = [tuple(r) for r in spark.sql(A).collect()]
    for name, ss, q in variants[1:]:
        got = [tuple(r) for r in ss.sql(q).collect()]
        assert got == base, f"variant {name} diverges: {got[:3]} vs {base[:3]}"
    print(f"all variants agree ({len(base)} rows)")

    best: dict[str, float] = {}
    for p in range(passes):
        for name, ss, q in variants:
            t0 = time.perf_counter()
            ss.sql(q).write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            best[name] = min(best.get(name, 9e9), el)
        print(f"pass {p}: " + "  ".join(f"{n}={best[n]:.3f}" for n in best))
    print("BEST:", {k: round(v, 3) for k, v in best.items()})


if __name__ == "__main__":
    main()
