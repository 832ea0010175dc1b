"""Profile builder-vs-execution time split for selected benched queries.

Usage: python scripts/profile_floor.py [query ...]
Replicates bench.py's session config (AQE off, 4 shuffle partitions at
sf<=0.1) and reports, per query, driver-side plan construction time and
execution (noop write) time over 3 passes (min each).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry, tables
from bigdataindexing_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdi-profile", cpus="32")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # warm like bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name, df in tables.load_all(spark, sf_dir).items():
        df.count()

    names = sys.argv[1:]
    specs = registry.all_specs()
    if not names:
        names = sorted(specs)

    # floor probe: trivial scan+agg
    for _ in range(3):
        t0 = time.perf_counter()
        df = tables.table(spark, sf_dir, "nation").groupBy("n_regionkey").count()
        df.write.mode("overwrite").format("noop").save()
        print(f"floor_trivial_agg: {time.perf_counter()-t0:.3f}s")

    for name in names:
        spec = specs[name]
        spec.builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
        tables.release_pinned()
        spark.catalog.clearCache()
        build_t, exec_t = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            tables.release_pinned()
            spark.catalog.clearCache()
            build_t = min(build_t, t1 - t0)
            exec_t = min(exec_t, t2 - t1)
        print(f"{name:36s} build={build_t:6.3f}s exec={exec_t:6.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
