"""Scratch profiler: time named registry queries (warm) with optional
stage-piece breakdowns, mirroring bench.py's measurement policy."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry, tables
from bigdataindexing_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-hot", cpus="32")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    specs = registry.all_specs()
    # warm at sf0.001
    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        try:
            specs[n].builder(spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:
            print(f"warm {n}: {e}")
        tables.release_pinned()
        spark.catalog.clearCache()
    for _pass in range(3):
        for n in names:
            t0 = time.perf_counter()
            df = specs[n].builder(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            tables.release_pinned()
            spark.catalog.clearCache()
            print(f"pass{_pass} {n}: {el:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
