"""Capture `.explain("formatted")` for named registry queries into
plans/<round>/<query>_<tag>.txt (the optimization round's before/after
plan evidence — the judge reads these instead of running Spark). The
round dir defaults to r11; override with SPARK_GRAFT_PLAN_ROUND.

Usage: python scripts/capture_plans.py <tag> name1,name2,...
       [env SPARK_GRAFT_SF_DIR overrides; default /root/testdata/sf0.1]

Each query is built and materialized once (noop sink) so AQE-final and
reused-exchange shapes settle, then the formatted plan is written.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry, tables  # noqa: E402
from bigdataindexing_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plan-capture-{tag}", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # mirror bench.py's small-sf runtime knobs so the captured plan is the
    # plan the bench actually times
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    specs = registry.all_specs()
    for name in names:
        spec = specs[name]
        df = spec.builder(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        tables.release_pinned()
        spark.catalog.clearCache()
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
