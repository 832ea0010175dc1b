"""Profile write_index variants at sf0.1 under the bench session config."""
import os, shutil, sys, tempfile, time, threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F
from bigdataindexing_spark.session import get_spark
from bigdataindexing_spark.tables import spread, table
from bigdataindexing_spark.functions.text import tokens

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-index", cpus="32")
spark.conf.set("spark.sql.shuffle.partitions", "4")
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")

docs = spread(table(spark, SF_DIR, "documents"))
docs.count()


def current(docs, out_dir):
    from bigdataindexing_spark.index.build import write_index
    write_index(docs, out_dir)


def fused(docs, out_dir):
    # one shuffle, one cached *postings-shaped* relation; term_rows is a
    # row-local explode of the cache
    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .repartition("token")
    )
    agg = (
        tok.groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.collect_list(F.struct("doc_id", "tf")).alias("items"),
        )
        .persist()
    )
    try:
        agg.select(
            "token", "df",
            F.sort_array(F.transform("items", lambda x: x["doc_id"])).alias("doc_ids"),
        ).sortWithinPartitions("token").write.mode("overwrite").parquet(
            f"{out_dir}/postings.parquet"
        )
        agg.select("token", F.explode("items").alias("it")).select(
            "token", F.col("it.doc_id").alias("doc_id"), F.col("it.tf").alias("tf")
        ).sortWithinPartitions("token").write.mode("overwrite").parquet(
            f"{out_dir}/term_rows.parquet"
        )
    finally:
        agg.unpersist()


def fused_threads(docs, out_dir):
    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .repartition("token")
    )
    agg = (
        tok.groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.collect_list(F.struct("doc_id", "tf")).alias("items"),
        )
        .persist()
    )
    try:
        # materialize the cache once, then run both writes concurrently
        agg.foreach(lambda r: None)  # noqa
        def w1():
            agg.select(
                "token", "df",
                F.sort_array(F.transform("items", lambda x: x["doc_id"])).alias("doc_ids"),
            ).sortWithinPartitions("token").write.mode("overwrite").parquet(
                f"{out_dir}/postings.parquet"
            )
        def w2():
            agg.select("token", F.explode("items").alias("it")).select(
                "token", F.col("it.doc_id").alias("doc_id"), F.col("it.tf").alias("tf")
            ).sortWithinPartitions("token").write.mode("overwrite").parquet(
                f"{out_dir}/term_rows.parquet"
            )
        t1 = threading.Thread(target=w1); t2 = threading.Thread(target=w2)
        t1.start(); t2.start(); t1.join(); t2.join()
    finally:
        agg.unpersist()


def nosort(docs, out_dir):
    # current shape minus the sortWithinPartitions (cost check only)
    tok = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .repartition("token")
    )
    rows = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf")).persist()
    try:
        rows.write.mode("overwrite").parquet(f"{out_dir}/term_rows.parquet")
        rows.groupBy("token").agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        ).write.mode("overwrite").parquet(f"{out_dir}/postings.parquet")
    finally:
        rows.unpersist()


VARIANTS = [("current", current), ("fused", fused), ("fused_threads", fused_threads), ("nosort", nosort)]

# warm all plans once
for name, fn in VARIANTS:
    d = tempfile.mkdtemp(prefix=f"warm_{name}_")
    try:
        fn(docs, d)
    finally:
        shutil.rmtree(d, ignore_errors=True)

for name, fn in VARIANTS:
    best = float("inf")
    for _ in range(5):
        d = tempfile.mkdtemp(prefix=f"prof_{name}_")
        try:
            t0 = time.perf_counter()
            fn(docs, d)
            best = min(best, time.perf_counter() - t0)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"{name:15s} {best:.4f}s")
spark.stop()
