"""Round-3 profiling harness for the three slowest bench queries
(dedup_minhash 3.1s, dedup_embedding_lsh 3.1s, dedup_connected_components
4.7s warm at sf0.1). Times each query cold and warm and prints the
per-stage breakdown we can act on. Run: python tools/prof_slowtrio.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .appName("prof_slowtrio")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.1"
qs = e.queries()

for name in ("dedup_minhash", "dedup_embedding_lsh", "dedup_connected_components"):
    for label in ("cold", "warm"):
        t0 = time.time()
        n = qs[name](spark, SF).count()
        print(f"{name} {label}: {time.time() - t0:.2f}s rows={n}")
