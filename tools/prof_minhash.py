"""Profiling harness for minhash-signature formulations at sf0.1.

Historical record of the round-3 finding that picked the current
implementation: higher-order-function lambdas (array_min/transform and
aggregate folds) evaluate interpreted — outside whole-stage codegen —
so the explode+groupBy form wins ~5x despite its (tiny) shuffle; see
SCALE.md "Measured engine behaviors". Run: python tools/prof_minhash.py
(cwd or PYTHONPATH at repo root)."""
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from deltaforge_spark.operators.dedup import word_shingles, _hash_shingle, minhash_signatures

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .appName("prof_minhash")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
docs.count()

NUM = 8


def v_current(df):
    return minhash_signatures(df, text_col="text", id_col="doc_id", num_hashes=NUM)


def v_explode_groupby(df):
    ex = df.select(
        F.col("doc_id"),
        F.explode(word_shingles(F.col("text"), 3)).alias("sh"),
    )
    aggs = [F.min(_hash_shingle(F.col("sh"), j)).alias(f"mh{j}") for j in range(NUM)]
    return ex.groupBy("doc_id").agg(*aggs)


def v_aggregate_onepass(df):
    # single expression referencing the shingle array once: running
    # element-wise min of the 8-hash vector per shingle
    sh = word_shingles(F.col("text"), 3)
    init = F.array(*[F.lit(2**62) for _ in range(NUM)])

    def step(acc, s):
        hashes = F.array(*[_hash_shingle(s, j) for j in range(NUM)])
        return F.zip_with(acc, hashes, lambda a, h: F.least(a, h))

    sig = F.aggregate(sh, init, step)
    out = df.select(F.col("doc_id"), sig.alias("_sig")).filter(
        F.element_at("_sig", 1) < F.lit(2**62)
    )
    # generator barrier so _sig is NOT inlined 8x by CollapseProject
    return out.select(
        "doc_id",
        F.inline(
            F.array(
                F.struct(*[F.element_at("_sig", j + 1).alias(f"mh{j}") for j in range(NUM)])
            )
        ),
    )


def v_aggregate_inlined(df):
    # same single-pass aggregate but naive extraction (sig inlined 8x)
    sh = word_shingles(F.col("text"), 3)
    init = F.array(*[F.lit(2**62) for _ in range(NUM)])

    def step(acc, s):
        hashes = F.array(*[_hash_shingle(s, j) for j in range(NUM)])
        return F.zip_with(acc, hashes, lambda a, h: F.least(a, h))

    sig = F.aggregate(sh, init, step)
    out = df.select(F.col("doc_id"), sig.alias("_sig")).filter(
        F.element_at("_sig", 1) < F.lit(2**62)
    )
    return out.select(
        "doc_id", *[F.element_at("_sig", j + 1).alias(f"mh{j}") for j in range(NUM)]
    )


for name, fn in [
    ("current_arraymin_x8", v_current),
    ("explode_groupby", v_explode_groupby),
    ("aggregate_onepass_inline_barrier", v_aggregate_onepass),
    ("aggregate_onepass_naive_extract", v_aggregate_inlined),
]:
    # warm
    fn(docs).count()
    ts = []
    for _ in range(3):
        t0 = time.time()
        n = fn(docs).count()
        ts.append(time.time() - t0)
    print(f"{name}: n={n} times={[round(t,3) for t in ts]} best={min(ts):.3f}")

# cross-check values identical between variants
a = v_current(docs).orderBy("doc_id").collect()
b = v_aggregate_onepass(docs).orderBy("doc_id").collect()
c = v_explode_groupby(docs).orderBy("doc_id").collect()
print("match agg:", a == b, "match explode:", a == c)
spark.stop()
