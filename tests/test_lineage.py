"""plans/lineage.py — the shared lineage-barrier helpers.

The helpers exist because Spark has no public "release this
localCheckpoint" API: superseded rounds of an iterative operator (or
archive-replay slices of the pgoutput distributed pairer) otherwise
accumulate executor storage until the ContextCleaner notices. These
tests pin the two behaviors VERDICT r9 #10 asked for evidence of:

- ``release_local_checkpoint`` actually SHRINKS executor storage
  (getRDDStorageInfo), not just "doesn't crash";
- ``pin`` routes to RELIABLE checkpointing when a checkpoint dir is
  configured (executor loss ⇒ recompute, not job failure) and to
  ``localCheckpoint`` otherwise.
"""

import tempfile

from pyspark.sql import functions as F

from deltaforge_spark.plans.lineage import pin, release_local_checkpoint


def _stored_rdd_ids(spark) -> set:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {i.id() for i in infos if i.numCachedPartitions() > 0}


def test_release_local_checkpoint_shrinks_executor_storage(spark):
    before = _stored_rdd_ids(spark)
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    pinned = pin(df)  # no checkpoint dir in the test session -> local
    pinned.count()
    held = _stored_rdd_ids(spark) - before
    assert held, "localCheckpoint should cache blocks"
    release_local_checkpoint(pinned)
    after = _stored_rdd_ids(spark) - before
    assert not (held & after), f"blocks not released: {held & after}"


def test_release_is_noop_on_plain_plans(spark):
    # a non-checkpoint plan must be a silent no-op, not an exception
    df = spark.range(10).withColumn("v", F.col("id") + 1)
    release_local_checkpoint(df)
    assert df.count() == 10


def test_iterative_loop_storage_is_bounded(spark):
    """The pattern graph.py/pgoutput use: each round's pin supersedes
    the previous round's; releasing the superseded frame keeps live
    checkpoint storage at O(1 round), not O(rounds)."""
    before = _stored_rdd_ids(spark)
    cur = pin(spark.range(1_000).withColumn("v", F.lit(0)))
    cur.count()
    for r in range(1, 4):
        nxt = pin(cur.withColumn("v", F.col("v") + 1))
        nxt.count()
        release_local_checkpoint(cur)
        cur = nxt
        live = _stored_rdd_ids(spark) - before
        assert len(live) <= 2, f"round {r}: {len(live)} checkpoints live"
    assert cur.agg(F.max("v")).first()[0] == 3
    release_local_checkpoint(cur)


def test_pin_uses_reliable_checkpoint_when_dir_configured(spark):
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    with tempfile.TemporaryDirectory(prefix="lineage-ckpt-") as d:
        sc.setCheckpointDir(d)
        try:
            pinned = pin(spark.range(100).withColumn("v", F.col("id") % 7))
            assert pinned.count() == 100
            # reliable checkpoints land files under the configured dir
            stat = sc._jvm.org.apache.spark.SparkContext  # noqa: F841
            import os

            found = any(files for _, _, files in os.walk(d))
            assert found, "reliable checkpoint wrote nothing to the dir"
            # releasing a reliable checkpoint is a silent no-op (its
            # blocks are disk files, not executor storage)
            release_local_checkpoint(pinned)
            assert pinned.count() == 100
        finally:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.apply(None)
            )
    assert sc.getCheckpointDir() is None
