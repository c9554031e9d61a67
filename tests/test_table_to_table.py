"""Bronze→silver incremental materialization: a derived table kept in
sync with a source table by composing the ``bamboo_published``
streaming source (version-offset deltas) with the exactly-once
``publish_stream`` sink — the medallion-architecture loop, end to end
through real Structured Streaming machinery."""

import pyspark.sql.functions as F

from bamboo_spark.operators.publish import (
    append_publish,
    atomic_publish,
    read_published,
    table_meta,
)
from bamboo_spark.sources.published import register
from bamboo_spark.streaming.core import publish_stream


def test_bronze_to_silver_incremental_materialization(spark, tmp_path):
    register(spark)
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"),
            (F.col("id") % 10).alias("quality"),
        )

    atomic_publish(batch(0, 100), bronze)

    # silver = bronze rows passing the quality gate, with a derived col
    sdf = (
        spark.readStream.format("bamboo_published")
        .option("startingVersion", "0")
        .load(bronze)
        .where("quality >= 5")
        .withColumn("grade", F.col("quality") * 10)
    )
    q = (
        publish_stream(sdf, silver, mode="append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert read_published(spark, silver).count() == 50
        # two more bronze commits: silver follows incrementally
        append_publish(batch(100, 160), bronze)
        append_publish(batch(160, 200), bronze)
        q.processAllAvailable()
        got = read_published(spark, silver)
        want = read_published(spark, bronze).where("quality >= 5")
        assert got.count() == want.count() == 100
        assert got.where("grade != quality * 10").count() == 0
        # exactly-once bookkeeping on BOTH sides: silver's HWM recorded,
        # no duplicate ids
        assert got.select("id").distinct().count() == 100
        assert "last_bid" in table_meta(silver)
    finally:
        q.stop()

    # restart from the same checkpoint: nothing re-delivers
    q2 = (
        publish_stream(
            spark.readStream.format("bamboo_published")
            .option("startingVersion", "0")
            .load(bronze)
            .where("quality >= 5")
            .withColumn("grade", F.col("quality") * 10),
            silver,
            mode="append",
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q2.processAllAvailable()
        assert read_published(spark, silver).count() == 100
        # and new bronze data still flows after the restart
        append_publish(batch(200, 220), bronze)
        q2.processAllAvailable()
        assert read_published(spark, silver).count() == 110
    finally:
        q2.stop()
