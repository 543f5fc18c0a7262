package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.HarvestStream
import graft.store.Triggers

/** The push-variant orchestration loop: Structured Streaming file source
  * driving the same materialize/notify machinery as HarvestLoop, with
  * checkpoint-tracked exactly-once files and replay-idempotent raw writes
  * (the crash window the batch loop documents is CLOSED here). */
class HarvestStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("entity_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def writeCsv(dir: String, name: String, lines: Seq[String]): Unit = {
    val pw = new PrintWriter(new File(dir, name))
    try lines.foreach(pw.println) finally pw.close()
  }

  private def mkStream(landing: String, work: String): HarvestStream = {
    val prepare: DataFrame => DataFrame = df =>
      df.withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"))
    val transform: DataFrame => DataFrame = src =>
      src.groupBy("bucket", "entity_id")
        .agg(sum("value").as("kpi_load"), max("ts").as("ts"))
    new HarvestStream(spark, landing, work, schema, "csv", prepare, transform,
      Seq(Triggers.Rule("load_high", "kpi_load", "major")(_ > 150.0)))
  }

  test("streamed ticks ingest + materialize + notify; restart sees only new files") {
    val landing = tmpDir("hs_landing")
    val work = tmpDir("hs_work")
    writeCsv(landing, "f1.csv", Seq(
      "1,2024-01-01 10:05:00,10.0",
      "2,2024-01-01 10:10:00,200.0",
      "3,2024-01-01 11:05:00,50.0"))
    val hs = mkStream(landing, work)

    val r1 = hs.runOnce()
    assert(r1.nonEmpty)
    assert(r1.flatMap(_.bucketsRecomputed).distinct.sorted ==
      Seq("2024-01-01 10", "2024-01-01 11"))
    assert(r1.map(_.notificationsRaised).sum == 1L) // entity 2: 200 > 150

    // drained landing dir: a fresh run offers no batches (checkpoint is
    // the ingest log) and recomputes nothing
    val r2 = hs.runOnce()
    assert(r2.forall(_.isNoOp), s"restart must be a no-op, got $r2")

    // a late file lands rows in the 10h bucket ONLY
    writeCsv(landing, "f3.csv", Seq("1,2024-01-01 10:55:00,300.0"))
    val r3 = hs.runOnce()
    assert(r3.flatMap(_.bucketsRecomputed) == Seq("2024-01-01 10"))
    // entity 1 now exceeds (310) and entity 2 re-raises on recompute
    assert(r3.map(_.notificationsRaised).sum == 2L)

    val derived = spark.read.parquet(hs.derivedDir)
      .select("bucket", "entity_id", "kpi_load")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(derived == Set(
      ("2024-01-01 10", 1L, 310.0),
      ("2024-01-01 10", 2L, 200.0),
      ("2024-01-01 11", 3L, 50.0)))
    assert(spark.read.parquet(hs.notificationsDir).count() == 3)
  }

  test("a replayed micro-batch overwrites itself: no duplicate rows, no fingerprint churn") {
    import spark.implicits._
    val landing = tmpDir("hs_landing2")
    val work = tmpDir("hs_work2")
    val hs = mkStream(landing, work)
    val batch = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 200.0))
      .toDF("entity_id", "ts", "value")
      .withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"))

    val first = hs.ingestTick(batch, id = 7L)
    assert(first.bucketsRecomputed == Seq("2024-01-01 10"))
    assert(first.notificationsRaised == 1L)
    val rawAfterFirst = spark.read.parquet(s"$work/raw").count()

    // crash-replay of the SAME epoch: identical raw contents, the
    // fingerprint gate sees nothing stale, nothing re-raises
    val replay = hs.ingestTick(batch, id = 7L)
    assert(spark.read.parquet(s"$work/raw").count() == rawAfterFirst,
      "replayed batch must overwrite its own partitions, not append")
    assert(replay.bucketsRecomputed.isEmpty, s"replay recomputed $replay")
    assert(replay.notificationsRaised == 0L)
    assert(spark.read.parquet(hs.notificationsDir).count() == 1)

    // a genuinely NEW epoch with different rows does land incrementally
    val next = hs.ingestTick(batch.withColumn("value", col("value") + 1.0), id = 8L)
    assert(next.bucketsRecomputed == Seq("2024-01-01 10"))
  }
}
