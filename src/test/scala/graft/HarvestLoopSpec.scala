package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.HarvestLoop
import graft.store.Triggers

/** The orchestration loop (SURVEY §1.2 library surface): harvest new
  * landing files → fingerprint-gated materialization → notifications, with
  * exactly-once ingest, no-op reruns, and incremental late-data handling. */
class HarvestLoopSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("entity_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def writeCsv(dir: String, name: String, lines: Seq[String]): Unit = {
    val pw = new PrintWriter(new File(dir, name))
    try lines.foreach(pw.println) finally pw.close()
  }

  private def mkLoop(landing: String, work: String): HarvestLoop = {
    val reader: Seq[String] => DataFrame = paths =>
      spark.read.schema(schema).csv(paths: _*)
        .withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"))
    val transform: DataFrame => DataFrame = src =>
      src.groupBy("bucket", "entity_id")
        .agg(sum("value").as("kpi_load"), max("ts").as("ts"))
    new HarvestLoop(spark, landing, work, reader, transform,
      Seq(Triggers.Rule("load_high", "kpi_load", "major")(_ > 150.0)))
  }

  test("tick ingests + materializes + notifies; rerun no-op; late data incremental") {
    val landing = tmpDir("hl_landing")
    val work = tmpDir("hl_work")
    writeCsv(landing, "f1.csv", Seq(
      "1,2024-01-01 10:05:00,10.0",
      "2,2024-01-01 10:10:00,200.0",
      "2,2024-01-01 10:40:00,30.0"))
    writeCsv(landing, "f2.csv", Seq(
      "3,2024-01-01 11:05:00,50.0"))
    val loop = mkLoop(landing, work)

    val r1 = loop.tick()
    assert(r1.filesIngested.map(new File(_).getName) == Seq("f1.csv", "f2.csv"))
    assert(r1.bucketsRecomputed == Seq("2024-01-01 10", "2024-01-01 11"))
    assert(r1.notificationsRaised == 1L) // entity 2: 230 > 150

    val r2 = loop.tick()
    assert(r2.isNoOp, s"rerun must be a no-op, got $r2")

    // a late file lands rows in the 10h bucket ONLY
    writeCsv(landing, "f3.csv", Seq("1,2024-01-01 10:55:00,300.0"))
    val r3 = loop.tick()
    assert(r3.filesIngested.map(new File(_).getName) == Seq("f3.csv"))
    assert(r3.bucketsRecomputed == Seq("2024-01-01 10"))
    // entity 1 now exceeds (310) and entity 2 re-raises (230) on recompute
    assert(r3.notificationsRaised == 2L)

    // derived store equals a from-scratch transform over all raw rows
    val derived = spark.read.parquet(loop.derivedDir)
      .select("bucket", "entity_id", "kpi_load")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(derived == Set(
      ("2024-01-01 10", 1L, 310.0),
      ("2024-01-01 10", 2L, 230.0),
      ("2024-01-01 11", 3L, 50.0)))

    // notification store is append-only: 1 (tick1) + 2 (tick3)
    assert(spark.read.parquet(loop.notificationsDir).count() == 3)
  }

  test("raw rows landed without an ingest-log entry (crash window) still materialize") {
    import org.apache.spark.sql.SaveMode
    val landing = tmpDir("hl_landing3")
    val work = tmpDir("hl_work3")
    writeCsv(landing, "f1.csv", Seq("1,2024-01-01 10:05:00,10.0"))
    val loop = mkLoop(landing, work)
    loop.tick()

    // simulate the documented crash window: rows appended to the raw store
    // with no corresponding log entry (as if the tick died between writes)
    spark.createDataFrame(Seq((2L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 400.0)))
      .toDF("entity_id", "ts", "value")
      .withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH"))
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(s"$work/raw")

    // the bucket fingerprint sees the orphaned rows -> recompute, notify
    val r = loop.tick()
    assert(r.filesIngested.isEmpty)
    assert(r.bucketsRecomputed == Seq("2024-01-01 10"))
    assert(r.notificationsRaised == 1L) // entity 2: 400 > 150
    val derived = spark.read.parquet(loop.derivedDir)
      .select("entity_id", "kpi_load")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(derived == Set((1L, 10.0), (2L, 400.0)))
  }

  test("retention expires old buckets from raw/derived/state; notifications survive") {
    val landing = tmpDir("hl_landing4")
    val work = tmpDir("hl_work4")
    writeCsv(landing, "f1.csv", Seq(
      "1,2024-01-01 10:05:00,200.0",
      "2,2024-01-01 11:05:00,200.0",
      "3,2024-01-01 12:05:00,30.0"))
    val loop = mkLoop(landing, work)
    val r1 = loop.tick()
    assert(r1.bucketsRecomputed.size == 3 && r1.notificationsRaised == 2L)

    // expire everything before the 12h bucket
    val r2 = loop.tick(expireBefore = Some("2024-01-01 12"))
    assert(r2.bucketsExpired == Seq("2024-01-01 10", "2024-01-01 11"), r2.toString)
    assert(r2.filesIngested.isEmpty && r2.bucketsRecomputed.isEmpty,
      "expiry must not trigger recomputation of surviving buckets")
    // raw + derived keep only the retained bucket
    assert(spark.read.parquet(s"$work/raw").select("bucket").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("2024-01-01 12"))
    assert(spark.read.parquet(loop.derivedDir).select("bucket").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("2024-01-01 12"))
    // state purged with them: bounded by the retention window
    assert(spark.read.parquet(s"$work/state").count() == 1)
    // the append-only event log is NOT expired
    assert(spark.read.parquet(loop.notificationsDir).count() == 2)

    // the next plain tick is a clean no-op — expiry left no stale signal
    assert(loop.tick().isNoOp)
  }

  test("stability delay keeps hot buckets out of a tick, picked up later") {
    val landing = tmpDir("hl_landing2")
    val work = tmpDir("hl_work2")
    writeCsv(landing, "f1.csv", Seq(
      "1,2024-01-01 10:05:00,500.0",
      "2,2024-01-01 11:05:00,500.0"))
    val loop = mkLoop(landing, work)
    val r = loop.tick(stableBefore = Some("2024-01-01 11"))
    assert(r.bucketsRecomputed == Seq("2024-01-01 10"))
    assert(r.notificationsRaised == 1L)
    // once the delay passes, the hot bucket materializes with NO new files
    val r2 = loop.tick()
    assert(r2.filesIngested.isEmpty)
    assert(r2.bucketsRecomputed == Seq("2024-01-01 11"))
    assert(r2.notificationsRaised == 1L)
  }
}
