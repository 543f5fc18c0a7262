package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Side-effecting source/sink rows (SURVEY.md §2 A2/A4): oracle-omitted,
  * verified by scalatest; Verify still dumps their output for the driver's
  * rows-only check. Scratch space lives under the repo's target dir.
  */
object SideEffects {
  type Q = (SparkSession, String) => DataFrame

  private def scratch(name: String): String = {
    val p = java.nio.file.Paths.get("/root/repo/target/scratch", name)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  val queries: Map[String, Q] = Map(
    // A2 — typed CSV ingest round-trip (Minerva "generic CSV" harvest
    // plugin shape): write a tiny CSV derived from region, re-read it with
    // an explicit schema + timestamp parse. No schema inference — declared
    // schemas only, as at 100 TB inference means an extra full pass.
    "scan_csv_typed" -> ((s, d) => {
      val out = scratch("csv_region")
      Tables.region(s, d)
        .select(col("r_regionkey"), col("r_name"),
          lit("2024-01-15 06:30:00").as("loaded_at"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType),
        StructField("loaded_at", TimestampType)))
      s.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(out)
        .orderBy("r_regionkey")
    }),

    // A4 — partitioned trend-store sink: write events partitioned by day
    // (the reference's time-partitioned wide-table layout), read back and
    // count per partition. Partition pruning on `d` is then free.
    "sink_partitioned" -> ((s, d) => {
      val out = scratch("events_by_day")
      Tables.events(s, d)
        .withColumn("d", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("d").parquet(out)
      s.read.parquet(out)
        .groupBy("d")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("d")
    }),
  )

  // Both rows are intentionally oracle-omitted (side-channel files).
  val oracles: Map[String, String] = Map.empty
}
