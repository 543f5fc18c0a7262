package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off integrity check on `llm_dedup_near` at the 100× corpus: total
  * rows vs distinct (a,b) pairs vs the per-lang DuckDB truth (zh measured
  * 18 671 780 same-copy + 315 cross-copy pairs). A rows≠pairs gap means
  * the plan double-emits at scale; a zh gap vs DuckDB means a wrong
  * answer. One aggregation pass, no checkpoint (453 M-row result).
  * Run: `sbt "runMain graft.tools.CheckNear100 [dir]"`. */
object CheckNear100 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sfx100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.SparkEntry.queries("llm_dedup_near")(spark, d)
    val zhIds = graft.Tables.documents(spark, d).where(col("lang") === "zh")
      .select(col("doc_id").as("a_id"))
    val agg = out
      .join(broadcast(zhIds.withColumn("is_zh", lit(1))), Seq("a_id"), "left")
      .agg(count(lit(1)).as("total"),
        count_distinct(col("a_id"), col("b_id")).as("pairs"),
        sum(coalesce(col("is_zh"), lit(0))).as("zh_rows"))
      .head()
    println(s"[check100] total=${agg.getLong(0)} distinctPairs=${agg.getLong(1)} zhRows=${agg.getLong(2)}")
    spark.stop()
  }
}
