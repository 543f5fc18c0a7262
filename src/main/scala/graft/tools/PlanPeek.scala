package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Print the executed plan of named query keys — the drill-down companion
  * to [[PlanScan]]'s one-line-per-key audit. Usage:
  * `sbt "runMain graft.tools.PlanPeek <key> [key ...]"`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { k =>
      println(s"===== $k =====")
      println(SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
