package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for win_interpolate's full-materialization cost (r7):
  * count() prunes the window columns, foreach executes them — this breaks
  * the key's cost into pieces to find where the foreach-path time goes.
  * `sbt "runMain graft.tools.ProbeInterp [sfDir]"`. */
object ProbeInterp {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[interp] $name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val full = graft.SparkEntry.queries("win_interpolate")(spark, d)
    t("warmup count")(full.count())
    t("full foreach rep1")(full.foreach(_ => ()))
    t("full foreach rep2")(full.foreach(_ => ()))
    // pieces: grid join + ONLY the wPrev columns vs + wNext vs + interp
    val ev = graft.Tables.events(spark, d)
    val hourly = ev.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(avg(col("value")), 4).as("v"))
    val bounds = ev.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    val joined = grid.join(hourly, Seq("user_id", "h"), "left")
    t("grid+join foreach")(joined.foreach(_ => ()))
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevOnly = joined
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
    t("+wPrev foreach")(prevOnly.foreach(_ => ()))
    val nextOnly = joined
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wNext))
    t("+wNext SHRINKING frame foreach")(nextOnly.foreach(_ => ()))
    // the fix the key now ships: reversed sort + running frame — same
    // values, O(n log n) instead of O(partition²)
    val wNextRev = Window.partitionBy("user_id").orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextRev = joined
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNextRev))
      .withColumn("nt", last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wNextRev))
    t("+wNext REVERSED running foreach")(nextRev.foreach(_ => ()))
    println("[interp] partition stats:")
    grid.groupBy("user_id").count().agg(count(lit(1)), max("count"), avg("count")).show()
    spark.stop()
  }
}
