package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench isolating the multi-word mask intersection cost: the codegen
  * `mask_intersect`/`mask_card` expressions vs the interpreted HOF
  * formulation they replaced, over the same generated pair table (the
  * per-candidate-pair work of `Dedup.verifyPairs` on a V>64 corpus).
  * Run: `sbt "runMain graft.tools.MaskBench [rows] [words]"`. */
object MaskBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val words = args.lift(1).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MaskOps.register(spark)

    // deterministic pseudo-random masks from the row id — no data skew,
    // everything stays inside whole-stage codegen except the op under test
    val pairs = spark.range(rows)
      .withColumn("a_mask", expr(
        s"transform(sequence(1, $words), w -> xxhash64(id, w))"))
      .withColumn("b_mask", expr(
        s"transform(sequence(1, $words), w -> xxhash64(id + 1, w))"))

    val hofInter = "aggregate(zip_with(a_mask, b_mask, (x, y) -> bit_count(x & y)), 0, (acc, n) -> acc + n)"
    val hofCard = "aggregate(transform(a_mask, x -> bit_count(x)), 0, (acc, n) -> acc + n)"

    def time(name: String, agg: String): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val s = pairs.selectExpr(s"sum($agg) AS s").collect()(0).getLong(0)
      println(f"[maskbench] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum=$s)")
    }
    time("hof intersect+card ", s"$hofInter + $hofCard")
    time("expr intersect+card", "mask_intersect(a_mask, b_mask) + mask_card(a_mask)")
    spark.stop()
  }
}
