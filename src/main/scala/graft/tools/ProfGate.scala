package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Llm

/** Measures BOTH sides of `Llm.PairJoinGate` for the three gated pairwise
  * keys at a given SF (VERDICT r3 finding #4 asked for the boundary to be
  * justified by measurement, not construction): gate=Long.MaxValue forces
  * the exact all-pairs route, gate=0 forces the blocked/banded route.
  * `sbt "runMain graft.tools.ProfGate [sfDir] [reps]"`.
  */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val cases: Seq[(String, Long => org.apache.spark.sql.DataFrame)] = Seq(
      "llm_dedup_simhash_pairs" -> (g => Llm.simhashPairs(spark, sfDir, g)),
      "llm_cosine_topk" -> (g => Llm.cosineTopK(spark, sfDir, g)),
      "llm_dedup_embed" -> (g => Llm.dedupEmbed(spark, sfDir, g)))
    for ((name, fn) <- cases; (side, gate) <- Seq(
        "allpairs" -> Long.MaxValue, "blocked" -> 0L)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(gate).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[profgate] $name $side: $med%.2f s median of $reps (${times.head._2} rows)")
    }
    spark.stop()
  }
}
