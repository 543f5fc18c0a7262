package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Two-decade probe for the ANN index-BUILD story (r8): times
  * `llm_ivf_serve` (one-level flat argmax, n·nlist build work) against
  * `llm_ivf_two_level` (supercell-pruned assignment, ~2·n·√(sprobe·nlist))
  * on 1× / 10× / 100× embedding corpora, all under the same linear
  * nlist = n/50 serving policy. The 100× corpus (10 jittered copies of
  * the 10× corpus — same recipe as ScaleProbe.buildEmb, so geometry and
  * occupancy scale the way a real corpus grows) is where the build terms
  * separate: one-level work grows 100× per decade under nlist ∝ n, the
  * two-level route √-prunes the second decade away.
  *
  * Run: `sbt "runMain graft.tools.ProbeIvf2 [reps]"`. Row counts are
  * printed and must scale (the r7 vacuous-probe lesson). */
object ProbeIvf2 {
  private def buildEmb100(spark: SparkSession, src: String, out: String): Unit = {
    val target = s"$out/embeddings.parquet"
    val base = spark.read.parquet(s"$src/embeddings.parquet")
    val want = base.count() * 10
    if (graft.Fs.existsNonEmptyData(spark, target) &&
        spark.read.parquet(target).count() == want) return
    println(s"[ivf2] building 100x embeddings at $target (${want} vectors)")
    (0 until 10).map { i =>
      base
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 100000000L))
        .withColumn("embedding", transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000))
            .cast("double") - 499.5d) * lit(1e-5d)).cast("float")))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(target)
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ten = "/tmp/graft_sfx10_clean"
    val hundred = "/tmp/graft_emb100"
    require(graft.Fs.existsNonEmptyData(spark, s"$ten/embeddings.parquet"),
      "run ScaleProbe first to build the 10x corpus")
    new java.io.File(hundred).mkdirs()
    buildEmb100(spark, ten, hundred)
    spark.range(1000).selectExpr("sum(id)").collect()
    for (dir <- Seq("/root/testdata/sf0.1", ten, hundred)) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      for (key <- Seq("llm_ivf_serve", "llm_ivf_two_level")) {
        val fn = SparkEntry.queries(key)
        (1 to reps).foreach { r =>
          val rows = spark.sparkContext.longAccumulator
          val t0 = System.nanoTime()
          fn(spark, dir).foreach(_ => rows.add(1L))
          println(f"[ivf2] $key n=$n rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (${rows.value} rows)")
        }
      }
    }
    spark.stop()
  }
}
