package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ivf

/** Measures what `Ivf.autoNlist` buys at scale (VERDICT r3 #5 done-
  * criterion): a full IVF nearest-neighbor search (coarse assign →
  * within-cell candidates → cosine → top-1 per query) timed at the demo's
  * pinned nlist=16 vs the √-rule auto nlist, on sf0.1 embeddings and on
  * the 10× ScaleProbe copy. With nlist fixed, candidate volume grows
  * occupancy² (the super-linear ivf_probe/pq_adc growth NOTES' probe
  * measured); with auto nlist it tracks n^1.5 total (√n per query).
  * `sbt "runMain graft.tools.ProfIvf [reps]"`.
  */
object ProfIvf {
  private def search(v: DataFrame, nlist: Int): Long = {
    val ranked = Ivf.coarseRanked(v, nlist)
    val emb = v.select(col("vec_id").as("id"), col("embedding").as("e"), col("norm").as("nm"))
    val cand = Ivf.candidates(ranked, nprobe = 1)
      .join(emb.withColumnRenamed("id", "a_id").withColumnRenamed("e", "a_e")
        .withColumnRenamed("nm", "a_n"), "a_id")
      .join(emb.withColumnRenamed("id", "b_id").withColumnRenamed("e", "b_e")
        .withColumnRenamed("nm", "b_n"), "b_id")
      .withColumn("sim", call_function("vec_dot", col("a_e"), col("b_e"))
        / (col("a_n") * col("b_n")))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1).count()
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecDot.register(spark)
    ScaleProbe.buildEmb(spark, "/root/testdata/sf0.1", "/tmp/graft_ivf10")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_ivf10")) {
      val v = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .withColumn("norm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
      val n = v.count()
      val auto = Ivf.autoNlist(n)
      for ((tag, nlist) <- Seq("fixed16" -> 16, s"auto$auto" -> auto)) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val rows = search(v, nlist)
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val med = times.map(_._1).sorted.apply(reps / 2)
        println(f"[profivf] n=$n $tag: $med%.2f s median of $reps (${times.head._2} queries answered)")
      }
    }
    spark.stop()
  }
}
