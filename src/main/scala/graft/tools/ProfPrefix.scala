package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-cost dissection of the r8 prefix-filtered `llm_dedup_near` plan
  * (`Dedup.jaccardBitmask`) — which of {prefix build, candidate
  * join+distinct, mask build, verify} owns the sf0.1 bill. Run:
  * `sbt "runMain graft.tools.ProfPrefix [sfDir]"`. */
object ProfPrefix {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MaskOps.register(spark)
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profprefix] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val t = 0.5
    val docs = graft.Tables.documents(spark, d)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(filter(split(col("text"), " "),
        x => length(x) > 0))).as("token"))
    val dfreq = tok.groupBy("token").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id")
    def prefixDf = tok.join(dfreq, "token")
      .withColumn("rn", row_number().over(wDoc.orderBy(col("df"), col("token"))))
      .withColumn("ntok", count(lit(1)).over(wDoc))
      .where(col("rn") <= floor(lit(1.0 - t) * col("ntok")) + 1)
      .select(col("doc_id"), col("lang"), col("token"), col("rn"), col("ntok"))
    val prefix = time("prefix build (+checkpoint)")(prefixDf.localCheckpoint(true))
    val a = prefix.select(col("doc_id").as("a_id"), col("lang"), col("token"),
      col("rn").as("a_rn"), col("ntok").as("a_n"))
    val b = prefix.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
      col("token").as("b_token"), col("rn").as("b_rn"), col("ntok").as("b_n"))
    val alpha = lit(t / (1.0 + t)) * (col("a_n") + col("b_n"))
    def candDf = a.join(b, col("token") === col("b_token")
        && col("lang") === col("b_lang") && col("a_id") < col("b_id")
        && col("b_n") >= lit(t) * col("a_n") && col("a_n") >= lit(t) * col("b_n")
        && (lit(1) + least(col("a_n") - col("a_rn"), col("b_n") - col("b_rn"))) >= alpha)
      .select("a_id", "b_id").distinct()
    val cand = time("candidate join+distinct (+checkpoint)")(candDf.localCheckpoint(true))
    println("[profprefix] candidates=" + cand.count())
    val full = time("full key (foreach)")(
      graft.SparkEntry.queries("llm_dedup_near")(spark, d).foreach(_ => ()))
    val _ = full
    spark.stop()
  }
}
