package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: re-measure the lshVerified branch-reuse trade under
  * FOREACH timing (the "recompute beats checkpoint" call was made in the
  * count-based era — r7 showed count() timing can hide real cost). Times
  * the production route against an inline variant whose band and mask
  * tables are eagerly checkpointed before the self-joins. */
object ProbeLshPersist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, d)
    docs.count() // warm page cache

    def time(name: String, reps: Int = 2)(f: => Unit): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        f
        println(f"[lsh] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    time("current lshVerified 0.5") {
      Dedup.lshVerified(spark, docs, 0.5).foreach(_ => ())
    }

    time("checkpointed bands+masks") {
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(array_distinct(filter(split(col("text"), " "), t => length(t) > 0))).as("token"))
      val bands = Dedup.bandKeys(tok).localCheckpoint(true)
      val l = bands.select(col("doc_id").as("a_id"), col("band_i"), col("band_v"))
      val r = bands.select(col("doc_id").as("b_id"), col("band_i").as("bi2"), col("band_v").as("bv2"))
      val cand = l.join(r, col("band_i") === col("bi2") && col("band_v") === col("bv2")
          && col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      // single-long mask route (the sf fixtures' 31-token vocabulary)
      val vocab = tok.select("token").distinct()
        .withColumn("tid", (row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("token")) - 1).cast("long"))
      val masks = tok.join(broadcast(vocab), "token")
        .groupBy("doc_id", "lang")
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(tid AS INT)))").as("mask"))
        .localCheckpoint(true)
      val a = masks.select(col("doc_id").as("ma_id"), col("mask").as("a_mask"))
      val b = masks.select(col("doc_id").as("mb_id"), col("mask").as("b_mask"))
      cand.join(a, col("a_id") === col("ma_id"))
        .join(b, col("b_id") === col("mb_id"))
        .withColumn("n_inter", expr("bit_count(a_mask & b_mask)"))
        .withColumn("jacc", col("n_inter").cast("double")
          / (expr("bit_count(a_mask)") + expr("bit_count(b_mask)") - col("n_inter")))
        .where(col("jacc") >= 0.5)
        .select(col("a_id"), col("b_id"), round(col("jacc"), 4).as("jacc"))
        .orderBy("a_id", "b_id")
        .foreach(_ => ())
      graft.ops.Checkpoints.free(bands)
      graft.ops.Checkpoints.free(masks)
    }
    spark.stop()
  }
}
