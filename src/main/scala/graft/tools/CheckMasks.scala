package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mask-integrity microscope for the 100× corpus: rebuilds
  * `Dedup.tokenMasks`' multi-word masks inline over the full corpus
  * dictionary, then for the 100 copies of one base doc compares the
  * mask-derived Jaccard against the exact token-set Jaccard. Any pair
  * where the two disagree exposes the mask bug scale regime.
  * Run: `sbt "runMain graft.tools.CheckMasks [dir] [baseId]"`. */
object CheckMasks {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sfx100")
    val base = args.lift(1).map(_.toLong).getOrElse(42L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.MaskOps.register(spark)

    val docs = graft.Tables.documents(spark, d)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(filter(split(col("text"), " "),
        t => length(t) > 0))).as("token"))
    // same dictionary build as Dedup.tokenMasks (window route)
    val distinctTok = tok.select("token").distinct()
    val v = distinctTok.count()
    val vocab = distinctTok.withColumn("tid",
      (row_number().over(Window.orderBy("token")) - 1).cast("long"))
    val words = ((v - 1) / 64 + 1).toInt
    println(s"[checkmasks] vocab=$v words=$words")
    val m = tok.join(broadcast(vocab), "token")
      .withColumn("widx", (col("tid") / 64).cast("int"))
      .groupBy("doc_id", "lang", "widx")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(tid % 64 AS INT)))").as("w"))
      .groupBy("doc_id", "lang")
      .agg(map_from_arrays(collect_list("widx"), collect_list("w")).as("wm"))
      .withColumn("mask", expr(
        s"transform(sequence(0, ${words - 1}), i -> coalesce(wm[i], CAST(0 AS BIGINT)))"))
      .drop("wm")

    val fam = (0 until 10).flatMap(i => (0 until 10).map(j =>
      base + i.toLong * 1000000000L + j.toLong * 100000000000L))
    val famDf = spark.createDataFrame(
      spark.sparkContext.parallelize(fam.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
    val fm = m.join(famDf, "doc_id")
    val ft = tok.join(famDf, "doc_id").groupBy("doc_id")
      .agg(collect_set("token").as("ts"))
    val a = fm.select(col("doc_id").as("a_id"), col("mask").as("a_mask"))
    val b = fm.select(col("doc_id").as("b_id"), col("mask").as("b_mask"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .withColumn("ni_mask", expr("mask_intersect(a_mask, b_mask)"))
      .withColumn("ca", expr("mask_card(a_mask)"))
      .withColumn("cb", expr("mask_card(b_mask)"))
      .withColumn("jacc_mask", col("ni_mask").cast("double")
        / (col("ca") + col("cb") - col("ni_mask")))
    val exact = ft.select(col("doc_id").as("a_id"), col("ts").as("a_ts"))
      .join(ft.select(col("doc_id").as("b_id"), col("ts").as("b_ts")),
        col("a_id") < col("b_id"))
      .withColumn("ni_exact", size(array_intersect(col("a_ts"), col("b_ts"))))
      .withColumn("jacc_exact", col("ni_exact").cast("double")
        / (size(col("a_ts")) + size(col("b_ts")) - col("ni_exact")))
      .select("a_id", "b_id", "ni_exact", "jacc_exact")
    val cmp = pairs.join(exact, Seq("a_id", "b_id"))
      .withColumn("diff", abs(col("jacc_mask") - col("jacc_exact")))
    val bad = cmp.where(col("diff") > 1e-9)
      .orderBy(col("diff").desc)
      .select("a_id", "b_id", "ni_mask", "ni_exact", "ca", "cb", "jacc_mask", "jacc_exact")
    println(s"[checkmasks] mismatching pairs: ${bad.count()} of ${cmp.count()}")
    bad.show(10, truncate = false)
    spark.stop()
  }
}
