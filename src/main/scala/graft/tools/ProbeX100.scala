package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Two-decade scaling probe: a 100× events corpus (10 shifted copies of
  * ScaleProbe's clean 10× corpus — 100M rows, ~15k entities) for the
  * events-cohort keys, extending the sf0.1 → 10× growth table by one more
  * measured decade. Only `events.parquet` is derived — the cohort below
  * reads nothing else — so the probe stays minutes, not hours.
  *
  * Same method as ScaleProbe: foreach-forced execution, row counts
  * printed (a probe must assert its volume scaled, not just time it —
  * the r7 vacuous-streaming-rows lesson).
  *
  * Run: `sbt "runMain graft.tools.ProbeX100 [keys] [reps]"`.
  */
object ProbeX100 {

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq(
      "agg_time_bucket", "agg_def_rollup", "agg_kmv_distinct", "agg_kmv_merge",
      "agg_count_min", "agg_heavy_hitters", "win_lag_delta", "win_kalman",
      "stream_tumbling", "stream_kalman",
      // dedup cohort (r8, r7 VERDICT #6): the north-star 100 TB operators
      "llm_dedup_minhash", "llm_dedup_lsh_verified", "llm_dedup_cdc",
      "llm_dedup_near"))
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val x10 = "/tmp/graft_sfx10_clean"
    ScaleProbe.build(spark, "/root/testdata/sf0.1", x10, clean = true)
    val out = "/tmp/graft_sfx100"
    if (!graft.Fs.existsNonEmptyData(spark, s"$out/events.parquet")) {
      println(s"[x100] building 10x copy of $x10 events at $out")
      // the 10x events carry raw-nanos LongType ts (ScaleProbe.build wrote
      // them that way so Tables.events' nanosAsLong branch engages) —
      // shifted copies preserve that; id offsets clear the 10x offsets
      // (event_id +i*1e10, user_id +i*1e6) by two orders of magnitude
      val ev = spark.read.parquet(s"$x10/events.parquet")
      (0 until 10).map(j => ev
          .withColumn("event_id", col("event_id") + lit(j.toLong * 1000000000000L))
          .withColumn("user_id", col("user_id") + lit(j.toLong * 100000000L)))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    }
    if (keys.exists(_.startsWith("llm_")) &&
        !graft.Fs.existsNonEmptyData(spark, s"$out/documents.parquet")) {
      println(s"[x100] building 10x copy of $x10 documents at $out")
      // density-preserving second decade, ScaleProbe's `clean` recipe one
      // level up: per copy j, a deterministic 50% of each doc's tokens
      // gain a `~j` suffix — within-copy Jaccard (and so pair DENSITY)
      // preserved exactly, cross-copy similarity pushed far below every
      // key's threshold; doc_id offsets (j·1e11) clear the 10x offsets
      // (i·1e9) by two orders of magnitude
      val docs = spark.read.parquet(s"$x10/documents.parquet")
      (0 until 10).map(j => docs
          .withColumn("doc_id", col("doc_id") + lit(j.toLong * 100000000000L))
          .withColumn("text", concat_ws(" ", transform(
            filter(split(col("text"), " "), t => length(t) > 0),
            t => when(pmod(xxhash64(t, lit(1000 + j)), lit(2)) === 0,
              concat(t, lit(s"~$j"))).otherwise(t)))))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k, sys.error(s"unknown key $k"))
      (1 to reps).foreach { r =>
        val rows = spark.sparkContext.longAccumulator
        val t0 = System.nanoTime()
        fn(spark, out).foreach(_ => rows.add(1L))
        println(f"[x100] $k rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (${rows.value} rows)")
      }
    }
    spark.stop()
  }
}
