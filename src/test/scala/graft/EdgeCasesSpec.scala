package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup
import graft.ops.{Knn, Skew, Upsert}

/** Degenerate-input behavior of the library operators: empty frames,
  * single rows, and k > corpus must produce well-defined results, not
  * exceptions — at 100 TB a partition, day, or stratum being empty is the
  * common case, not the corner. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyKV = Seq.empty[(Long, Double)].toDF("k", "v")

  test("upsert with an empty batch leaves the base untouched") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val merged = Upsert.lastWriterWins(base, emptyKV, Seq("k"))
    assert(merged.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == Seq((1L, 1.0), (2L, 2.0)))
  }

  test("upsert into an empty base is the batch") {
    val batch = Seq((1L, 1.0)).toDF("k", "v")
    val merged = Upsert.lastWriterWins(emptyKV, batch, Seq("k"))
    assert(merged.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 1.0)))
  }

  test("connected components over an empty pair set is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.clusters(pairs).isEmpty)
    assert(Dedup.clustersPointerJump(pairs).isEmpty)
  }

  test("k-NN with k exceeding the corpus returns all other vectors, ordered") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1), (2L, Array(1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val edges = Knn.topKCosine(vecs, k = 10).collect()
    assert(edges.length == 6) // each of 3 vectors sees the other 2
    edges.groupBy(_.q_id).foreach { case (_, es) =>
      val sims = es.sortBy(e => (-e.sim, e.c_id)).map(_.sim).toSeq
      assert(sims == es.map(_.sim).sorted.reverse.toSeq)
    }
  }

  test("salted aggregation of an empty frame is empty, not a crash") {
    val out = Skew.saltedAgg(
      Seq.empty[(String, Double)].toDF("g", "v"), Seq("g"), 4,
      Map("n" -> ("v", "count"), "s" -> ("v", "sum")))
    assert(out.isEmpty)
  }

  test("single-sample resample emits exactly one bucket with its own value") {
    // one reading -> an hourly grid of one bucket; carry-forward has
    // nothing to fill
    val one = Seq((7L, "2024-01-01 10:20:00", 5.0)).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    one.createOrReplaceTempView("edge_resample_in")
    val grid = spark.sql(
      """SELECT user_id, explode(sequence(date_trunc('hour', min_ts),
        |       date_trunc('hour', max_ts), INTERVAL 1 HOUR)) AS h
        |FROM (SELECT user_id, min(ts) AS min_ts, max(ts) AS max_ts
        |      FROM edge_resample_in GROUP BY user_id)""".stripMargin)
    assert(grid.count() == 1)
  }

  test("fingerprint-gated refresh works when the source is empty") {
    val root = tmpDir("relations_empty")
    val empty = Seq.empty[(Long, Long)].toDF("source_id", "target_id")
    val r1 = graft.directory.Relations.refreshIncremental(spark, root, "e")(empty)(identity)
    assert(r1.refreshed && r1.relation.isEmpty)
    val r2 = graft.directory.Relations.refreshIncremental(spark, root, "e")(empty)(identity)
    assert(!r2.refreshed, "empty fingerprint must be stable")
  }
}
