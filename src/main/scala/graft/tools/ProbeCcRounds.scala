package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Connected-components convergence probe (r5 VERDICT #8 / r6 #2):
  * pointer jumping is O(log diameter) ROUNDS, but each round is a full
  * label shuffle — so the thing to evidence is the rounds-vs-diameter
  * curve, separately from data volume. Two experiments:
  *
  *  1. synthetic path graphs of diameter 2^k (worst case for label
  *     propagation — a random graph's diameter is tiny): measured rounds
  *     must grow ~linearly in k (i.e. logarithmically in diameter);
  *  2. the real supported co-purchase graph at sf0.1 and the clean 10×
  *     corpus: diameter barely moves when volume grows 10×, so rounds —
  *     and with them the per-round-shuffle count — must stay flat. That,
  *     with SCALE_full's time factor, is the 100× story: cost per round
  *     is linear in |E|, round count is a property of graph SHAPE.
  *
  * Run AFTER ScaleFull has built /tmp/graft_sfx10_clean (or it builds it).
  * `sbt "runMain graft.tools.ProbeCcRounds"`. */
object ProbeCcRounds {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("[ccprobe] diameter -> rounds on path graphs (worst-case shape)")
    Seq(16, 256, 4096, 65536).foreach { d =>
      val chain = spark.range(d).select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      val t0 = System.nanoTime()
      val labels = graft.queries.Dedup.clustersPointerJump(chain)
      val nLabels = labels.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] path diameter=$d%-6d rounds=${graft.queries.Dedup.lastPointerJumpRounds}%-3d " +
        f"components=$nLabels time=$sec%.2f s (log2(d)=${math.log(d) / math.log(2)}%.1f)")
      graft.ops.Checkpoints.free(labels)
    }

    def realGraph(dir: String, tag: String): Unit = {
      val li = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val ok8 = li.groupBy("ok").agg(count(lit(1)).as("np")).where(col("np") <= 8)
      val small = li.join(ok8.select("ok"), "ok")
      val edges = small.select(col("ok"), col("pk").as("u"))
        .join(small.select(col("ok").as("ok2"), col("pk").as("v")),
          col("ok") === col("ok2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
        .where(col("support") >= 2)
        .select(col("u").as("a_id"), col("v").as("b_id"))
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val labels = graft.queries.Dedup.clustersPointerJump(edges)
      val comps = labels.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] $tag%-10s edges=$nEdges%-9d rounds=${graft.queries.Dedup.lastPointerJumpRounds}%-3d " +
        f"components=$comps time=$sec%.2f s")
      graft.ops.Checkpoints.free(labels)
    }

    println("[ccprobe] real supported co-purchase graph, volume 1x vs 10x")
    realGraph("/root/testdata/sf0.1", "sf0.1")
    val x10 = "/tmp/graft_sfx10_clean"
    if (new java.io.File(x10).exists) realGraph(x10, "x10-clean")
    else println(s"[ccprobe] $x10 missing — run ScaleFull first for the 10x leg")
    spark.stop()
  }
}
