package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ivf

/** IVF at PRODUCTION query/corpus asymmetry (r6 VERDICT #6): the registry
  * keys evaluate with all-corpus-as-queries (every vector queries the
  * index), which makes total time look n^1.5 even when the per-query work
  * is healthy. A deployed ANN index answers a bounded query stream over a
  * growing corpus, so the number that matters is PER-QUERY cost as the
  * corpus grows — measured here with a FIXED deterministic 500-query
  * sample (the `llm_recall_at_k` sampling shape) against the sf0.1 corpus
  * and the clean 10× copy, under three nlist policies:
  *
  *   - fixed nlist=64: cell size grows with n ⇒ per-query cost grows ~n
  *     (the anti-pattern the sizing rule exists to prevent);
  *   - √-rule `Ivf.autoNlist(n)`: cell size ~√n ⇒ per-query ~√n — the
  *     self-tuning default when reindex cadence is corpus-growth-bound;
  *   - linear nlist=n/50 (fixed target occupancy ≈50): per-query cost
  *     FLAT in corpus size at fixed nprobe — the 100 TB stance: scale the
  *     cell count with the corpus and a query's cost is occupancy·nprobe,
  *     a constant you choose, regardless of corpus size.
  *
  * The query side is restricted BEFORE the cell join (broadcast semi-join
  * on the sampled ids over the probe assignments), so the measured work is
  * genuinely Q·occupancy·nprobe, not all-pairs-then-filter.
  *
  * `sbt "runMain graft.tools.ProbeIvfQueries [reps]"`. */
object ProbeIvfQueries {
  private val QueryN = 500

  /** Top-1 within probed cells for the sampled queries; returns
    * (matched query count, candidate pair count). At fixture scale the
    * wall-clock is stage-overhead-dominated, so the CANDIDATE VOLUME —
    * Q·occupancy·nprobe, the thing that grows — is the number that
    * evidences each policy's asymptotics. */
  private def searchSampled(v: DataFrame, nlist: Int, nprobe: Int): (Long, Long) = {
    val ranked = Ivf.coarseRanked(v, nlist)
    val qids = v.select(col("vec_id"))
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit("|probeq"))))
      .orderBy("h").limit(QueryN).select(col("vec_id").as("q_id"))
    val probes = ranked.where(col("r") <= nprobe)
      .join(broadcast(qids), col("vec_id") === col("q_id"))
      .select(col("vec_id").as("a_id"), col("embedding").as("a_e"),
        col("norm").as("a_n"), col("cell").as("p_cell"))
    val cells = ranked.where(col("r") === 1)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_e"),
        col("norm").as("b_n"), col("cell").as("b_cell"))
    val sims = probes.join(cells,
        col("p_cell") === col("b_cell") && col("a_id") =!= col("b_id"))
      .withColumn("sim", call_function("vec_dot", col("a_e"), col("b_e"))
        / (col("a_n") * col("b_n")))
    val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val matched = sims.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).count()
    (matched, sims.count())
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecDot.register(spark)
    ScaleProbe.buildEmb(spark, "/root/testdata/sf0.1", "/tmp/graft_ivf10")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_ivf10")) {
      val v = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .withColumn("norm",
          sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
        .localCheckpoint(true) // charge the scan once, not per policy leg
      val n = v.count()
      for ((policy, nlist) <- Seq(
          ("fixed64", 64),
          ("sqrt", Ivf.autoNlist(n)),
          ("linear", math.max(1, (n / 50).toInt)))) {
        var cand = 0L
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val (matched, c) = searchSampled(v, nlist, nprobe = 2)
          require(matched > 0, "no query matched — sample broken")
          cand = c
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val warm = times.head
        println(f"[ivfq] n=$n%-6d policy=$policy%-8s nlist=$nlist%-5d " +
          f"q=$QueryN candidates=$cand%-8d cand/query=${cand.toDouble / QueryN}%-7.1f " +
          f"warm=$warm%.2f s per-query=${warm * 1000 / QueryN}%.2f ms")
      }
      graft.ops.Checkpoints.free(v)
    }
    spark.stop()
  }
}
