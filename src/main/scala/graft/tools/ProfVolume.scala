package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume probe for the pair-generating families: prints, for a
  * given data dir, the candidate-pair counts that drive each family's
  * cost — positional 5-gram collisions (llm_dedup_span), 3-gram shingle
  * collision pairs (ngram/containment/stopgram), minhash band collisions
  * (minhash/lsh_verified/near/clusters/survivors), simhash16 bucket pairs
  * (llm_dedup_simhash_lsh), and IVF within-cell pairs Σ occ·(occ−1)/2
  * (ivf_probe/pq_adc/pq_rerank/semdedup).
  *
  * Discriminator for SCALE_full's >10× keys: if wall-time growth ≈
  * candidate-volume growth, the plan is LINEAR in its true workload and
  * the growth is data-density-bound (fixture similarity), not a plan
  * defect. Run at sf0.1 and at the 10× derived corpus and compare.
  *
  * Run: `sbt "runMain graft.tools.ProfVolume [dir]"`.
  */
object ProfVolume {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, dir)
    def report(name: String, n: Long): Unit = println(f"[vol] $dir%-28s $name%-22s $n%,d")

    // positional 5-gram collision pairs (the llm_dedup_span join input)
    val sh5 = docs
      .withColumn("toks", filter(split(col("text"), " "), t => length(t) > 0))
      .where(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("toks")) - 5),
        i => concat_ws(" ", (0 until 5).map(o => element_at(col("toks"), i + o + 1)): _*)))
        .as("sh"))
    val df5 = sh5.groupBy("sh").agg(count(lit(1)).as("c"))
    report("span_5gram_pairs", df5.agg(sum(col("c") * (col("c") - 1) / 2)).head.getDouble(0).toLong)

    // distinct 3-gram shingle collision pairs (ngram family join input)
    val sh3 = docs
      .withColumn("toks", filter(split(col("text"), " "), t => length(t) > 0))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))).as("sh"))
    val df3 = sh3.groupBy("sh").agg(count(lit(1)).as("c"))
    report("ngram_3gram_pairs", df3.agg(sum(col("c") * (col("c") - 1) / 2)).head.getDouble(0).toLong)

    // minhash band-collision pairs (lsh family join input)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(filter(split(col("text"), " "), t => length(t) > 0))).as("token"))
    val mhCols = (0 until 8).map(i => min(md5(concat(lit(s"$i:"), col("token")))).as(s"mh$i"))
    val mh = tok.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    val bands = mh.select(col("doc_id"), explode(array(
      (0 until 2).map(j => md5(concat(col(s"mh${4 * j}"), col(s"mh${4 * j + 1}"),
        col(s"mh${4 * j + 2}"), col(s"mh${4 * j + 3}")))): _*)).as("bv"))
    val bc = bands.groupBy("bv").agg(count(lit(1)).as("c"))
    report("minhash_band_pairs", bc.agg(sum(col("c") * (col("c") - 1) / 2)).head.getDouble(0).toLong)

    // IVF within-cell pairs at the keys' autoNlist configuration
    graft.functions.VecDot.register(spark)
    val vecs = graft.Tables.embeddings(spark, dir)
      .withColumn("norm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
    val n = vecs.count()
    val nlist = graft.ops.Ivf.autoNlist(n, nprobe = 1)
    val ranked = graft.ops.Ivf.coarseRanked(vecs, nlist)
    val occ = ranked.where(col("r") === 1).groupBy("cell").agg(count(lit(1)).as("c"))
    report(s"ivf_cell_pairs(nlist=$nlist)",
      occ.agg(sum(col("c") * (col("c") - 1) / 2)).head.getDouble(0).toLong)

    spark.stop()
  }
}
