package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for the two-level coarse quantizer design (r8): with the
  * deterministic seeded-mean centroids (near-degenerate on this
  * near-orthogonal corpus), does centroid→supercell argmax assignment
  * stay balanced enough to bound level-2 scan width, and how often does
  * the pruned two-level home cell agree with the flat argmax? Decides
  * whether the two-level key is worth an oracle. */
object ProbeIvf2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VecDot.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("vec_dot", a, b)

    val v0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val v = v0.withColumn("norm",
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)))
    val n = v.count()
    val nlist = graft.ops.Ivf.occupancyNlist(n, 50)
    val sprobe = 4
    val nsuper = math.min(256L, math.max(4L,
      math.ceil(math.sqrt(sprobe.toDouble * nlist)).toLong)).toInt
    println(s"[ivf2] n=$n nlist=$nlist nsuper=$nsuper sprobe=$sprobe")

    val ranked = graft.ops.Ivf.coarseRanked(v, nlist)
    val cent = ranked.sparkSession.emptyDataFrame // placeholder (not used)

    // rebuild centroid table the same way Ivf.coarseRanked does
    val seeded = v.withColumn("seed",
      pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 4), 16, 10).cast("long"),
        lit(nlist.toLong)))
    val centT = seeded
      .select(col("seed"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("seed", "i")
      .agg(sort_array(collect_list(col("x").cast("double"))).as("xs"))
      .select(col("seed"), col("i"),
        (aggregate(col("xs"), lit(0.0), (acc, e) => acc + e) / size(col("xs"))).as("m"))
      .groupBy("seed")
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("im"))
      .select(col("seed").as("cell"),
        transform(col("im"), e => e.getField("m")).as("centroid"))
      .withColumn("cnorm", sqrt(dot(col("centroid"), col("centroid"))))
      .localCheckpoint(true)

    // supercentroids: seed groups of centroids (md5(cell) % nsuper), one mean step
    val sseeded = centT.withColumn("sseed",
      pmod(conv(substring(md5(col("cell").cast("string")), 1, 4), 16, 10).cast("long"),
        lit(nsuper.toLong)))
    val scent = sseeded
      .select(col("sseed"), posexplode(col("centroid")).as(Seq("i", "x")))
      .groupBy("sseed", "i")
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .select(col("sseed"), col("i"),
        (aggregate(col("xs"), lit(0.0), (acc, e) => acc + e) / size(col("xs"))).as("m"))
      .groupBy("sseed")
      .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("im"))
      .select(col("sseed").as("scell"),
        transform(col("im"), e => e.getField("m")).as("scentroid"))
      .withColumn("snorm", sqrt(dot(col("scentroid"), col("scentroid"))))
      .localCheckpoint(true)

    // centroid -> nearest supercentroid (geometric argmax)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("cs").desc, col("scell").asc)
    val cAsg = centT.crossJoin(broadcast(scent))
      .withColumn("cs", dot(col("centroid"), col("scentroid")) / (col("cnorm") * col("snorm")))
      .withColumn("r", row_number().over(cw)).where(col("r") === 1)
      .select(col("cell"), col("scell"))
      .localCheckpoint(true)
    println("[ivf2] centroid-per-supercell occupancy:")
    cAsg.groupBy("scell").agg(count(lit(1)).as("c"))
      .agg(min("c"), expr("percentile(c, 0.5)"), max("c"), count(lit(1))).show(false)

    // vector level-1: rank supercells, keep top sprobe
    val vw = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("ss").desc, col("scell").asc)
    val l1 = v.crossJoin(broadcast(scent))
      .withColumn("ss", dot(col("embedding"), col("scentroid")) / (col("norm") * col("snorm")))
      .withColumn("r1", row_number().over(vw)).where(col("r1") <= sprobe)
      .select(col("vec_id"), col("scell"))
    // level-2: candidate centroids in probed supercells, argmax
    val cand = l1.join(broadcast(cAsg), "scell")
    println("[ivf2] level-2 scanned centroids per vector:")
    cand.groupBy("vec_id").agg(count(lit(1)).as("c"))
      .agg(min("c"), expr("percentile(c, 0.5)"), max("c")).show(false)
    val l2w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cs2").desc, col("cell").asc)
    val home2 = cand.join(v.select("vec_id", "embedding", "norm"), "vec_id")
      .join(broadcast(centT), "cell")
      .withColumn("cs2", dot(col("embedding"), col("centroid")) / (col("norm") * col("cnorm")))
      .withColumn("r2", row_number().over(l2w)).where(col("r2") === 1)
      .select(col("vec_id"), col("cell").as("cell2"))
    val home1 = ranked.where(col("r") === 1).select(col("vec_id"), col("cell").as("cell1"))
    val agree = home1.join(home2, "vec_id")
      .agg(count(lit(1)).as("n"),
        sum((col("cell1") === col("cell2")).cast("long")).as("same"))
    agree.show(false)
    // occupancy of the two-level home cells (the serving-side balance)
    println("[ivf2] two-level home-cell occupancy:")
    home2.groupBy("cell2").agg(count(lit(1)).as("c"))
      .agg(min("c"), expr("percentile(c, 0.5)"), max("c"), count(lit(1))).show(false)
    spark.stop()
  }
}
