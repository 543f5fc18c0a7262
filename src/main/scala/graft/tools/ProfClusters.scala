package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfClusters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val docs = graft.Tables.documents(spark, d)
    docs.count() // warm
    t("lsh 0.5 warm")(Dedup.lshVerified(spark, docs, 0.5).count())
    t("lsh 0.9 run1")(Dedup.lshVerified(spark, docs, 0.9).count())
    t("lsh 0.9 run2")(Dedup.lshVerified(spark, docs, 0.9).count())
    val pre = Dedup.lshVerified(spark, docs, 0.9)
      .select(col("a_id"), col("b_id")).localCheckpoint(true)
    t("clustering only (pre-ckpt)")(Dedup.clustersPointerJump(pre).count())
    spark.stop()
  }
}
