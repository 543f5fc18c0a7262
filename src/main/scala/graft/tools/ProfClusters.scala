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
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val docs = graft.Tables.documents(spark, d)
    docs.count()
    // raw band-collision volume vs distinct candidates
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(filter(split(col("text")," "), x => length(x)>0))).as("token"))
    val bands = Dedup.bandKeys(tok)
    val l = bands.select(col("doc_id").as("a_id"), col("band_i"), col("band_v"))
    val r = bands.select(col("doc_id").as("b_id"), col("band_i").as("bi2"), col("band_v").as("bv2"))
    val raw = l.join(r, col("band_i")===col("bi2") && col("band_v")===col("bv2") && col("a_id")<col("b_id")).select("a_id","b_id")
    t("raw collisions")(println("raw=" + raw.count()))
    t("distinct candidates")(println("cand=" + raw.distinct().count()))
    t("lshVerified 0.5 (current)")(println("v05=" + Dedup.lshVerified(spark, docs, 0.5).count()))
    t("lshVerified 0.9 (current)")(println("v09=" + Dedup.lshVerified(spark, docs, 0.9).count()))
    spark.stop()
  }
}
