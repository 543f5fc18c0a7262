package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val docs = graft.Tables.documents(spark, d)
    println("docs=" + docs.count())
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(filter(split(col("text")," "), x => length(x)>0))).as("token"))
    t("tok count")(println("tokens=" + tok.count()))
    t("vocab")(println("vocab=" + tok.select("token").distinct().count()))
    val bands = Dedup.bandKeys(tok)
    t("bandKeys")(println("bands=" + bands.count()))
    val l = bands.select(col("doc_id").as("a_id"), col("band_i"), col("band_v"))
    val r = bands.select(col("doc_id").as("b_id"), col("band_i").as("bi2"), col("band_v").as("bv2"))
    val cand = l.join(r, col("band_i")===col("bi2") && col("band_v")===col("bv2") && col("a_id")<col("b_id")).select("a_id","b_id").distinct()
    t("candidates")(println("cand=" + cand.count()))
    t("lshVerified full")(println("verified=" + Dedup.lshVerified(spark, docs, 0.5).count()))
    t("jaccardBitmask 0.9")(println("pairs09=" + Dedup.jaccardBitmask(spark, docs, 0.9).count()))
    t("clusters full")(println("clusters=" + Llm.queries("llm_dedup_clusters")(spark, d).count()))
    spark.stop()
  }
}
