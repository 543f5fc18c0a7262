package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** KMV bottom-k distinct sketch (`functions.Kmv`, `agg_kmv_distinct`): the
  * oracle pins the estimates exactly (bottom-k of a set is deterministic),
  * so this spec covers the properties the oracle can't express — sketch
  * determinism under partitioning/merge order, exactness below k, estimate
  * quality above k, and the JVM/SQL hash-function lockstep the
  * cross-engine check rests on. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64
  private def kmvAgg = udaf(new Kmv(k))

  test("sketch is deterministic under any partitioning and merge order") {
    // sf0.01: ~150 distinct users > k, so the bottom-k genuinely truncates
    val items = Tables.events(spark, sf001)
      .select(col("user_id").cast("string").as("item"))
    def build(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(kmvAgg(col("item")).as("sk")).head().getSeq[Long](0)
    val once = build(items)
    assert(once.length == k, s"fixture cardinality must exceed k; got ${once.length}")
    assert(once == once.sorted && once.distinct == once, "buffer sorted+distinct invariant")
    assert(build(items.repartition(13, col("item"))) == once)
    assert(build(items.repartition(1)) == once)
    // split-then-merge equals one-shot: driver-side merge of the two
    // halves' sketches reproduces the whole-corpus bottom-k exactly
    val agg = new Kmv(k)
    val half1 = build(items.where(substring(col("item"), -1, 1).isin("0", "1", "2", "3", "4"))).toArray
    val half2 = build(items.where(!substring(col("item"), -1, 1).isin("0", "1", "2", "3", "4"))).toArray
    assert(agg.merge(half1, half2).toSeq == once)
  }

  test("two-level rollup merge equals the direct whole-corpus sketch exactly") {
    // the agg_kmv_merge contract: merge(bottom-k per day) == bottom-k(week)
    val items = Tables.events(spark, sf001)
      .select(to_date(col("ts")).as("day"), col("user_id").cast("string").as("item"))
    val direct = items.agg(kmvAgg(col("item")).as("sk")).head().getSeq[Long](0)
    val mergeAgg = udaf(new graft.functions.KmvMerge(k))
    val merged = items.groupBy("day").agg(kmvAgg(col("item")).as("sk"))
      .agg(mergeAgg(col("sk")).as("m"))
      .head().getSeq[Long](0)
    assert(merged == direct,
      "two-level KMV rollup diverged from the direct sketch — merge is not lossless")
  }

  test("below k distinct values the sketch IS the distinct hash set (estimate exact)") {
    val small = (1 to 20).map(i => s"u$i").toDF("item")
    val sk = small.agg(kmvAgg(col("item")).as("sk")).head().getSeq[Long](0)
    assert(sk.length == 20)
    assert(sk.toSet == (1 to 20).map(i => Kmv.hash60(s"u$i")).toSet)
    // duplicates don't grow the sketch
    val dup = small.union(small).agg(kmvAgg(col("item")).as("sk")).head().getSeq[Long](0)
    assert(dup == sk)
  }

  test("above k the estimate lands within the ~1/sqrt(k-2) KMV error band") {
    (100 to 1000 by 300).foreach { d =>
      val items = (1 to d).map(i => s"v$i").toDF("item")
      val sk = items.agg(kmvAgg(col("item")).as("sk")).head().getSeq[Long](0)
      assert(sk.length == k)
      val est = (k - 1).toDouble / (sk.last.toDouble / 1.152921504606846976e18)
      // 4 sigma of the ~d/sqrt(k-2) stdev — loose but failure-meaningful
      assert(math.abs(est - d) < 4.0 * d / math.sqrt(k - 2.0),
        s"d=$d: estimate $est outside the KMV error band")
    }
  }

  test("JVM hash60 and the SQL/DuckDB twin agree") {
    val probe = Seq("7", "42", "alpha", "üñï", "").toDF("item")
    val sql = probe.select(col("item"),
      conv(substring(md5(col("item")), 1, 15), 16, 10).cast("long").as("h"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    sql.foreach { case (item, h) =>
      assert(Kmv.hash60(item) == h,
        s"item '$item': JVM hash ${Kmv.hash60(item)} != SQL $h")
    }
  }
}
