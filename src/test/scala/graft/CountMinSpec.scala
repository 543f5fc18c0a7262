package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMin, CountMinMerge}

/** Count-Min sketch (`functions.CountMin`, `agg_count_min`): the oracle
  * pins the estimates exactly (the sketch is deterministic), so this spec
  * covers the PROPERTIES the oracle can't express — the one-sided error
  * guarantee, merge-order independence, and the JVM/SQL bucket-function
  * lockstep the cross-engine check rests on. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val (depth, width) = (4, 64)

  test("estimates never undercount, and excess stays within the CM bound") {
    val items = Tables.events(spark, sf0001)
      .select(col("user_id").cast("string").as("item"))
    val n = items.count()
    val sketch = items.as[String]
      .select(new CountMin(depth, width).toColumn.name("sketch"))
    val rows = items.groupBy("item").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sketch))
      .select(col("item"), col("n_exact"),
        CountMin.estimateCol(col("sketch"), col("item"), depth, width).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CM estimate $est below exact $exact")
      // expected per-row excess is <= N/width; min over `depth` rows makes
      // 4x that a comfortably loose deterministic-fixture bound
      assert(est - exact <= 4L * n / width,
        s"${r.getString(0)}: excess ${est - exact} beyond 4N/w at N=$n")
    }
  }

  test("sketch is deterministic under any partitioning and merge order") {
    val items = Tables.events(spark, sf0001)
      .select(col("user_id").cast("string").as("item"))
    def build(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.as[String].select(new CountMin(depth, width).toColumn.name("sk"))
        .head().toSeq
    val once = build(items)
    assert(once.sum == items.count() * depth, "every row lands depth counters")
    assert(build(items.repartition(13, col("item"))) == once)
    assert(build(items.repartition(1)) == once)
    // split-then-merge equals one-shot: elementwise-sum mergeability
    val half1 = build(items.where(substring(col("item"), -1, 1).isin("0", "1", "2", "3", "4")))
    val half2 = build(items.where(!substring(col("item"), -1, 1).isin("0", "1", "2", "3", "4")))
    assert(half1.zip(half2).map { case (a, b) => a + b } == once)
  }

  test("JVM bucket function and the SQL readout twin agree") {
    val probe = Seq("7", "42", "alpha", "üñï", "").toDF("item")
    (0 until depth).foreach { r =>
      val sql = probe.select(col("item"),
        (conv(substring(md5(concat(lit(s"$r:"), col("item"))), 1, 8), 16, 10)
          .cast("long") % width).cast("int").as("b"))
        .collect().map(x => x.getString(0) -> x.getInt(1)).toMap
      sql.foreach { case (item, b) =>
        assert(CountMin.bucket(r, item, width) == b,
          s"row $r item '$item': JVM bucket ${CountMin.bucket(r, item, width)} != SQL $b")
      }
    }
  }

  test("merging daily sketches equals sketching the raw week (agg_cm_merge mergeability)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (depth, width) = (4, 64)
    val cmAgg = udaf(new CountMin(depth, width))
    val cmMerge = udaf(new CountMinMerge(depth, width))
    val ev = Tables.events(spark, sf0001)
      .select(to_date(col("ts")).as("day"), col("user_id").cast("string").as("item"))
    val merged = ev.groupBy("day").agg(cmAgg(col("item")).as("sk"))
      .groupBy(weekofyear(col("day")).as("week")).agg(cmMerge(col("sk")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val direct = ev.groupBy(weekofyear(col("day")).as("week"))
      .agg(cmAgg(col("item")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (w, sk) =>
      assert(sk.sameElements(direct(w)), s"week $w: merged sketch != direct sketch") }
    // weekly estimates stay one-sided against the exact weekly counts
    val est = SparkEntry.queries("agg_cm_merge")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(est.nonEmpty)
    est.foreach { case (w, item, exact, e) =>
      assert(e >= exact, s"week $w item $item: CM under-counted ($e < $exact)") }
  }
}
