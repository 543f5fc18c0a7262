package graft

import org.apache.spark.sql.functions._

/** HLL sketch aggregation (`agg_sketch_merge`): the re-aggregable
  * distinct-count path for materialized rollups. The driver only
  * rows-checks this key (estimates are engine-specific), so accuracy and
  * mergeability are pinned here instead. */
class SketchSpec extends SparkSpec {

  test("weekly HLL estimate lands within 2% of the exact distinct count") {
    val ev = Tables.events(spark, sf0001)
    val est = ev.groupBy(weekofyear(to_date(col("ts"))).as("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(weekofyear(to_date(col("ts"))).as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (w, n) =>
      val e = est(w)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.02).toLong),
        s"week $w: estimate $e vs exact $n drifts past 2%")
    }
  }

  test("dq profile switches to HLL above the row gate: same schema, <=2% drift") {
    val ev = Tables.events(spark, sf0001)
    val exact = graft.queries.Aggs.dqProfile(ev, Long.MaxValue)
    val approx = graft.queries.Aggs.dqProfile(ev, 0L) // force the sketch path
    assert(approx.schema == exact.schema,
      s"gate must not change the contract: ${approx.schema} vs ${exact.schema}")
    val e = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val a = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a.keySet == e.keySet)
    e.foreach { case (c, n) =>
      assert(math.abs(a(c) - n) <= math.max(1L, (n * 0.02).toLong),
        s"column $c: estimate ${a(c)} vs exact $n drifts past 2%")
    }
    // the sketch path must not plan the Expand-based exact multi-distinct
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL path still carries the Expand exchange")
  }

  test("merging daily sketches equals sketching the raw week (mergeability)") {
    val ev = Tables.events(spark, sf0001)
    val merged = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy(weekofyear(col("day")).as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy(weekofyear(to_date(col("ts"))).as("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      "union of daily sketches must estimate identically to one sketch over the raw week")
  }

  // --- Misra–Gries heavy hitters (`agg_heavy_hitters`) ---

  test("MG summary keeps every item over n/(k+1) under any partitioning; estimates under-count by at most n/(k+1)") {
    import spark.implicits._
    // sf0.01: 150 distinct users > k=128, so eviction genuinely runs,
    // and the densest users still clear the n/(k+1) threshold.
    val k = 128
    val items = Tables.events(spark, sf001)
      .select(col("user_id").cast("string").as("item"))
    val exact = items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val heavy = exact.filter { case (_, c) => c * (k + 1) > n }.keySet
    assert(heavy.nonEmpty && exact.size > k,
      s"fixture must exercise eviction: ${exact.size} items, ${heavy.size} heavy")
    for (parts <- Seq(1, 3, 17)) {
      val sk = items.repartition(parts).as[String]
        .select(new graft.functions.MisraGries(k).toColumn.name("sk")).head()
      assert(sk.n == n)
      assert(heavy.subsetOf(sk.counts.keySet),
        s"parts=$parts: summary must contain every heavy item")
      sk.counts.foreach { case (i, est) =>
        val t = exact(i)
        assert(est <= t && t - est <= n / (k + 1),
          s"parts=$parts item $i: estimate $est outside [true - n/(k+1), true] = [${t - n / (k + 1)}, $t]")
      }
    }
  }

  test("agg_heavy_hitters output is the exact HAVING answer regardless of partitioning") {
    val got = SparkEntry.queries("agg_heavy_hitters")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val items = Tables.events(spark, sf0001)
      .select(col("user_id").cast("string").as("item"))
    val exact = items.groupBy("item").count()
    val n = items.count()
    val want = exact.where(col("count") * 129 > n).orderBy("item")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == want)
  }

  test("agg_kmv_intersect: sketch membership equals set membership on the union bottom-k; estimates track exact") {
    val rows = SparkEntry.queries("agg_kmv_intersect")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 10, "5 event types should yield 10 unordered pairs")
    // driver-side ground truth per pair
    val byType = Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id").cast("string").as("item")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (ta, tb, nExact, c, u, inter) =>
      val (sa, sb) = (byType(ta), byType(tb))
      assert(nExact == (sa & sb).size.toLong, s"$ta/$tb exact intersection")
      // KMV union bottom-64 and sketch-membership count, recomputed from sets
      val hs = (sa | sb).toSeq.map(graft.functions.Kmv.hash60).distinct.sorted
      val l = hs.take(64)
      val ha = sa.map(graft.functions.Kmv.hash60)
      val hb = sb.map(graft.functions.Kmv.hash60)
      assert(c == l.count(h => ha(h) && hb(h)).toLong, s"$ta/$tb bottom-k common")
      // estimates: positive, and within the ~1/sqrt(k-2) KMV error regime
      // (generous 3-sigma style bound; exact when the union exhausts)
      val uExact = (sa | sb).size.toDouble
      assert(u > 0 && math.abs(u - uExact) / uExact < 0.5,
        s"$ta/$tb union est $u vs exact $uExact")
      assert(inter >= 0)
      if (nExact >= 30)
        assert(math.abs(inter - nExact) / nExact < 0.6,
          s"$ta/$tb inter est $inter vs exact $nExact")
    }
  }
}
