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
}
