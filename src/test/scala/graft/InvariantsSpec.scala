package graft

import org.apache.spark.sql.functions._

/** Semantic invariants that encode the reference's aggregation contracts
  * (SURVEY.md §5.3): conservation under time/entity rollup, as-of
  * equivalence to brute force, dedup idempotence, and associativity of the
  * weighted-average UDAF merge. Property-style tests use a seeded
  * generator (100 random cases each) for reproducibility. */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("time rollup conserves: sum of 15-min buckets equals 1-h buckets") {
    val ev = Tables.events(spark, sf0001)
    val q = ev.groupBy(date_trunc("hour", col("ts")).as("h"),
        window(col("ts"), "15 minutes").as("w"))
      .agg(sum("value").as("s"))
      .groupBy("h").agg(sum("s").as("from_quarters"))
    val h = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(sum("value").as("direct"))
    val joined = q.join(h, "h")
      .select(abs(col("from_quarters") - col("direct")).as("diff"))
      .agg(max("diff")).as[Double].head()
    assert(joined < 1e-6, s"conservation violated by $joined")
  }

  test("entity rollup conserves: nation totals sum to region totals") {
    val base = Tables.orders(spark, sf0001)
      .join(broadcast(Tables.customer(spark, sf0001)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sf0001)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sf0001)), col("n_regionkey") === col("r_regionkey"))
    val byNation = base.groupBy("r_name", "n_name").agg(sum("o_totalprice").as("t"))
      .groupBy("r_name").agg(sum("t").as("from_nations"))
    val byRegion = base.groupBy("r_name").agg(sum("o_totalprice").as("direct"))
    val maxDiff = byNation.join(byRegion, "r_name")
      .select(abs(col("from_nations") - col("direct")).as("d"))
      .agg(max("d")).as[Double].head()
    assert(maxDiff < 1e-6)
  }

  test("as-of join equals brute-force max(ts <= t) lookup") {
    val asof = SparkEntry.queries("join_asof")(spark, sf0001)
    // brute force: conditional join + argmax
    val o = Tables.orders(spark, sf0001).select(
      col("o_orderkey"),
      pmod(col("o_custkey"), lit(150)).cast("long").as("uid"),
      expr("TIMESTAMP '2024-01-01' + make_interval(0, 0, 0, CAST(o_orderkey % 30 AS INT), CAST(o_custkey % 24 AS INT), 0, 0)").as("ats"))
    val e = Tables.events(spark, sf0001).select(col("user_id"), col("ts"), col("event_id"))
    val brute = o.join(e, col("user_id") === col("uid") && col("ts") <= col("ats"), "left")
      .groupBy("o_orderkey")
      .agg(max(struct(col("ts"), col("event_id"))).getField("event_id").as("brute_event_id"))
    val diff = asof.join(brute, "o_orderkey")
      .where(!(col("asof_event_id") <=> col("brute_event_id")))
      .count()
    assert(diff == 0L)
  }

  test("exact dedup is idempotent") {
    val docs = Tables.documents(spark, sf0001)
    val keep = SparkEntry.queries("llm_dedup_exact")(spark, sf0001).select("keep_id")
    val once = docs.join(keep, col("doc_id") === col("keep_id")).drop("keep_id")
    // dedup of the deduped set keeps every row
    val twice = once.groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    assert(twice.where(col("n") > 1).count() == 0L)
    assert(twice.count() == once.count())
  }

  test("weighted-average merge is associative and order-insensitive") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val xs = List.fill(1 + rnd.nextInt(50))(
        (rnd.nextDouble() * 2e4 - 1e4, 0.1 + rnd.nextDouble() * 100.0))
      val direct = {
        val (num, den) = xs.foldLeft((0.0, 0.0)) { case ((n, dn), (v, w)) => (n + v * w, dn + w) }
        num / den
      }
      // arbitrary split + merge through the Aggregator's own operations
      val (l, r) = xs.splitAt(rnd.nextInt(xs.size + 1))
      def fold(part: List[(Double, Double)]) =
        part.foldLeft(graft.functions.WeightedAvg.zero)((b, x) => graft.functions.WeightedAvg.reduce(b, x))
      val merged = graft.functions.WeightedAvg.finish(
        graft.functions.WeightedAvg.merge(fold(l), fold(r)))
      assert(math.abs(merged - direct) <= 1e-9 * math.max(1.0, math.abs(direct)))
    }
  }

  test("set algebra: (A except B) union (A intersect B) == A for key sets") {
    val a = Tables.part(spark, sf0001).select("p_partkey")
    val b = Tables.lineitem(spark, sf0001).select(col("l_partkey").as("p_partkey"))
    val rebuilt = a.except(b).unionByName(a.intersect(b)).distinct()
    assert(rebuilt.count() == a.distinct().count())
    assert(rebuilt.except(a).count() == 0L)
  }
}
