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

  test("upsert is idempotent and key-unique for any batch split") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id").as("k"), col("value").as("v"))
    val batch = ev.where(col("event_id") % 3 === 0)
      .withColumn("v", col("v") * 2)
      .unionByName(ev.where(col("event_id") % 7 === 0)
        .withColumn("k", col("k") + 1000000L))
    def merge(b: org.apache.spark.sql.DataFrame, x: org.apache.spark.sql.DataFrame) =
      graft.ops.Upsert.lastWriterWins(b, x, Seq("k"))

    val once = merge(ev, batch)
    // one row per key, and re-applying the same batch changes nothing
    assert(once.groupBy("k").count().where(col("count") > 1).isEmpty)
    assert(merge(once, batch).collect().toSet == once.collect().toSet)
    // applying the batch in two arbitrary pieces equals one application
    // (batch pieces are key-disjoint here, as in a partitioned ingest)
    val split = merge(merge(ev, batch.where(col("k") % 2 === 0)),
      batch.where(col("k") % 2 =!= 0))
    assert(split.collect().toSet == once.collect().toSet)
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

  test("sequence packing conserves tokens: batch sums equal per-source totals") {
    val batches = SparkEntry.queries("llm_pack_batches")(spark, sf0001)
    val fromBatches = batches.groupBy("source")
      .agg(sum("n_tokens").as("t"), sum("n_docs").as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Tables.documents(spark, sf0001)
      .select(col("source"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("t"), count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromBatches == direct, "packing must neither drop nor duplicate docs/tokens")
    // every batch except a source's last must hold > 0 docs and batches are
    // dense from 0 (concatenate-and-chunk leaves no empty windows behind)
    val perSource = batches.select("source", "batch").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    perSource.foreach { case (src, ids) =>
      assert(ids.head == 0L && ids.toSeq == (ids.head to ids.last).toSeq,
        s"sparse batches for $src")
    }
  }

  test("decontamination never reports eval-bucket docs and flags consistently") {
    val out = SparkEntry.queries("llm_decontaminate")(spark, sf0001).collect()
    val evalIds = Tables.documents(spark, sf0001)
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") < 3277L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !evalIds.contains(r.getLong(0))),
      "eval docs must not appear as corpus rows")
    out.foreach { r =>
      val (nSh, nHits, flagged) = (r.getLong(1), r.getLong(2), r.getInt(4))
      assert(nHits <= nSh)
      assert((flagged == 1) == (nHits > 0))
    }
  }

  test("resample grid is dense per user and carry-forward only fills gaps") {
    val rs = SparkEntry.queries("win_resample")(spark, sf0001).collect()
    val byUser = rs.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val hours = rows.map(_.getTimestamp(1).getTime).sorted
      // dense hourly grid: consecutive timestamps are exactly 1h apart
      hours.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 3600000L, s"user $u grid hole between $a and $b")
      case _ => ()
      }
      // where an observation exists the filled value IS the observation
      rows.foreach { r =>
        if (!r.isNullAt(2)) assert(r.getDouble(3) == r.getDouble(2), s"user $u")
      }
      // first grid row is an observed hour, so filled is never null
      assert(rows.forall(r => !r.isNullAt(3)), s"user $u has unfilled rows")
    }
  }

  test("bm25 scores match a driver-side reference computation") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val q = Seq("hash", "join", "vector")
    val dl = docs.map { case (id, t) => id -> t.length }
    val n = dl.size.toLong
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    def score(id: Long): Double = q.map { t =>
      val tf = docs(id).count(_ == t).toDouble
      if (tf == 0) 0.0
      else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
    }.sum
    val got = SparkEntry.queries("llm_bm25_search")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (id, bm25, nTerms) =>
      assert(nTerms == q.count(docs(id).contains(_)), s"doc $id matched-term count")
      assert(math.abs(bm25 - score(id)) < 1e-3, s"doc $id: $bm25 vs ${score(id)}")
    }
    // every doc containing a query term is present — no silent top-k cap
    assert(got.length == docs.count { case (_, t) => q.exists(t.contains(_)) })
  }

  test("set algebra: (A except B) union (A intersect B) == A for key sets") {
    val a = Tables.part(spark, sf0001).select("p_partkey")
    val b = Tables.lineitem(spark, sf0001).select(col("l_partkey").as("p_partkey"))
    val rebuilt = a.except(b).unionByName(a.intersect(b)).distinct()
    assert(rebuilt.count() == a.distinct().count())
    assert(rebuilt.except(a).count() == 0L)
  }
}
