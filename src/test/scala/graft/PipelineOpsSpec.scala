package graft

import org.apache.spark.sql.functions._

/** Invariants for the r2 pipeline additions: chunking geometry, sampling
  * determinism, batch/stream sessionization agreement, JSONL round-trip.
  * (Value-level correctness is oracle-checked by the driver; these pin the
  * semantic properties an oracle diff can't express.) */
class PipelineOpsSpec extends SparkSpec {

  test("llm_chunk_split covers every token: stride/window geometry holds per doc") {
    val chunks = SparkEntry.queries("llm_chunk_split")(spark, sf0001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"),
        sum(when(col("n_tokens") < 1 || col("n_tokens") > 40, 1).otherwise(0)).as("bad_size"))
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(filter(split(col("text"), " "), t => length(t) > 0)).as("ntok"))
      .where(col("ntok") > 0)
    val joined = chunks.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, maxIdx, bad, ntok) = (r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4))
      assert(bad == 0, s"doc ${r.getLong(0)}: chunk size outside [1,40]")
      assert(n == (ntok - 1) / 30 + 1, s"doc ${r.getLong(0)}: $n chunks for $ntok tokens")
      assert(maxIdx == n - 1)
      // every token index is inside some [idx*30, idx*30+40) window
      assert(maxIdx * 30 < ntok && maxIdx * 30 + 40 >= ntok)
    }
  }

  test("llm_sample_hash is deterministic and stratified (en kept at ~2x the rate of others)") {
    val q = SparkEntry.queries("llm_sample_hash")
    val a = q(spark, sf001).collect().map(_.getLong(0)).toSeq
    val b = q(spark, sf001).collect().map(_.getLong(0)).toSeq
    assert(a == b, "re-running the sample must select identical rows")
    val rates = q(spark, sf001)
      .groupBy(when(col("lang") === "en", "en").otherwise("other").as("stratum")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf001)
      .groupBy(when(col("lang") === "en", "en").otherwise("other").as("stratum")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = rates("en").toDouble / totals("en")
    val otherRate = rates("other").toDouble / totals("other")
    assert(math.abs(enRate - 0.5) < 0.15, s"en rate $enRate")
    assert(math.abs(otherRate - 0.25) < 0.15, s"other rate $otherRate")
  }

  test("win_session_batch agrees with stream_session on the session inventory") {
    val batch = SparkEntry.queries("win_session_batch")(spark, sf0001)
      .select("user_id", "session_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val stream = SparkEntry.queries("stream_session")(spark, sf0001)
      .select("user_id", "s_start", "n_events").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(batch == stream, "batch lag+cumsum sessions must equal session_window sessions")
  }

  test("join_bucketed joins without any exchange (bucketed scans satisfy distribution)") {
    // Force the non-broadcast path: at testdata scale the planner would
    // broadcast the small side, which trivially has no shuffle and would
    // prove nothing about bucketing.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      SparkEntry.queries("join_bucketed")(spark, sf0001).collect() // writes the bucketed tables
      val join = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val plan = join.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("agg_skew_salted equals the plain groupBy it spreads") {
    val salted = SparkEntry.queries("agg_skew_salted")(spark, sf001).collect()
    val plain = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"),
        round(min("value"), 4).as("min_value"), round(max("value"), 4).as("max_value"))
      .orderBy("event_type").collect()
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("scan_jsonl round-trips microsecond timestamps and full-precision doubles") {
    val got = SparkEntry.queries("scan_jsonl")(spark, sf0001).collect()
    val src = Tables.events(spark, sf0001).where(col("event_id") < 200)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("event_id").collect()
    assert(got.length == src.length && got.nonEmpty)
    got.zip(src).foreach { case (g, s) =>
      assert(g.getTimestamp(1) == s.getTimestamp(1), s"ts drift on event ${g.getLong(0)}")
      assert(g.getDouble(4) == s.getDouble(4))
    }
  }

  test("llm_ppl_bucket splits every language into near-equal head/middle/tail terciles") {
    val out = SparkEntry.queries("llm_ppl_bucket")(spark, sf0001).collect()
    assert(out.length == Tables.documents(spark, sf0001).count(),
      "every document gets exactly one bucket")
    val sizes = out.groupBy(r => (r.getString(1), r.getString(3)))
      .view.mapValues(_.length).toMap
    for ((lang, byBucket) <- sizes.groupBy(_._1._1)) {
      val counts = byBucket.values.toSeq
      assert(byBucket.keySet.map(_._2) == Set("head", "middle", "tail"),
        s"$lang: all three buckets present")
      assert(counts.max - counts.min <= 1, s"$lang: tercile sizes $counts not balanced")
    }
    // head really is the low-NLL (most fluent) end: per lang, every head
    // avg_nll <= every tail avg_nll
    for ((lang, rows) <- out.groupBy(_.getString(1))) {
      val headMax = rows.filter(_.getString(3) == "head").map(_.getDouble(2)).max
      val tailMin = rows.filter(_.getString(3) == "tail").map(_.getDouble(2)).min
      assert(headMax <= tailMin, s"$lang: head/tail NLL ranges overlap")
    }
  }

  test("llm_gopher_rules flags agree with a direct driver recomputation") {
    val out = SparkEntry.queries("llm_gopher_rules")(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    val stop8 = Set("the", "be", "to", "of", "and", "that", "have", "with")
    out.foreach { r =>
      val text = docs(r.getLong(0))
      val toks = text.split(" ").filter(_.nonEmpty)
      val lines = text.split("\n", -1)
      assert(r.getInt(1) == toks.length, s"doc ${r.getLong(0)}: n_words")
      assert(r.getInt(4) == toks.map(_.toLowerCase).toSet.intersect(stop8).size,
        s"doc ${r.getLong(0)}: n_stop")
      assert(r.getBoolean(5) == (toks.length >= 50 && toks.length <= 100000),
        s"doc ${r.getLong(0)}: f_words")
      val meanLen = toks.map(_.length).sum.toDouble / toks.length
      assert(r.getBoolean(6) == (meanLen >= 3.0 && meanLen <= 10.0),
        s"doc ${r.getLong(0)}: f_meanlen")
      val alpha = toks.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      assert(r.getBoolean(10) == (alpha.toDouble / toks.length >= 0.8),
        s"doc ${r.getLong(0)}: f_alpha")
      val ell = lines.count(l => l.endsWith("…") || l.endsWith("..."))
      assert(r.getBoolean(9) == (ell.toDouble / lines.length <= 0.3),
        s"doc ${r.getLong(0)}: f_ellipsis")
      // pass is exactly the conjunction of the seven flags
      val flags = (5 to 11).map(r.getBoolean)
      assert(r.getBoolean(12) == flags.forall(identity), s"doc ${r.getLong(0)}: pass")
    }
  }
}
