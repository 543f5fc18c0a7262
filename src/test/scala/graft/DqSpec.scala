package graft

import org.apache.spark.sql.functions._

/** Rule-table-driven DQ checks (ops.DqRules): the compiled rule-table
  * route must agree with the fixed-plan twin, reject bad rule tables
  * loudly, and keep the single-scan plan shape. */
class DqSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, sf0001)

  test("rule-table route ≡ hard-coded agg_dq_checks on the shared rules") {
    // agg_dq_checks rules 1-2 are its row-level rules; the rule-table key
    // declares the same two (same ids, labels, bounds)
    val fixed = SparkEntry.queries("agg_dq_checks")(spark, sf0001)
      .where(col("rule_id") <= 2).collect().toSeq
    val tabled = SparkEntry.queries("agg_dq_rules")(spark, sf0001)
      .where(col("rule_id") <= 2).collect().toSeq
    assert(tabled == fixed, s"rule-table route diverged:\n$tabled\nvs fixed:\n$fixed")
  }

  test("each rule kind counts what it should, with non-null-only semantics") {
    val df = Seq[(Integer, java.lang.Double)](
      (0, 5.0), (2, null), (3, -1.0), (4, 1500.0), (5, 0.0), (null, 2.0)
    ).toDF("k", "v")
    val rules = Seq(
      (1, "v non-null", "v", "not_null", 0.0, 0.0),
      (2, "v in [0,1000]", "v", "range", 0.0, 1000.0),
      (3, "v at least 0", "v", "min", 0.0, 0.0),
      (4, "v at most 1000", "v", "max", 0.0, 1000.0),
      (5, "k positive", "k", "positive", 0.0, 0.0),
    ).toDF("rule_id", "rule", "column", "kind", "lo", "hi")
    val got = graft.ops.DqRules.check(df, rules)
      .select("rule_id", "violations", "pass").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1) == (1L, 0)) // one null v
    assert(got(2) == (2L, 0)) // -1 and 1500; null NOT counted
    assert(got(3) == (1L, 0)) // -1
    assert(got(4) == (1L, 0)) // 1500
    assert(got(5) == (1L, 0)) // k=0 is not positive; null k NOT counted
  }

  test("matches and in_set kinds count pattern/domain violations, nulls excluded") {
    val df = Seq[(String, String)](
      ("AB-12", "red"), ("XY-99", "blue"), ("bad", "mauve"), (null, null)
    ).toDF("code", "color")
    val rules = Seq(
      (1, "code format", "code", "matches", 0.0, 0.0, "[A-Z]{2}-[0-9]{2}"),
      (2, "color domain", "color", "in_set", 0.0, 0.0, "red|green|blue"),
    ).toDF("rule_id", "rule", "column", "kind", "lo", "hi", "arg")
    val got = graft.ops.DqRules.check(df, rules)
      .select("rule_id", "violations").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(1) == 1L) // "bad"; null NOT counted
    assert(got(2) == 1L) // "mauve"; null NOT counted
  }

  test("all-pass rules report zero violations and pass=1") {
    val df = Seq((1, 1.0), (2, 2.0)).toDF("k", "v")
    val rules = Seq((1, "v non-null", "v", "not_null", 0.0, 0.0))
      .toDF("rule_id", "rule", "column", "kind", "lo", "hi")
    val r = graft.ops.DqRules.check(df, rules).collect().head
    assert(r.getLong(2) == 0L && r.getInt(3) == 1)
  }

  test("unknown kinds and duplicate rule ids are rejected loudly") {
    val df = Seq((1, 1.0)).toDF("k", "v")
    val bad = Seq((1, "r", "v", "frobnicate", 0.0, 0.0))
      .toDF("rule_id", "rule", "column", "kind", "lo", "hi")
    intercept[IllegalArgumentException] { graft.ops.DqRules.check(df, bad) }
    val dup = Seq((1, "a", "v", "not_null", 0.0, 0.0), (1, "b", "v", "not_null", 0.0, 0.0))
      .toDF("rule_id", "rule", "column", "kind", "lo", "hi")
    intercept[IllegalArgumentException] { graft.ops.DqRules.check(df, dup) }
  }

  test("rules with quotes in labels survive the stack compilation") {
    val df = Seq((1, 1.0)).toDF("k", "v")
    val rules = Seq((1, "v isn't null", "v", "not_null", 0.0, 0.0))
      .toDF("rule_id", "rule", "column", "kind", "lo", "hi")
    assert(graft.ops.DqRules.check(df, rules).collect().head.getString(1) == "v isn't null")
  }

  test("agg_dq_rules compiles to ONE aggregate scan of events") {
    val p = SparkEntry.queries("agg_dq_rules")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"rule compilation must scan events exactly once:\n$p")
  }
}
