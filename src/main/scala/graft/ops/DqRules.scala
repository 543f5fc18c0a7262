package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-TABLE-driven data-quality checks: expectations arrive as ROWS
  * (config-as-data — the declarative check surface every DQ system exposes,
  * where rules live in a table an operator edits without redeploying code),
  * and the engine compiles them into ONE conditional-sum aggregate over the
  * data: a single scan, a single partial-agg exchange carrying one long per
  * rule, `stack()` back to one result row per rule. Violations never leave
  * the executors as rows — only counts do — so the plan's cost is the scan,
  * independent of how many rules are checked or how many rows violate.
  *
  * The rules table is collected driver-side before planning. That is the
  * config-metadata collect pattern (rule-count-sized, never data-sized):
  * Spark plans are static, so data-driven plan GENERATION necessarily reads
  * the config at plan time. At 100 TB the rules table is still a few rows.
  *
  * Row-level rule kinds (each compiles to one conditional sum):
  *  - `not_null`  — count rows where `column` IS NULL
  *  - `range`     — count non-null rows outside [lo, hi]
  *  - `min`       — count non-null rows under lo
  *  - `max`       — count non-null rows over hi
  *  - `positive`  — count non-null rows ≤ 0
  *  - `matches`   — count non-null rows NOT fully matching regex `arg`
  *  - `in_set`    — count non-null rows outside the |-separated `arg` set
  * Null semantics: every kind but `not_null` counts only NON-NULL
  * violations — null-ness is its own `not_null` rule, so one bad row can
  * violate both, and the counts stay independently meaningful.
  *
  * Table-level checks (uniqueness, referential integrity, calendar gaps)
  * need their own aggregation shape and stay in the fixed-plan twin
  * (`agg_dq_checks`); this compiler rejects unknown kinds loudly rather
  * than silently skipping a rule.
  */
object DqRules {

  case class Rule(ruleId: Int, rule: String, column: String, kind: String,
                  lo: Double, hi: Double, arg: String = "")

  /** Compiles `rules` rows into the single-aggregate check plan over
    * `data`. Output: (rule_id, rule, violations, pass) ordered by rule_id,
    * one row per rule — same contract as `agg_dq_checks`. */
  def check(data: DataFrame, rules: DataFrame): DataFrame = {
    val hasArg = rules.columns.contains("arg")
    val cols = Seq("rule_id", "rule", "column", "kind", "lo", "hi") ++
      (if (hasArg) Seq("arg") else Nil)
    val rs = rules.select(cols.head, cols.tail: _*)
      .collect()
      .map(r => Rule(r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5), if (hasArg) r.getString(6) else ""))
      .sortBy(_.ruleId)
    require(rs.nonEmpty, "empty rules table")
    require(rs.map(_.ruleId).distinct.length == rs.length,
      s"duplicate rule_id in rules table: ${rs.map(_.ruleId).mkString(",")}")

    def violation(r: Rule): Column = {
      val c = col(r.column)
      r.kind match {
        case "not_null" => c.isNull.cast("long")
        case "range"    => (c < r.lo || c > r.hi).cast("long")
        case "min"      => (c < r.lo).cast("long")
        case "max"      => (c > r.hi).cast("long")
        case "positive" => (c <= 0.0).cast("long")
        case "matches"  => (!c.rlike("^(?:" + r.arg + ")$")).cast("long")
        case "in_set"   => (!c.isin(r.arg.split('|').toSeq: _*)).cast("long")
        case other => throw new IllegalArgumentException(
          s"unknown DQ rule kind '$other' (rule_id=${r.ruleId})")
      }
    }
    // one aggregate = one scan; coalesce keeps an all-null column (sum of
    // an empty/never-true condition set) at 0 violations, matching the
    // oracle's CASE-WHEN-ELSE-0 arithmetic
    val sums = rs.map(r => coalesce(sum(violation(r)), lit(0L)).as(s"__m_${r.ruleId}"))
    val agged = data.agg(sums.head, sums.tail: _*)
    val stackArgs = rs.map(r =>
      s"${r.ruleId}, '${r.rule.replace("'", "''")}', __m_${r.ruleId}").mkString(", ")
    agged
      .select(expr(s"stack(${rs.length}, $stackArgs) AS (rule_id, rule, violations)"))
      .withColumn("pass", (col("violations") === 0L).cast("int"))
      .orderBy("rule_id")
  }
}
