package graft

import org.apache.spark.sql.functions._

import graft.directory.Relations
import graft.store.Granularity

/** Relation directory refresh/compose semantics and the granularity
  * rollup graph. */
class DirectorySpec extends SparkSpec {
  import spark.implicits._

  test("relation refresh materializes the rule; compose chains hierarchies") {
    val root = tmpDir("relations")
    val custNation = Relations.refresh(spark, root, "customer_nation") {
      Tables.customer(spark, sf0001)
        .select(col("c_custkey").as("source_id"), col("c_nationkey").cast("long").as("target_id"))
    }
    val nationRegion = Relations.refresh(spark, root, "nation_region") {
      Tables.nation(spark, sf0001)
        .select(col("n_nationkey").cast("long").as("source_id"), col("n_regionkey").cast("long").as("target_id"))
    }
    assert(Relations.isFunctional(custNation) && Relations.isFunctional(nationRegion))

    val custRegion = Relations.compose(custNation, nationRegion)
    assert(Relations.isFunctional(custRegion))
    assert(custRegion.select("source_id").distinct().count() ==
      Tables.customer(spark, sf0001).count())
    assert(custRegion.select("target_id").distinct().count() <= 5)

    // reload round-trips
    val back = Relations.load(spark, root, "customer_nation")
    assert(back.collect().toSet == custNation.collect().toSet)
  }

  test("incremental refresh re-evaluates the rule only when the source changed") {
    val root = tmpDir("relations_inc")
    var ruleRuns = 0
    def rule(src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      ruleRuns += 1
      src.select(col("c_custkey").as("source_id"), col("c_nationkey").cast("long").as("target_id"))
    }
    val cust = Tables.customer(spark, sf0001)

    val first = Relations.refreshIncremental(spark, root, "cn")(cust)(rule)
    assert(first.refreshed && ruleRuns == 1)
    val firstRows = first.relation.collect().toSet

    // same source: fingerprint matches, rule skipped, same relation served
    val second = Relations.refreshIncremental(spark, root, "cn")(cust)(rule)
    assert(!second.refreshed && ruleRuns == 1)
    assert(second.relation.collect().toSet == firstRows)

    // changed source (one row dropped): rule re-runs, result reflects it
    val third = Relations.refreshIncremental(spark, root, "cn")(
      cust.where(col("c_custkey") =!= 1L))(rule)
    assert(third.refreshed && ruleRuns == 2)
    assert(third.relation.count() == firstRows.size - 1)
  }

  test("fingerprint detects even-multiplicity changes (the xor blind spot)") {
    val root = tmpDir("relations_mult")
    var runs = 0
    def rule(src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      runs += 1; src
    }
    // both copies of a duplicated row change together: count is unchanged
    // and the pair's xxhash64 xor cancels to the same value — only the
    // multiset-sensitive hash sum can tell these sources apart
    val a = Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("source_id", "target_id")
    val b = Seq((1L, 11L), (1L, 11L), (2L, 20L)).toDF("source_id", "target_id")
    val r1 = Relations.refreshIncremental(spark, root, "m")(a)(rule)
    assert(r1.refreshed && runs == 1)
    val r2 = Relations.refreshIncremental(spark, root, "m")(b)(rule)
    assert(r2.refreshed && runs == 2, "pairwise change must invalidate the fingerprint")
    assert(r2.relation.where(col("target_id") === 11L).count() == 1)
  }

  test("granularity catalog: buckets and the valid rollup graph") {
    import Granularity._
    assert(Granularity("1h") == Hour)
    intercept[IllegalArgumentException](Granularity("5m"))
    assert(canRollupTo(QuarterHour, Month))
    assert(canRollupTo(Day, Week) && canRollupTo(Day, Month))
    assert(!canRollupTo(Week, Month), "weeks straddle month boundaries")
    assert(!canRollupTo(Month, Day), "never roll down")

    val df = Seq("2024-03-06 10:22:33").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val got = df.select(
      QuarterHour.bucket(col("ts")).cast("string"),
      Hour.bucket(col("ts")).cast("string"),
      Week.bucket(col("ts")).cast("string"),
      Month.bucket(col("ts")).cast("string")).collect().head
    assert(got.getString(0) == "2024-03-06 10:15:00")
    assert(got.getString(1) == "2024-03-06 10:00:00")
    assert(got.getString(2) == "2024-03-04 00:00:00") // Monday
    assert(got.getString(3) == "2024-03-01 00:00:00")
  }

  test("granularity-typed trend rollup conserves and guards invalid edges") {
    val store = new graft.store.TrendStore(spark, tmpDir("ts_gran"), Seq("kpi_load"))
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id").as("entity_id"), col("ts"), col("value").as("kpi_load"))
    val q = store.aggregateTime(rows, Granularity.QuarterHour, Granularity.Hour)
    val direct = store.aggregateTime(rows, "hour")
    val a = q.agg(sum("kpi_load")).as[Double].head()
    val b = direct.agg(sum("kpi_load")).as[Double].head()
    assert(math.abs(a - b) < 1e-6)
    intercept[IllegalArgumentException] {
      store.aggregateTime(rows, Granularity.Week, Granularity.Month)
    }
  }
}
