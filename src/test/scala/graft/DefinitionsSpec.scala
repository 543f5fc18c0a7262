package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{Definitions, Granularity}

/** Round-trip coverage for the declarative store-definition layer
  * (store/Definitions.scala): YAML parse → create → conformed write →
  * re-open from the persisted definition → schema + data equality, plus
  * the boundary failures (missing column, unknown type, conflicting
  * redefinition). */
class DefinitionsSpec extends SparkSpec {
  import spark.implicits._

  private val trendYaml =
    """data_source: hub
      |entity_type: node
      |granularity: 1h
      |trend_columns:
      |  - name: kpi_load
      |    data_type: double
      |  - name: n_samples
      |    data_type: bigint
      |  - name: region
      |    data_type: text
      |""".stripMargin

  test("trend definition parses from YAML and from its own JSON rendering") {
    val d = Definitions.parseTrendStore(trendYaml)
    assert(d.name == "hub-node-1h")
    assert(d.granularity == Granularity.Hour)
    assert(d.counters.map(_.name) == Seq("kpi_load", "n_samples", "region"))
    assert(d.schema == StructType(Seq(
      StructField("entity_id", LongType), StructField("ts", TimestampType),
      StructField("kpi_load", DoubleType), StructField("n_samples", LongType),
      StructField("region", StringType))))
    // canonical JSON rendering is itself a parseable definition (JSON ⊂ YAML)
    assert(Definitions.parseTrendStore(Definitions.renderTrendStore(d)) == d)
  }

  test("create → conform → upsert → reopen round-trips schema and data") {
    val d = Definitions.parseTrendStore(trendYaml)
    val root = tmpDir("def_store")
    val store = d.create(spark, root)
    // a raw package with extra columns and off-type values: conform must
    // drop the extras and cast to the declared types
    val raw = Seq(
      (7L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), "12.5", 3, "eu", "junk"),
      (8L, java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), "99.25", 4, "us", "junk"))
      .toDF("entity_id", "ts", "kpi_load", "n_samples", "region", "extra")
    store.upsert(d.conform(raw), d.granularity.name)

    val (d2, reopened) = Definitions.openTrendStore(spark, root)
    assert(d2 == d, "persisted definition must parse back to the original")
    val back = reopened.read(d.granularity.name)
    assert(back.schema("kpi_load").dataType == DoubleType)
    assert(back.schema("n_samples").dataType == LongType)
    val rows = back.select("entity_id", "kpi_load", "n_samples", "region")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(rows == Seq("7|12.5|3|eu", "8|99.25|4|us"), rows.toString)
  }

  test("boundary failures: missing column, unknown type, conflicting redefinition") {
    val d = Definitions.parseTrendStore(trendYaml)
    // missing declared counter in the package
    val broken = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 1.0))
      .toDF("entity_id", "ts", "kpi_load")
    val e1 = intercept[IllegalArgumentException](d.conform(broken))
    assert(e1.getMessage.contains("n_samples"), e1.getMessage)
    // unknown data_type fails at parse, naming the column
    val e2 = intercept[IllegalArgumentException](
      Definitions.parseTrendStore(trendYaml.replace("double", "varchar2")))
    assert(e2.getMessage.contains("kpi_load"), e2.getMessage)
    // unknown granularity rejected by the catalog
    intercept[IllegalArgumentException](
      Definitions.parseTrendStore(trendYaml.replace("granularity: 1h", "granularity: 5m")))
    // idempotent re-create is fine; a conflicting redefinition is not
    val root = tmpDir("def_conflict")
    d.create(spark, root)
    d.create(spark, root) // same definition — no-op
    val changed = d.copy(counters = d.counters.take(2))
    val e3 = intercept[IllegalArgumentException](changed.create(spark, root))
    assert(e3.getMessage.contains("migration"), e3.getMessage)
  }

  test("attribute definition parses, conforms, and feeds the store reads") {
    val yaml =
      """data_source: hub
        |entity_type: node
        |attributes:
        |  - name: vendor
        |    data_type: text
        |  - name: capacity
        |    data_type: integer
        |""".stripMargin
    val d = Definitions.parseAttributeStore(yaml)
    assert(d.name == "hub-node-attrs")
    val history = d.conform(Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "acme", "16", 9),
      (1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), "acme", "32", 9))
      .toDF("entity_id", "ts", "vendor", "capacity", "extra"))
    assert(history.schema("capacity").dataType == IntegerType)
    val curr = graft.store.AttributeStore.current(history).collect()
    assert(curr.length == 1 && curr.head.getInt(3) == 32)

    // create → append → reopen → read round-trip (mirror of the trend path)
    val root = tmpDir("def_attr_store")
    d.create(spark, root)
    d.create(spark, root) // idempotent
    d.append(spark, root, Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "acme", "16", 9),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), "globex", "64", 9))
      .toDF("entity_id", "ts", "vendor", "capacity", "extra"))
    val d2 = graft.store.Definitions.openAttributeStore(spark, root)
    assert(d2 == d, "persisted attribute definition must parse back")
    val back = d2.readHistory(spark, root)
    assert(back.schema("capacity").dataType == IntegerType)
    assert(back.count() == 2)
    val e = intercept[IllegalArgumentException](
      d.copy(attributes = d.attributes.take(1)).create(spark, root))
    assert(e.getMessage.contains("migration"), e.getMessage)
  }

  private val triggerYaml =
    """name: node_alarms
      |granularity: 1h
      |thresholds:
      |  - {name: load_high,  kpi: kpi_load,  op: ">",  value: 100.0, severity: major}
      |  - {name: load_floor, kpi: kpi_load,  op: "<=", value: 10.0,  severity: minor}
      |""".stripMargin

  test("trigger definition parses, compiles to rules, and round-trips its rendering") {
    val d = Definitions.parseTrigger(triggerYaml)
    assert(d.name == "node_alarms" && d.granularity == Granularity.Hour)
    assert(d.thresholds.map(_.name) == Seq("load_high", "load_floor"))
    assert(Definitions.parseTrigger(Definitions.renderTrigger(d)) == d)

    // the compiled rules fire exactly where the document says
    val kpis = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 150.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 50.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 10.0))
      .toDF("entity_id", "ts", "kpi_load")
    val fired = d.evaluate(kpis).select("entity_id", "rule", "severity", "value")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(fired == Seq("1|load_high|major|150.0", "3|load_floor|minor|10.0"), fired)

    // persist → reopen; conflicting redefinition rejected
    val root = tmpDir("def_trigger")
    d.create(spark, root)
    d.create(spark, root) // idempotent
    assert(Definitions.openTrigger(spark, root) == d)
    val e = intercept[IllegalArgumentException](
      d.copy(thresholds = d.thresholds.take(1)).create(spark, root))
    assert(e.getMessage.contains("migration"), e.getMessage)
  }

  test("trigger definition rejects open-ended condition language") {
    // op outside the closed comparator set — config, not code
    val e = intercept[IllegalArgumentException](Definitions.parseTrigger(
      triggerYaml.replace("op: \">\", ", "op: \"rlike\",")))
    assert(e.getMessage.contains("unknown op"), e.getMessage)
    // non-numeric threshold value
    intercept[IllegalArgumentException](Definitions.parseTrigger(
      triggerYaml.replace("100.0", "high")))
    // duplicate threshold names
    intercept[IllegalArgumentException](Definitions.parseTrigger(
      triggerYaml.replace("load_floor", "load_high")))
  }

  private val aggYaml =
    """name: hourly_user_load
      |entity: user_id
      |granularity: 1h
      |measures:
      |  - {name: sum_value, column: value, function: sum}
      |  - {name: samples,   column: value, function: count}
      |""".stripMargin

  test("aggregation definition parses, round-trips its rendering, and compiles the rollup") {
    import org.apache.spark.sql.functions._
    val d = Definitions.parseAggregation(aggYaml)
    assert(d.name == "hourly_user_load" && d.entity == "user_id")
    assert(d.granularity == graft.store.Granularity.Hour)
    assert(Definitions.parseAggregation(Definitions.renderAggregation(d)) == d)
    // compiled rollup ≡ the hand-written plan on the fixture
    val got = d.compile(Tables.events(spark, sf0001))
      .orderBy("entity_id", "ts").collect().map(_.toString)
    val expect = Tables.events(spark, sf0001)
      .groupBy(col("user_id").as("entity_id"),
        date_trunc("hour", col("ts")).as("ts"))
      // µ-unit-quantized sum, MeasureDef's determinism discipline (r8)
      .agg(round(sum(floor(col("value") * 1e6).cast("long")) / 1e6, 4).as("sum_value"),
        count(col("value")).as("samples"))
      .orderBy("entity_id", "ts").collect().map(_.toString)
    assert(got.sameElements(expect))
  }

  test("aggregation definition rejects unknown functions and duplicate measures") {
    intercept[IllegalArgumentException](Definitions.parseAggregation(
      aggYaml.replace("function: sum", "function: exec")))
    intercept[IllegalArgumentException](Definitions.parseAggregation(
      aggYaml.replace("name: samples", "name: sum_value")))
    intercept[IllegalArgumentException](Definitions.parseAggregation(
      aggYaml.replace("granularity: 1h", "granularity: 5s")))
  }
}
