package graft.store

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Declarative store definitions — the reference's config-as-schema
  * identity: a trend/attribute store is CREATED from a small YAML/JSON
  * definition document (data source, entity type, granularity, typed
  * counter/attribute list), not from code. This module parses those
  * documents, materializes the matching [[TrendStore]]/[[AttributeStore]]
  * layout, persists the definition beside the data, and re-opens a store
  * from what is on disk — so a store's schema travels with the store, and
  * a misdeclared data package fails loudly at the boundary instead of
  * corrupting the relation.
  *
  * Everything here is driver-side metadata work (a definition document is
  * a few KB; the persisted copy is one small file beside the day
  * partitions): nothing scales with data volume, which is exactly why the
  * reference can afford schema-directed ETL at warehouse scale.
  *
  * Parsing rides the Jackson core that Spark itself ships (plus its YAML
  * dataformat) — no new dependency; both document flavors produce the
  * same tree.
  */
object Definitions {

  /** A typed counter/attribute column. `dataType` uses the reference's
    * SQL-ish names; [[sparkType]] is the Spark mapping. */
  final case class ColumnDef(name: String, dataType: String) {
    def sparkType: DataType = typeMap.getOrElse(dataType.toLowerCase,
      throw new IllegalArgumentException(
        s"column '$name': unknown data_type '$dataType' " +
          s"(known: ${typeMap.keys.toSeq.sorted.mkString(", ")})"))
  }

  /** Reference data_type name → Spark type. `numeric` maps to double, not
    * Decimal: trend counters are measurements, and the reference's own
    * processing treats them as floating point (exact-decimal money-style
    * columns would declare an explicit precision — none do). */
  private val typeMap: Map[String, DataType] = Map(
    "smallint" -> ShortType, "integer" -> IntegerType, "bigint" -> LongType,
    "real" -> FloatType, "double" -> DoubleType, "double precision" -> DoubleType,
    "numeric" -> DoubleType, "text" -> StringType, "boolean" -> BooleanType,
    "timestamp" -> TimestampType)

  /** A trend-store definition: one store per (data_source, entity_type),
    * counters stored at `granularity` (a [[Granularity]] catalog name). */
  final case class TrendStoreDef(
      dataSource: String,
      entityType: String,
      granularity: Granularity,
      counters: Seq[ColumnDef]) {

    def name: String = s"$dataSource-$entityType-${granularity.name}"

    /** The full on-disk row schema of a conformed data package. */
    def schema: StructType = StructType(
      StructField("entity_id", LongType) +: StructField("ts", TimestampType) +:
        counters.map(c => StructField(c.name, c.sparkType)))

    /** Cast a raw data package to the declared column set and types — the
      * schema-directed half of ingest. Extra columns are dropped; missing
      * ones are an error (a package that doesn't carry a declared counter
      * is a broken feed, not a schema evolution). Pure projection: no
      * shuffle, fully codegen'd, and the casts run where the data lives. */
    def conform(df: DataFrame): DataFrame = {
      val missing = ("entity_id" +: "ts" +: counters.map(_.name))
        .filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"data package for $name missing declared columns: ${missing.mkString(", ")}")
      df.select(
        col("entity_id").cast(LongType) +: col("ts").cast(TimestampType) +:
          counters.map(c => col(c.name).cast(c.sparkType)): _*)
    }

    /** Materialize the store layout under `rootDir` and persist this
      * definition beside the data (the store becomes self-describing).
      * Idempotent: re-creating over an existing identical definition is a
      * no-op; a CONFLICTING definition fails — schema changes must be
      * explicit migrations, never silent redefinitions. */
    def create(spark: SparkSession, rootDir: String): TrendStore = {
      existingDefinition(spark, rootDir).foreach { prior =>
        require(parseTrendStore(prior) == this,
          s"store at $rootDir already defined with a different schema; " +
            "redefinition must be an explicit migration")
      }
      writeDefinition(spark, rootDir, renderTrendStore(this))
      new TrendStore(spark, rootDir, counters.map(_.name))
    }
  }

  /** An attribute-store definition: per-entity slowly-changing attributes
    * (history rows keyed entity_id, ts). */
  final case class AttributeStoreDef(
      dataSource: String,
      entityType: String,
      attributes: Seq[ColumnDef]) {

    def name: String = s"$dataSource-$entityType-attrs"

    def schema: StructType = StructType(
      StructField("entity_id", LongType) +: StructField("ts", TimestampType) +:
        attributes.map(a => StructField(a.name, a.sparkType)))

    /** Same boundary contract as [[TrendStoreDef.conform]]. */
    def conform(df: DataFrame): DataFrame = {
      val missing = ("entity_id" +: "ts" +: attributes.map(_.name))
        .filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"attribute package for $name missing declared columns: ${missing.mkString(", ")}")
      df.select(
        col("entity_id").cast(LongType) +: col("ts").cast(TimestampType) +:
          attributes.map(a => col(a.name).cast(a.sparkType)): _*)
    }

    /** Materialize the attribute-store layout under `rootDir` (history
      * rows live in `rootDir/history`) and persist this definition beside
      * it — same idempotent/conflict-rejecting contract as
      * [[TrendStoreDef.create]]. */
    def create(spark: SparkSession, rootDir: String): Unit = {
      existingDefinition(spark, rootDir).foreach { prior =>
        require(parseAttributeStore(prior) == this,
          s"attribute store at $rootDir already defined with a different schema; " +
            "redefinition must be an explicit migration")
      }
      writeDefinition(spark, rootDir, renderAttributeStore(this))
    }

    def historyDir(rootDir: String): String = s"$rootDir/history"

    /** Append a conformed history package. History is append-only by
      * design (SCD compaction is an explicit [[AttributeStore.compact]]
      * rewrite, never an implicit merge). */
    def append(spark: SparkSession, rootDir: String, batch: DataFrame): Unit =
      conform(batch).write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(historyDir(rootDir))

    /** Read the history with the DECLARED schema asserted — feeds
      * [[AttributeStore.current]]/[[AttributeStore.at]] etc. */
    def readHistory(spark: SparkSession, rootDir: String): DataFrame = {
      val df = spark.read.parquet(historyDir(rootDir))
      val missing = ("entity_id" +: "ts" +: attributes.map(_.name))
        .filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"attribute store corrupt, missing: ${missing.mkString(", ")}")
      df
    }
  }

  /** One threshold rule in a trigger definition. `op` comes from the
    * closed comparator set below: a definition document is CONFIG, not
    * code, so the condition language is deliberately total — nothing a
    * document can say turns into arbitrary expression evaluation, and
    * every legal document has a trivially derivable SQL twin (which is
    * what lets a definition-driven trigger stay oracle-checkable). */
  final case class ThresholdDef(name: String, kpi: String, op: String,
      value: Double, severity: String) {
    require(comparators.contains(op),
      s"threshold '$name': unknown op '$op' " +
        s"(known: ${comparators.keys.toSeq.sorted.mkString(" ")})")

    /** Compile to the runtime rule the evaluation engine runs. */
    def toRule: Triggers.Rule =
      Triggers.Rule(name, kpi, severity)(c => comparators(op)(c, value))
  }

  private val comparators: Map[String, (Column, Double) => Column] = Map(
    ">" -> (_ > _), ">=" -> (_ >= _), "<" -> (_ < _), "<=" -> (_ <= _))

  /** A trigger definition: a named rule set evaluated over KPI rows at a
    * declared granularity — the reference's trigger configs (thresholds +
    * severities as documents, not code) in the same config-as-schema
    * layer as the store definitions. */
  final case class TriggerDef(name: String, granularity: Granularity,
      thresholds: Seq[ThresholdDef]) {

    /** The compiled rule set for [[Triggers.evaluate]] /
      * [[Triggers.evaluateWithCooldown]]. */
    def rules: Seq[Triggers.Rule] = thresholds.map(_.toRule)

    /** Evaluate this definition over a KPI frame (entity_id, ts, kpi
      * columns at this definition's granularity). Pure delegation — the
      * definition layer adds no execution machinery of its own. */
    def evaluate(kpis: DataFrame): DataFrame = Triggers.evaluate(kpis, rules)

    /** Persist beside the notification store — same idempotent /
      * conflict-rejecting contract as the store definitions. */
    def create(spark: SparkSession, rootDir: String): Unit = {
      existingDefinition(spark, rootDir).foreach { prior =>
        require(parseTrigger(prior) == this,
          s"trigger at $rootDir already defined with different rules; " +
            "redefinition must be an explicit migration")
      }
      writeDefinition(spark, rootDir, renderTrigger(this))
    }
  }

  /** One declared measure of an aggregation definition. `function` is a
    * CLOSED set — the reference's re-aggregation functions (sum / avg /
    * min / max / count): config stays config, never an expression
    * language, so every legal document has a derivable SQL twin and
    * nothing injectable ever reaches the plan. sum/avg quantize the
    * measure to exact µ-unit longs FIRST (floor(x·1e6), the
    * agg_rollup_chain / agg_ab_ttest discipline — r7 ADVICE closed):
    * integer partial sums are order-free, so the rollup hashes
    * identically across partition counts and engines instead of riding
    * float-accumulation luck near a 1e-4 rounding edge; min/max/count
    * are order-free already and stay on the raw column. The µ-floor is
    * the declared measure resolution, not drift. */
  final case class MeasureDef(name: String, column: String, function: String) {
    require(MeasureDef.functions.contains(function.toLowerCase),
      s"measure '$name': unknown function '$function' " +
        s"(known: ${MeasureDef.functions.toSeq.sorted.mkString(" ")})")

    def toColumn: Column = {
      import org.apache.spark.sql.{functions => F}
      val c = F.col(column)
      val q = F.floor(c * 1e6).cast("long")
      function.toLowerCase match {
        case "sum"   => F.round(F.sum(q) / 1e6, 4).as(name)
        case "avg"   => F.round(F.sum(q) / F.count(c) / 1e6, 4).as(name)
        case "min"   => F.round(F.min(c), 4).as(name)
        case "max"   => F.round(F.max(c), 4).as(name)
        case "count" => F.count(c).as(name)
      }
    }
  }
  object MeasureDef {
    val functions: Set[String] = Set("sum", "avg", "min", "max", "count")
  }

  /** An aggregation definition: the reference's time-aggregation configs —
    * (entity column, target granularity, measure list) as a document, the
    * third leg of the config-as-schema layer beside store and trigger
    * definitions. `compile` produces the rollup a trend store ingests:
    * one groupBy on (entity, bucket) with map-side partial aggregation —
    * the document scales the SCHEMA of the rollup, never its execution
    * plan. */
  final case class AggregationDef(name: String, entity: String,
      granularity: Granularity, measures: Seq[MeasureDef]) {

    /** Compile against a source frame carrying `entity` and a ts column:
      * the standard (entity_id, ts) trend-rollup shape. */
    def compile(src: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.col
      src.groupBy(col(entity).as("entity_id"),
          granularity.bucket(col("ts")).as("ts"))
        .agg(measures.head.toColumn, measures.tail.map(_.toColumn): _*)
    }

    /** Persist beside the target store — same idempotent /
      * conflict-rejecting contract as the other definitions. */
    def create(spark: SparkSession, rootDir: String): Unit = {
      existingDefinition(spark, rootDir).foreach { prior =>
        require(parseAggregation(prior) == this,
          s"aggregation at $rootDir already defined differently; " +
            "redefinition must be an explicit migration")
      }
      writeDefinition(spark, rootDir, renderAggregation(this))
    }
  }

  // ---- parsing ----------------------------------------------------------

  private val jsonMapper = new ObjectMapper()
  private val yamlMapper = new ObjectMapper(new YAMLFactory())

  /** Parse a definition document. YAML is a superset of JSON here: the
    * YAML reader accepts both flavors, so the document format never needs
    * declaring. */
  private def tree(text: String): JsonNode = {
    val t = yamlMapper.readTree(text)
    require(t != null && t.isObject, "definition document is not a mapping")
    t
  }

  private def reqText(n: JsonNode, field: String): String = {
    val v = n.get(field)
    require(v != null && v.isTextual && v.asText.nonEmpty,
      s"definition missing required text field '$field'")
    v.asText
  }

  private def columnList(n: JsonNode, field: String): Seq[ColumnDef] = {
    val arr = n.get(field)
    require(arr != null && arr.isArray && arr.size > 0,
      s"definition needs a non-empty '$field' list")
    val cols = arr.elements.asScala.map { e =>
      ColumnDef(reqText(e, "name"), reqText(e, "data_type"))
    }.toSeq
    val dup = cols.groupBy(_.name).collect { case (c, g) if g.size > 1 => c }
    require(dup.isEmpty, s"duplicate column names in '$field': ${dup.mkString(", ")}")
    cols.foreach(_.sparkType) // fail fast on unknown types
    cols
  }

  /** Parse a trend-store definition document (YAML or JSON):
    * {{{
    * data_source: hub
    * entity_type: node
    * granularity: 1h
    * trend_columns:
    *   - name: kpi_load
    *     data_type: double
    * }}} */
  def parseTrendStore(text: String): TrendStoreDef = {
    val t = tree(text)
    TrendStoreDef(
      reqText(t, "data_source"), reqText(t, "entity_type"),
      Granularity(reqText(t, "granularity")),
      columnList(t, "trend_columns"))
  }

  /** Parse an attribute-store definition document (YAML or JSON) with an
    * `attributes` list in place of `trend_columns`. */
  def parseAttributeStore(text: String): AttributeStoreDef = {
    val t = tree(text)
    AttributeStoreDef(
      reqText(t, "data_source"), reqText(t, "entity_type"),
      columnList(t, "attributes"))
  }

  private def reqNum(n: JsonNode, field: String): Double = {
    val v = n.get(field)
    require(v != null && v.isNumber,
      s"definition missing required numeric field '$field'")
    v.asDouble
  }

  /** Parse a trigger definition document (YAML or JSON):
    * {{{
    * name: node_alarms
    * granularity: 1h
    * thresholds:
    *   - name: load_high
    *     kpi: kpi_load
    *     op: ">"
    *     value: 210.0
    *     severity: major
    * }}} */
  def parseTrigger(text: String): TriggerDef = {
    val t = tree(text)
    val arr = t.get("thresholds")
    require(arr != null && arr.isArray && arr.size > 0,
      "trigger definition needs a non-empty 'thresholds' list")
    val ths = arr.elements.asScala.map { e =>
      ThresholdDef(reqText(e, "name"), reqText(e, "kpi"), reqText(e, "op"),
        reqNum(e, "value"), reqText(e, "severity"))
    }.toSeq
    val dup = ths.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate threshold names: ${dup.mkString(", ")}")
    TriggerDef(reqText(t, "name"), Granularity(reqText(t, "granularity")), ths)
  }

  def parseAggregation(text: String): AggregationDef = {
    val t = tree(text)
    val arr = t.get("measures")
    require(arr != null && arr.isArray && arr.size > 0,
      "aggregation definition needs a non-empty 'measures' list")
    val ms = arr.elements.asScala.map { e =>
      MeasureDef(reqText(e, "name"), reqText(e, "column"), reqText(e, "function"))
    }.toSeq
    val dup = ms.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate measure names: ${dup.mkString(", ")}")
    AggregationDef(reqText(t, "name"), reqText(t, "entity"),
      Granularity(reqText(t, "granularity")), ms)
  }

  // ---- rendering / persistence ------------------------------------------

  /** Canonical JSON rendering (JSON is valid YAML, and machine-written
    * definitions should be the unambiguous flavor). */
  def renderTrendStore(d: TrendStoreDef): String = {
    val node = jsonMapper.createObjectNode()
    node.put("data_source", d.dataSource)
    node.put("entity_type", d.entityType)
    node.put("granularity", d.granularity.name)
    val arr = node.putArray("trend_columns")
    d.counters.foreach { c =>
      val e = arr.addObject(); e.put("name", c.name); e.put("data_type", c.dataType)
    }
    jsonMapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  /** Canonical JSON rendering of an attribute-store definition. */
  def renderAttributeStore(d: AttributeStoreDef): String = {
    val node = jsonMapper.createObjectNode()
    node.put("data_source", d.dataSource)
    node.put("entity_type", d.entityType)
    val arr = node.putArray("attributes")
    d.attributes.foreach { a =>
      val e = arr.addObject(); e.put("name", a.name); e.put("data_type", a.dataType)
    }
    jsonMapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  /** Canonical JSON rendering of a trigger definition. */
  def renderTrigger(d: TriggerDef): String = {
    val node = jsonMapper.createObjectNode()
    node.put("name", d.name)
    node.put("granularity", d.granularity.name)
    val arr = node.putArray("thresholds")
    d.thresholds.foreach { th =>
      val e = arr.addObject()
      e.put("name", th.name); e.put("kpi", th.kpi); e.put("op", th.op)
      e.put("value", th.value); e.put("severity", th.severity)
    }
    jsonMapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  /** Canonical JSON rendering of an aggregation definition. */
  def renderAggregation(d: AggregationDef): String = {
    val node = jsonMapper.createObjectNode()
    node.put("name", d.name)
    node.put("entity", d.entity)
    node.put("granularity", d.granularity.name)
    val arr = node.putArray("measures")
    d.measures.foreach { m =>
      val e = arr.addObject()
      e.put("name", m.name); e.put("column", m.column); e.put("function", m.function)
    }
    jsonMapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }

  /** Re-open a trigger from the definition persisted at `rootDir` —
    * mirror of [[openTrendStore]]. */
  def openTrigger(spark: SparkSession, rootDir: String): TriggerDef = {
    val text = existingDefinition(spark, rootDir).getOrElse(
      throw new IllegalArgumentException(
        s"no $DefinitionFile at $rootDir — not a defined trigger"))
    parseTrigger(text)
  }

  /** Re-open an attribute store from the definition persisted at
    * `rootDir` — mirror of [[openTrendStore]]. */
  def openAttributeStore(spark: SparkSession, rootDir: String): AttributeStoreDef = {
    val text = existingDefinition(spark, rootDir).getOrElse(
      throw new IllegalArgumentException(
        s"no $DefinitionFile at $rootDir — not a defined attribute store"))
    parseAttributeStore(text)
  }

  private val DefinitionFile = "_definition.json"

  /** The persisted definition travels with the data, through the store's
    * OWN filesystem (HDFS/S3-safe, the [[graft.Fs]] discipline). Leading
    * underscore: data readers treat it as a hidden non-data entry. */
  private def writeDefinition(spark: SparkSession, rootDir: String,
      rendered: String): Unit = {
    val (fs, p) = graft.Fs.fileSystem(spark, rootDir)
    fs.mkdirs(p)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, DefinitionFile), true)
    try out.write(rendered.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def existingDefinition(spark: SparkSession,
      rootDir: String): Option[String] = {
    val (fs, p) = graft.Fs.fileSystem(spark, rootDir)
    val f = new org.apache.hadoop.fs.Path(p, DefinitionFile)
    if (!fs.exists(f)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
      val in = fs.open(f)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Re-open a trend store from the definition persisted at `rootDir` —
    * the "verify" half of create/verify: the returned store reads with
    * the DECLARED schema asserted, so layout drift (a counter column
    * vanishing from the parquet) fails at open/read, not mid-pipeline. */
  def openTrendStore(spark: SparkSession, rootDir: String): (TrendStoreDef, TrendStore) = {
    val text = existingDefinition(spark, rootDir).getOrElse(
      throw new IllegalArgumentException(
        s"no $DefinitionFile at $rootDir — not a defined trend store"))
    val d = parseTrendStore(text)
    (d, new TrendStore(spark, rootDir, d.counters.map(_.name)))
  }
}
