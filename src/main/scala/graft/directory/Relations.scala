package graft.directory

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Relation directory: named entity-to-entity mappings (Cell→Site,
  * customer→nation…) defined by a rule over the entity registry / source
  * data and refreshed materialized-view-style — the reference's
  * relation_directory. A relation is a two-column table
  * (source_id, target_id); hierarchy rollups broadcast it
  * (TrendStore.aggregateEntity).
  */
object Relations {

  /** Materialize (or refresh) a relation under `rootDir/name` from its
    * defining rule. Overwrite semantics = the reference's full refresh;
    * the write is tiny (relations are dimension-sized). */
  def refresh(spark: SparkSession, rootDir: String, name: String)
             (rule: => DataFrame): DataFrame = {
    val rel = rule.select(col("source_id"), col("target_id")).distinct()
    rel.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$rootDir/$name")
    // a re-refresh replaces the files; drop any cached listing of the path
    spark.catalog.refreshByPath(s"$rootDir/$name")
    spark.read.parquet(s"$rootDir/$name")
  }

  def load(spark: SparkSession, rootDir: String, name: String): DataFrame =
    spark.read.parquet(s"$rootDir/$name")

  /** Fingerprint-gated refresh (the Materializer's gate applied to
    * relations): the rule is re-evaluated only when the defining source's
    * fingerprint — (row count, bit_xor of xxhash64, DECIMAL sum of
    * xxhash64), order-independent, one aggregation pass — differs from the
    * stored one. The xor alone is blind to changes of even multiplicity
    * (two identical rows cancel to zero), so the multiset-sensitive
    * DECIMAL(38,0) hash sum rides along; it cannot overflow (|xxhash64|
    * < 1e19 ⇒ even 1e19 rows stay within 38 digits). An unchanged registry
    * costs one cheap agg instead of rule + write; at 100 TB the agg is
    * map-side-partial over the source, the rule possibly much more.
    *
    * The fingerprint file lives on the SAME filesystem as the relation
    * (HDFS/S3 in a real deployment) — a driver-local file would neither
    * survive nor be shared.
    */
  def refreshIncremental(spark: SparkSession, rootDir: String, name: String)
                        (source: DataFrame)(rule: DataFrame => DataFrame): RefreshResult = {
    val h = xxhash64(source.columns.sorted.map(col): _*)
    val fpRow = source
      .agg(count(lit(1)), bit_xor(h),
        sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .head()
    val fp = Seq(
      fpRow.getLong(0),
      if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1),
      if (fpRow.isNullAt(2)) "0" else fpRow.getDecimal(2).toBigInteger.toString
    ).mkString(":")

    val fpFile = s"$rootDir/$name._fingerprint"
    val prev = graft.Fs.readUtf8(spark, fpFile)
    if (prev.contains(fp) && graft.Fs.exists(spark, s"$rootDir/$name"))
      RefreshResult(load(spark, rootDir, name), refreshed = false)
    else {
      val rel = refresh(spark, rootDir, name)(rule(source))
      graft.Fs.writeUtf8(spark, fpFile, fp)
      RefreshResult(rel, refreshed = true)
    }
  }

  final case class RefreshResult(relation: DataFrame, refreshed: Boolean)

  /** Compose two relations (a→b, b→c ⇒ a→c): multi-level hierarchy in one
    * broadcast-sized join. */
  def compose(ab: DataFrame, bc: DataFrame): DataFrame =
    ab.select(col("source_id"), col("target_id").as("mid"))
      .join(bc.select(col("source_id").as("mid2"), col("target_id")),
        col("mid") === col("mid2"))
      .select(col("source_id"), col("target_id")).distinct()

  /** Sanity check a relation is a function (each source maps to exactly
    * one target) — required for lossless hierarchy rollup. */
  def isFunctional(rel: DataFrame): Boolean =
    rel.groupBy("source_id").count().where(col("count") > 1).isEmpty
}
