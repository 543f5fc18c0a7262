package graft

import org.apache.spark.sql.SparkSession

/** SQL catalog surface: registers every testdata table as a temp view so
  * the whole engine is reachable from plain `spark.sql` — the entry point
  * an end user of the reference (whose "query engine" is PostgreSQL SQL)
  * would reach for first. Views are lazy: registration costs nothing until
  * a query scans them, and each view is the same schema-asserted reader
  * the DataFrame API uses, so pushdown/pruning behave identically on both
  * entry paths (SURVEY.md §3.2 — SQL adds only the parser in front).
  */
object Catalog {

  /** name → schema-asserted reader; the single source of truth for both
    * the inventory and the registration. */
  private val readers: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region" -> (Tables.region _),
      "nation" -> (Tables.nation _),
      "supplier" -> (Tables.supplier _),
      "customer" -> (Tables.customer _),
      "part" -> (Tables.part _),
      "orders" -> (Tables.orders _),
      "lineitem" -> (Tables.lineitem _),
      "events" -> (Tables.events _),
      "documents" -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _))

  val tableNames: Seq[String] = readers.map(_._1)

  /** Register all testdata tables under their own names on `spark`'s
    * current (session-local) view catalog. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    readers.foreach { case (name, reader) =>
      reader(spark, dir).createOrReplaceTempView(name)
    }
}
