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

  val tableNames: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all testdata tables under their own names on `spark`'s
    * current (session-local) view catalog. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Tables.region(spark, dir).createOrReplaceTempView("region")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.part(spark, dir).createOrReplaceTempView("part")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
  }
}
