package graft.directory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity directory: the reference's registry of measured things, keyed by
  * a textual distinguished name (DN, e.g. `Network=G1,Node=001`) mapped to
  * a stable integer entity id, with per-level parsing for hierarchy.
  *
  * Entity ids are `xxhash64(entity_type, dn)` rather than a sequence: id
  * assignment is then embarrassingly parallel, idempotent across ingest
  * batches and clusters (no central counter — the property that matters at
  * 100 TB), at a collision risk of ~n²/2⁶⁴ (negligible below billions of
  * entities, and detectable by the uniqueness check in `register`).
  */
object EntityDirectory {

  /** Extract one component of a DN: dnPart("Network=G1,Node=001", "Node")
    * = "001". */
  def dnPart(dn: Column, key: String): Column =
    regexp_extract(dn, s"(?:^|,)$key=([^,]*)", 1)

  /** Build a DN column from typed parts: dnBuild("Network" -> col, ...). */
  def dnBuild(parts: (String, Column)*): Column =
    concat_ws(",", parts.map { case (k, v) => concat(lit(s"$k="), v) }: _*)

  /** Register entities: distinct DNs of `dnCol` become directory rows
    * (entity_id, entity_type, dn). Idempotent — re-registering the same
    * DNs yields identical ids. */
  def register(src: DataFrame, dnCol: String, entityType: String): DataFrame =
    src.select(col(dnCol).as("dn")).where(col("dn").isNotNull).distinct()
      .select(
        xxhash64(lit(entityType), col("dn")).as("entity_id"),
        lit(entityType).as("entity_type"),
        col("dn"))

  /** Resolve a fact table's DN column to entity ids (broadcast the
    * directory — it is dimension-sized). */
  def resolve(facts: DataFrame, directory: DataFrame, dnCol: String): DataFrame = {
    val dir = directory.select(col("dn").as("__dir_dn"), col("entity_id"))
    facts.join(broadcast(dir), facts(dnCol) === col("__dir_dn"), "left")
      .drop("__dir_dn")
  }

  /** Alias registry: alternative names for registered entities (the
    * reference's `directory.alias`). One (alias, entity_id) row each;
    * idempotent like `register`. */
  def aliases(directory: DataFrame, aliasOf: Column): DataFrame =
    directory.select(aliasOf.as("alias"), col("entity_id"))
      .where(col("alias").isNotNull).distinct()

  /** Resolve facts by alias instead of DN — same broadcast shape as
    * [[resolve]]. */
  def resolveByAlias(facts: DataFrame, aliasReg: DataFrame, aliasCol: String): DataFrame = {
    val dir = aliasReg.select(col("alias").as("__dir_alias"), col("entity_id"))
    facts.join(broadcast(dir), facts(aliasCol) === col("__dir_alias"), "left")
      .drop("__dir_alias")
  }

  /** Tag entities by predicate over the directory (the reference's
    * `directory.tag` grouping): returns (entity_id, tag) rows for every
    * entity matching. Accumulate several calls with unionByName. */
  def tag(directory: DataFrame, predicate: Column, tagName: String): DataFrame =
    directory.where(predicate)
      .select(col("entity_id"), lit(tagName).as("tag"))

  /** Restrict facts to entities carrying `tagName` — a broadcast semi
    * join, so the fact side never shuffles. */
  def filterByTag(facts: DataFrame, tags: DataFrame, tagName: String): DataFrame =
    facts.join(
      broadcast(tags.where(col("tag") === tagName).select("entity_id")),
      Seq("entity_id"), "left_semi")
}
