package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribute store: slowly-changing per-entity attributes with history —
  * the reference's attribute_history with its "current" view, point-in-time
  * `at(ts)` lookup, and run compaction.
  *
  * History rows are (entity_id, ts, attribute columns...). All three reads
  * are one shuffle on entity_id + an in-partition sort — the shape that
  * scales: no self-join, no pair blowup.
  */
object AttributeStore {

  private def attrCols(history: DataFrame): Seq[String] =
    history.columns.filterNot(Set("entity_id", "ts")).toSeq

  /** Latest attribute row per entity (the `_curr` view). Deterministic:
    * ties on ts resolved by the largest attribute tuple. */
  def current(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("entity_id")
      .orderBy(col("ts").desc, struct(attrCols(history).map(col): _*).desc)
    history.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Point-in-time view: the attribute values in force at `ts` (inclusive,
    * the reference's `at(ts)` semantics — ties pinned to <=). */
  def at(history: DataFrame, ts: String): DataFrame =
    current(history.where(col("ts") <= lit(ts).cast("timestamp")))

  /** As-of join a fact table to the history: for each fact row, the latest
    * attribute row of its entity at-or-before the fact timestamp.
    * Implemented as the single-shuffle merge pattern (union + running
    * last_value over one entity-keyed window), not a pair join. */
  def asofJoin(history: DataFrame, facts: DataFrame,
               factEntity: String, factTs: String): DataFrame = {
    val attrs = attrCols(history)
    val h = history.select(col("entity_id").as("__ent"), col("ts").as("__ts"),
      lit(0).as("__kind"), lit(null).cast("long").as("__fact_id"),
      struct(attrs.map(col): _*).as("__attrs"))
    val f = facts.withColumn("__fact_id", monotonically_increasing_id())
    val fk = f.select(col(factEntity).as("__ent"), col(factTs).as("__ts"),
      lit(1).as("__kind"), col("__fact_id"),
      lit(null).cast(h.schema("__attrs").dataType).as("__attrs"))
    val w = Window.partitionBy("__ent").orderBy(col("__ts"), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = h.unionByName(fk)
      .withColumn("__asof", last(col("__attrs"), ignoreNulls = true).over(w))
      .where(col("__kind") === 1)
      .select(col("__fact_id"), col("__asof"))
    val flat = attrs.foldLeft(f.join(resolved, "__fact_id")) {
      (acc, a) => acc.withColumn(a, col("__asof").getField(a))
    }
    flat.drop("__asof", "__fact_id")
  }

  /** Run compaction: collapse consecutive history rows whose attribute
    * values are unchanged, keeping the first row of each run — the
    * reference's periodic attribute compaction. */
  def compact(history: DataFrame): DataFrame = {
    val attrs = attrCols(history)
    val w = Window.partitionBy("entity_id").orderBy("ts")
    val hashed = history.withColumn("__h", xxhash64(attrs.map(col): _*))
    hashed.withColumn("__prev", lag(col("__h"), 1).over(w))
      .where(col("__prev").isNull || col("__h") =!= col("__prev"))
      .drop("__h", "__prev")
  }

  /** Incremental SCD-2 merge: fold one batch of NEW attribute change-rows
    * (entity_id, ts, attrs...; every ts strictly after the dimension's
    * build horizon) into an existing `scd2` dimension WITHOUT re-reading
    * full history — the nightly dimension-maintenance op (a 100 TB
    * dimension's closed versions never need rewriting; only each affected
    * entity's open interval participates).
    *
    * Mechanics: closed versions and open versions of unaffected entities
    * pass through untouched; each affected entity's open version replays
    * as the seed change-row (carrying its version number) ahead of the
    * batch rows under one entity-keyed window — the same compact-then-
    * interval machinery as the full build, so batch rows whose attributes
    * equal the running last value (including a batch head equal to the
    * current version) compact away, the open interval closes at the first
    * surviving change, and version numbers continue from the seed.
    * Entities new in the batch seed at version 1. Cost: one shuffle of
    * (affected open rows ∪ batch), two anti/semi joins at entity grain.
    *
    * Equivalence contract (the reason this is safe to run nightly):
    * mergeScd2(scd2(h), b) == scd2(h ∪ b) whenever max(h.ts) < min(b.ts)
    * per entity — pinned cross-engine by `store_scd2_merge`'s oracle
    * (which rebuilds from scratch) and by StoreSpec's fixture cases. */
  def mergeScd2(dim: DataFrame, batch: DataFrame): DataFrame = {
    val attrs = attrCols(batch)
    val open = dim.where(col("is_current"))
    val closed = dim.where(!col("is_current"))
    val ents = batch.select("entity_id").distinct()
    val untouched = open.join(ents, Seq("entity_id"), "left_anti")
    val affected = open.join(ents, Seq("entity_id"), "left_semi")
    val seed = affected.select(col("entity_id"), col("valid_from").as("ts"),
      struct(attrs.map(col): _*).as("__a"),
      col("version").cast("int").as("__seed_ver"))
    val incoming = batch.select(col("entity_id"), col("ts"),
      struct(attrs.map(col): _*).as("__a"),
      lit(null).cast("int").as("__seed_ver"))
    val w = Window.partitionBy("entity_id").orderBy("ts")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = seed.unionByName(incoming)
      .withColumn("__h", xxhash64(col("__a")))
      .withColumn("__prev", lag(col("__h"), 1).over(w))
      .where(col("__prev").isNull || col("__h") =!= col("__prev"))
      // the seed (if the entity has one) survives compaction first — its
      // version anchors the numbering; batch-only entities anchor at 1
      .withColumn("__base", coalesce(
        first(col("__seed_ver"), ignoreNulls = true).over(wRun), lit(1)))
      .withColumn("version", col("__base") + row_number().over(w) - 1)
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
    val flat = attrs.foldLeft(merged) {
      (acc, a) => acc.withColumn(a, col("__a").getField(a))
    }.select(dim.columns.map(col): _*)
    closed.unionByName(untouched).unionByName(flat)
  }

  /** SCD-2 build: compacted change-rows become versioned validity
    * intervals `[valid_from, valid_to)` (NULL `valid_to` = open/current)
    * with a per-entity version counter — the attribute_history
    * materialized as a slowly-changing dimension a warehouse can join
    * point-in-time without window functions. Runs on `compact`'s output
    * with the same entity-keyed partitioning and ts sort, so Catalyst
    * plans one exchange for the whole build. */
  def scd2(history: DataFrame): DataFrame = {
    val w = Window.partitionBy("entity_id").orderBy("ts")
    compact(history)
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("ts")
  }
}
