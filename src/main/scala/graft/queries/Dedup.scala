package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact token-set Jaccard near-dup detection via dictionary-encoded
  * bitmasks, with same-language blocking.
  *
  * Pipeline: global token dictionary (one tiny distinct + window) → each
  * doc's token ids OR-ed into bitmask words → pair loop as a broadcast
  * hash join on the lang block key, intersection computed by `bit_count`
  * over the masks — pure codegen'd long arithmetic, no token-level
  * shuffle, no per-pair array-of-strings materialization.
  *
  * Two physical paths chosen by measured vocabulary size:
  *  - V ≤ 64: a single long mask; `bit_count(a & b)` directly.
  *  - V > 64: ceil(V/64) mask words as a fixed-length array; intersection
  *    is the sum of per-word bit_counts via a `zip_with` over the word
  *    arrays (word count is small, so the HOF overhead stays bounded).
  * Beyond broadcastable corpora the sub-quadratic route is the MinHash
  * LSH banding key (`llm_dedup_minhash`).
  */
object Dedup {

  def jaccardBitmask(s: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(filter(split(col("text"), " "), t => length(t) > 0))).as("token"))
    val vocab = tok.select("token").distinct()
      .withColumn("tid", row_number().over(Window.orderBy("token")) - 1)
    val v = vocab.count() // dictionary cardinality gate (tiny scan)

    val (masks, interExpr, cardExpr) =
      if (v <= 64) {
        val m = tok.join(broadcast(vocab), "token")
          .groupBy("doc_id", "lang")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), tid))").as("mask"))
        (m, "bit_count(a_mask & b_mask)",
          (side: String) => s"bit_count(${side}_mask)")
      } else {
        val words = ((v - 1) / 64 + 1).toInt
        val m = tok.join(broadcast(vocab), "token")
          .withColumn("widx", (col("tid") / 64).cast("int"))
          .groupBy("doc_id", "lang", "widx")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), tid % 64))").as("w"))
          .groupBy("doc_id", "lang")
          .agg(map_from_arrays(collect_list("widx"), collect_list("w")).as("wm"))
          // fixed-length word array (missing words = 0) so zip_with lines up
          .withColumn("mask", expr(s"transform(sequence(0, ${words - 1}), i -> coalesce(wm[i], CAST(0 AS BIGINT)))"))
          .drop("wm")
        (m, "aggregate(zip_with(a_mask, b_mask, (x, y) -> bit_count(x & y)), 0, (acc, n) -> acc + n)",
          (side: String) => s"aggregate(transform(${side}_mask, x -> bit_count(x)), 0, (acc, n) -> acc + n)")
      }

    val a = masks.select(col("doc_id").as("a_id"), col("lang"), col("mask").as("a_mask"))
    val b = masks.select(col("doc_id").as("b_id"), col("lang").as("b_lang"), col("mask").as("b_mask"))
    a.join(broadcast(b), col("lang") === col("b_lang") && col("a_id") < col("b_id"))
      .withColumn("n_inter", expr(interExpr))
      .withColumn("jacc", col("n_inter").cast("double")
        / (expr(cardExpr("a")) + expr(cardExpr("b")) - col("n_inter")))
      .where(col("jacc") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jacc"), 4).as("jacc"))
      .orderBy("a_id", "b_id")
  }
}
