package graft

import org.apache.spark.sql.functions._

/** mask_intersect / mask_card: the codegen popcount expressions that back
  * the V>64 branch of Dedup.tokenMasks. The contract is exact equality
  * with the interpreted HOF formulation they replaced — checked here over
  * deterministic pseudo-random masks on both the codegen (DataFrame) and
  * interpreted (nullSafeEval) paths.
  */
class MaskOpsSpec extends SparkSpec {

  private val hofInter =
    "aggregate(zip_with(a_mask, b_mask, (x, y) -> bit_count(x & y)), 0, (acc, n) -> acc + n)"
  private def hofCard(c: String) =
    s"aggregate(transform($c, x -> bit_count(x)), 0, (acc, n) -> acc + n)"

  private def maskPairs(rows: Int, words: Int) =
    spark.range(rows)
      .withColumn("a_mask", expr(s"transform(sequence(1, $words), w -> xxhash64(id, w))"))
      .withColumn("b_mask", expr(s"transform(sequence(1, $words), w -> xxhash64(id + 1, w))"))

  test("mask_intersect and mask_card match the HOF formulation exactly") {
    graft.functions.MaskOps.register(spark)
    val diff = maskPairs(2000, 7)
      .selectExpr(
        s"mask_intersect(a_mask, b_mask) - ($hofInter) AS d_inter",
        s"mask_card(a_mask) - (${hofCard("a_mask")}) AS d_card")
      .selectExpr("sum(abs(d_inter)) AS i", "sum(abs(d_card)) AS c")
      .head()
    assert(diff.getLong(0) == 0L && diff.getLong(1) == 0L)
  }

  test("interpreted eval agrees with codegen and with a scala model") {
    import graft.functions.{MaskCard, MaskIntersect}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}

    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(9)
      val a = Array.fill(n)(rnd.nextLong())
      val b = Array.fill(n)(rnd.nextLong())
      val la = Literal.create(ArrayData.toArrayData(a), ArrayType(LongType))
      val lb = Literal.create(ArrayData.toArrayData(b), ArrayType(LongType))
      val model = a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x & y) }.sum
      assert(MaskIntersect(la, lb).eval(null) == model)
      assert(MaskCard(la).eval(null) == a.map(java.lang.Long.bitCount).sum)
    }
  }

  test("length mismatch intersects the common prefix; empty mask popcounts to 0") {
    graft.functions.MaskOps.register(spark)
    val r = spark.sql(
      """SELECT mask_intersect(array(-1L, -1L, -1L), array(-1L)) AS i,
        |       mask_card(CAST(array() AS ARRAY<BIGINT>)) AS z""".stripMargin).head()
    assert(r.getInt(0) == 64 && r.getInt(1) == 0)
  }

  test("null input yields null (null-safe binary/unary contract)") {
    graft.functions.MaskOps.register(spark)
    val r = spark.sql(
      "SELECT mask_intersect(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS i, " +
        "mask_card(CAST(NULL AS ARRAY<BIGINT>)) AS c").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("wrong argument type fails analysis; wrong arity fails with a clean message") {
    graft.functions.MaskOps.register(spark)
    val typeErr = intercept[Throwable] {
      spark.sql("SELECT mask_card(array('a', 'b'))").collect()
    }
    val typeMessages = Iterator.iterate(typeErr)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(typeMessages.toLowerCase.contains("array<bigint>") ||
      typeMessages.contains("DATATYPE_MISMATCH"), typeMessages)

    val arityErr = intercept[Throwable] {
      spark.sql("SELECT mask_intersect(array(1L))").collect()
    }
    val arityMessages = Iterator.iterate(arityErr)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(arityMessages.contains("exactly 2 arguments"), arityMessages)
  }

  test("resolves via the GraftExtensions injection on a fresh child session") {
    // the shared session is extensions-configured (SparkSpec); a child
    // session rebuilds its registry from extensions only, so resolution
    // there proves the injection path, not temp-function leakage
    val v = spark.newSession()
      .sql("SELECT mask_intersect(array(3L, 5L), array(1L, 4L)) AS i").head().getInt(0)
    assert(v == 2) // bitCount(3&1) + bitCount(5&4) = 1 + 1
  }
}
