package graft

import org.apache.spark.sql.functions._

/** ops.HoltWinters generator: the m-parameterized expression must equal an
  * independent Scala reference fold at multiple season lengths, and the
  * m=4 simple-seed instantiation must be exactly what the registered
  * `win_holt_winters` key computes (its oracle contract). */
class HoltWintersSpec extends SparkSpec {
  import spark.implicits._

  // exact-decimal complements, matching the generated literals
  private val (a, ca) = (0.3, (BigDecimal(1) - BigDecimal("0.3")).toDouble)
  private val (b, cb) = (0.2, (BigDecimal(1) - BigDecimal("0.2")).toDouble)
  private val (g, cg) = (0.3, (BigDecimal(1) - BigDecimal("0.3")).toDouble)

  /** Independent reference: strictly sequential additive HW fold. */
  private def ref(xs: Seq[Double], m: Int, seedSeason: Boolean): Double = {
    var lv = 0.0; var tr = 0.0; var i = 0
    val s = Array.fill(m)(0.0)
    val rest: Seq[Double] =
      if (seedSeason && xs.length >= m) {
        lv = xs.take(m).foldLeft(0.0)(_ + _) / m
        for (j <- 0 until m) s(j) = xs(j) - lv
        i = m
        xs.drop(m)
      } else { lv = xs.head; i = 1; xs.drop(1) }
    rest.foreach { x =>
      val p = i % m
      val nlv = a * (x - s(p)) + ca * (lv + tr)
      val ntr = b * (nlv - lv) + cb * tr
      val ns = g * (x - nlv) + cg * s(p)
      lv = nlv; tr = ntr; s(p) = ns; i += 1
    }
    math.floor((lv + tr + s(i % m)) * 1e4) / 1e4
  }

  private def sparkHw(xs: Seq[Double], m: Int, seedSeason: Boolean): Double =
    Seq(Tuple1(xs)).toDF("l")
      .select(expr(graft.ops.HoltWinters.forecastExpr(
        "l", m, seedFirstSeason = seedSeason)).as("f"))
      .as[Double].head()

  private val series = Seq(10.0, 14.0, 8.0, 12.0, 11.0, 15.5, 7.25, 13.0,
    12.0, 16.0, 9.0, 14.0, 10.5, 15.0, 8.5, 13.25)

  test("m=4 simple seed matches the reference fold bit-for-bit") {
    for (n <- Seq(1, 2, 5, 16))
      assert(sparkHw(series.take(n), 4, seedSeason = false)
        == ref(series.take(n), 4, seedSeason = false), s"diverged at n=$n")
  }

  test("m=7 simple seed matches the reference fold") {
    for (n <- Seq(3, 7, 16))
      assert(sparkHw(series.take(n), 7, seedSeason = false)
        == ref(series.take(n), 7, seedSeason = false), s"diverged at n=$n")
  }

  test("first-season seeding matches the reference at m=4 and m=7") {
    for (m <- Seq(4, 7))
      assert(sparkHw(series, m, seedSeason = true)
        == ref(series, m, seedSeason = true), s"diverged at m=$m")
  }

  test("first-season seeding falls back to the simple seed under one season") {
    val short = series.take(5) // < 7 samples
    assert(sparkHw(short, 7, seedSeason = true)
      == ref(short, 7, seedSeason = false), "short-history fallback broken")
  }

  test("season seeding differs from zero seeding on seasonal data (sanity)") {
    assert(sparkHw(series, 4, seedSeason = true) != sparkHw(series, 4, seedSeason = false))
  }

  test("registered key computes exactly the m=4 simple-seed instantiation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id")).rowsBetween(-15, 0)
    val viaGen = Tables.events(spark, sf0001)
      .withColumn("l", collect_list(col("value")).over(w))
      .select(col("event_id"),
        expr(graft.ops.HoltWinters.forecastExpr("l", 4)).as("hw_forecast"))
      .orderBy("event_id").collect().toSeq
    val viaKey = SparkEntry.queries("win_holt_winters")(spark, sf0001)
      .select("event_id", "hw_forecast").collect().toSeq
    assert(viaGen == viaKey)
  }

  test("generator rejects degenerate season lengths") {
    intercept[IllegalArgumentException] { graft.ops.HoltWinters.forecastExpr("l", 1) }
  }
}
