package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r12 codegen series kernels (graft.functions.SeriesOps)
  * bit-identical to the interpreted HOF formulations they replaced. */
class SeriesOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SeriesOps.register(spark)
  }

  override def afterAll(): Unit = spark.stop()

  /** The exact pre-r12 win_theil_sen HOF formulation over column `l`. */
  private def hofTheilSen = Seq(
    "CASE WHEN size(l) < 2 THEN array() ELSE " +
      "array_sort(flatten(transform(sequence(1, size(l) - 1), i -> " +
      "transform(sequence(i + 1, size(l)), j -> " +
      "(element_at(l, j) - element_at(l, i)) / CAST(j - i AS DOUBLE)))))" +
      " END",
    """CASE WHEN size(l) < 2 THEN CAST(NULL AS DOUBLE) ELSE
      |  floor((CASE WHEN size(slopes) % 2 = 1
      |              THEN element_at(slopes, CAST((size(slopes) + 1) div 2 AS INT))
      |              ELSE (element_at(slopes, CAST(size(slopes) div 2 AS INT))
      |                  + element_at(slopes, CAST(size(slopes) div 2 + 1 AS INT))) / 2.0D
      |         END) * 10000) / 10000 END""".stripMargin)

  test("theil_sen_med equals the HOF slope/sort/median/floor chain") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val adversarial: Seq[Seq[Double]] = Seq(
      Seq.empty, Seq(1.0), Seq(1.0, 1.0), Seq(0.0, -0.0), Seq(-0.0, 0.0),
      Seq(-0.0, 0.0, -0.0, 0.0, 5.0), Seq(Double.NaN, 1.0, 2.0),
      Seq(1.0, Double.NaN, Double.NaN, 3.0),
      Seq.fill(16)(7.25), Seq.tabulate(16)(_.toDouble),
      Seq.tabulate(16)(i => if (i % 2 == 0) 1.0 else -1.0))
    val random: Seq[Seq[Double]] = (0 until 300).map { _ =>
      val k = 2 + rnd.nextInt(15)
      Seq.fill(k)(math.floor(rnd.nextDouble() * 1e4) / 1e4 *
        (if (rnd.nextBoolean()) 1 else -1))
    }
    val df = (adversarial ++ random).toDF("l")
      .withColumn("slopes", expr(hofTheilSen.head))
      .withColumn("ref", expr(hofTheilSen(1)))
      .withColumn("fast", call_function("theil_sen_med", col("l")))
    val bad = df.where(expr("NOT (fast <=> ref)")).count()
    assert(bad === 0)
    // non-vacuous: real medians were produced
    assert(df.where(col("fast").isNotNull).count() > 300)
  }
}
