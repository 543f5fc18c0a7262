package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Sample-weighted average as a typed Aggregator (Minerva counter
  * re-aggregation semantics: re-weighting a pre-aggregated KPI by its sample
  * count; SURVEY.md §2 row `agg_weighted_udaf`).
  *
  * The buffer is a (weighted sum, weight sum) pair, so partial aggregates
  * merge associatively — Spark runs it map-side partial + reduce-side final
  * like any built-in aggregate, which is what makes it safe at 100 TB.
  * Input is (value, weight).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
