package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's granularity catalog: the time resolutions trend data is
  * stored and re-aggregated at (900 s, 1 h, 1 d, 1 w, 1 month). Calendar
  * granularities truncate (variable length); fixed ones bucket by epoch
  * window — both produce a timestamp bucket-start column usable as a
  * grouping key and a partition source. */
sealed trait Granularity {
  def name: String
  /** Bucket-start expression over a timestamp column. */
  def bucket(ts: Column): Column
}

object Granularity {
  case object QuarterHour extends Granularity {
    val name = "900"
    def bucket(ts: Column): Column = window(ts, "15 minutes")("start")
  }
  case object Hour extends Granularity {
    val name = "1h"
    def bucket(ts: Column): Column = date_trunc("hour", ts)
  }
  case object Day extends Granularity {
    val name = "1d"
    def bucket(ts: Column): Column = date_trunc("day", ts)
  }
  case object Week extends Granularity {
    val name = "1w"
    def bucket(ts: Column): Column = date_trunc("week", ts)
  }
  case object Month extends Granularity {
    val name = "1month"
    def bucket(ts: Column): Column = date_trunc("month", ts)
  }

  val all: Seq[Granularity] = Seq(QuarterHour, Hour, Day, Week, Month)

  def apply(name: String): Granularity =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"unknown granularity '$name' (known: ${all.map(_.name).mkString(", ")})"))

  /** Coarsening order: every finer granularity re-aggregates losslessly
    * into any coarser one EXCEPT QuarterHour/Hour/Day → Week vs Month
    * (weeks straddle month boundaries); `canRollupTo` encodes the valid
    * edges, mirroring the reference's aggregation graph. */
  def canRollupTo(from: Granularity, to: Granularity): Boolean = (from, to) match {
    case (a, b) if a == b                   => true
    case (QuarterHour, _)                   => true
    case (Hour, Day) | (Hour, Week) | (Hour, Month) => true
    case (Day, Week) | (Day, Month)         => true
    case _                                  => false
  }
}
