package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import scala.xml.XML

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** 3GPP-style XML measurement file ingest — the reference's primary harvest
  * format: per-file measurement collections carrying a managed-element DN,
  * a granularity, a counter-name list and per-timestamp value rows.
  *
  * Parsing runs distributed at per-file granularity (`wholetext` text
  * source → flatMap parse on executors) — harvest drops are many small
  * files, so file-level parallelism is the right unit, and no shuffle is
  * introduced. The parser is hand-rolled on scala-xml (no external XML
  * connector offline).
  *
  * Expected shape (simplified 3GPP measCollecFile):
  * {{{
  * <measCollecFile>
  *   <measData dn="Network=G1,Node=001" granularity="900">
  *     <measTypes>kpi_a kpi_b</measTypes>
  *     <measValue ts="2024-01-01T00:15:00">
  *       <r>1.5</r><r>2.5</r>
  *     </measValue>
  *   </measData>
  * </measCollecFile>
  * }}}
  */
object MeasurementXml {

  private val tsFmt = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  def schema(counters: Seq[String]): StructType = StructType(
    Seq(StructField("dn", StringType), StructField("ts", TimestampType)) ++
      counters.map(c => StructField(c, DoubleType)))

  /** Parse one file's content into measurement rows. Counters missing from
    * a file's measTypes yield nulls; extra counters in the file are
    * ignored — the declared schema wins (schema-directed, like the
    * reference's store definitions). */
  def parseFile(content: String, counters: Seq[String]): Iterator[Row] = {
    val root = XML.loadString(content)
    (root \ "measData").iterator.flatMap { md =>
      val dn = (md \@ "dn")
      val types = (md \ "measTypes").text.trim.split("\\s+").toSeq
      val idx = types.zipWithIndex.toMap
      (md \ "measValue").iterator.map { mv =>
        val ts = java.sql.Timestamp.valueOf(
          LocalDateTime.parse(mv \@ "ts", tsFmt))
        val vals = (mv \ "r").map(r => r.text.trim).toIndexedSeq
        Row.fromSeq(dn +: ts +: counters.map { c =>
          idx.get(c).flatMap(i => vals.lift(i)).filter(_.nonEmpty)
            .map(v => java.lang.Double.valueOf(v)).orNull
        })
      }
    }
  }

  /** Read a directory of measurement XML files into a typed DataFrame. */
  def read(spark: SparkSession, dir: String, counters: Seq[String]): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(dir)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema(counters))
    files.select("value").mapPartitions { it =>
      it.flatMap(r => parseFile(r.getString(0), counters))
    }(enc)
  }

  /** Render rows (dn, ts, counters...) as one measurement XML document —
    * test/export helper mirroring the format `read` consumes. */
  def render(rows: Seq[Row], counters: Seq[String], granularity: Int = 900): String = {
    val byDn = rows.groupBy(_.getString(0))
    val sb = new StringBuilder("<measCollecFile>\n")
    byDn.toSeq.sortBy(_._1).foreach { case (dn, rs) =>
      sb.append(s"""  <measData dn="$dn" granularity="$granularity">\n""")
      sb.append(s"    <measTypes>${counters.mkString(" ")}</measTypes>\n")
      rs.sortBy(_.getTimestamp(1).getTime).foreach { r =>
        val ts = r.getTimestamp(1).toLocalDateTime.format(tsFmt)
        sb.append(s"""    <measValue ts="$ts">""")
        counters.indices.foreach { i =>
          val v = r.get(2 + i)
          sb.append(s"<r>${if (v == null) "" else v.toString}</r>")
        }
        sb.append("</measValue>\n")
      }
      sb.append("  </measData>\n")
    }
    sb.append("</measCollecFile>\n").toString
  }
}
