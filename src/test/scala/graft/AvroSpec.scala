package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroFile

/** Avro container-file source/sink (graft.sources.AvroFile): round-trip
  * fidelity, union-null decode, µs timestamp precision, multi-file
  * parallel scan, and schema-directed reads (declared schema wins over
  * the file's writer schema). */
class AvroSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  test("write/read round-trips all supported types incl. nulls and binary") {
    val dir = tmpDir("avro_rt")
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456") // µs precision
    val rows = Seq(
      Row(1L, ts, "alpha", 1.5, Array[Byte](1, 2, 3)),
      Row(2L, ts, null, -0.25, null),
      Row(3L, ts, "", Double.MinPositiveValue, Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    AvroFile.write(df, dir)
    val got = AvroFile.read(spark, dir, schema).orderBy("id").collect()
    assert(got.length == 3)
    assert(got(0).getTimestamp(1) == ts, "timestamp must round-trip at µs precision")
    assert(got(1).isNullAt(2) && got(1).isNullAt(4), "union{null,T} decode")
    assert(got(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(got(2).getAs[Array[Byte]](4).isEmpty)
    assert(got(2).getDouble(3) == Double.MinPositiveValue)
  }

  test("sink writes one container file per partition; scan decodes them all") {
    val dir = tmpDir("avro_parts")
    val df = Tables.events(spark, sf0001)
      .select(col("event_id").as("id"), col("ts"),
        col("event_type").as("name"), col("value").as("score"),
        lit(null).cast("binary").as("payload"))
      .repartitionByRange(3, col("id"))
    AvroFile.write(df, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length == 3, s"one file per partition: ${files.toSeq}")
    val got = AvroFile.read(spark, dir, schema)
    assert(got.count() == df.count())
    // file-parallelism: binaryFile gives at least one input partition per file
    assert(got.rdd.getNumPartitions >= 1)
  }

  test("declared schema wins: extra file fields ignored, missing fields null") {
    val dir = tmpDir("avro_evolve")
    val writerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, "ignored")), 1), writerSchema)
    AvroFile.write(df, dir)
    val readerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("absent", StringType, nullable = true)))
    val got = AvroFile.read(spark, dir, readerSchema).collect()
    assert(got.length == 1 && got(0).getLong(0) == 7L && got(0).isNullAt(1))
  }

  test("scan_avro_typed key equals its source recomputation") {
    val got = SparkEntry.queries("scan_avro_typed")(spark, sf0001).collect()
    val want = Tables.events(spark, sf0001)
      .where(col("event_id") < 400)
      .select(col("event_id"), col("ts"), col("user_id"),
        nullif(col("event_type"), lit("click")).as("maybe_type"), col("value"))
      .orderBy("event_id").collect()
    assert(got.toSeq == want.toSeq)
  }
}
