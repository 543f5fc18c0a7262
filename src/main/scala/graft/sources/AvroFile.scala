package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro container-file ingest + sink — the fourth common harvest format
  * next to CSV, XML and JSONL (SURVEY.md §2 A2; VERDICT r2 "What's
  * missing" #3).
  *
  * The environment has no `spark-avro` DataSource jar, so
  * `format("avro")` cannot load — but Avro *core* (`avro-1.12.1.jar`) IS
  * on the Spark classpath. This module therefore hand-rolls the format
  * the Spark-first way rather than declaring it blocked:
  *
  *   - **Scan**: `binaryFile` source (file-parallel, one task per file,
  *     no shuffle) → per-file `DataFileReader` decode on executors →
  *     rows under a *declared* `StructType` (schema-directed like every
  *     other graft source — no inference pass, which at 100 TB would
  *     mean reading the data twice).
  *   - **Sink**: one container file per partition via
  *     `foreachPartition` — the same files-per-partition layout the
  *     parquet sinks use, so writers scale with the partition count and
  *     never funnel through the driver.
  *
  * Type mapping (both directions): long/int/double/float/boolean/string
  * map 1:1; `TimestampType` ⇔ Avro `long` with the `timestamp-micros`
  * logical type (µs precision — matches Spark's internal timestamp
  * resolution, so round-trips are lossless); `BinaryType` ⇔ `bytes`;
  * nullable Spark fields ⇔ `union {null, T}`.
  *
  * Scale note: `binaryFile` caps single-file size at
  * `spark.sql.sources.binaryFile.maxLength` (2 GiB default) and holds
  * one file's bytes in executor memory while decoding. Harvest drops are
  * many small-to-medium files, which is exactly this shape; a multi-GiB
  * monolithic Avro file would instead need a splittable reader over the
  * container sync markers (not needed for the harvest use case).
  */
object AvroFile {

  /** Build the Avro schema corresponding to a declared Spark schema. */
  def avroSchema(st: StructType, name: String = "record"): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          val s = Schema.create(Schema.Type.LONG)
          s.addProp("logicalType", "timestamp-micros")
          s
        case other =>
          throw new IllegalArgumentException(s"unsupported Avro field type: $other")
      }
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }
    fields.endRecord()
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (t: Timestamp, TimestampType) =>
      // µs since epoch: ms*1000 plus the sub-ms part of the nanos field
      // (getTime already includes whole ms derived from nanos).
      java.lang.Long.valueOf(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (x, _) => x.asInstanceOf[AnyRef]
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      val micros = l.longValue()
      val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    case (u: Utf8, StringType) => u.toString
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (x, _) => x
  }

  /** Distributed sink: one Avro container file per partition of `df`,
    * named `part-<id>.avro` under `dir`. Callers control file count and
    * content determinism with `repartitionByRange` + sort, exactly as
    * with the parquet sinks. */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st, "graft_row").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = new ByteArrayOutputStream()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          st.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, toAvro(r.get(i), f.dataType))
          }
          w.append(rec)
        }
        w.close()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"part-$pid%05d.avro"), out.toByteArray)
        ()
      }
    }
  }

  /** File-parallel scan: decode every `*.avro` container under `dir` to
    * rows of the declared schema. Fields present in the files but absent
    * from `st` are ignored; declared fields missing from a file's writer
    * schema read as null (schema-directed, the declared schema wins). */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val fields = st.fields.map(f => (f.name, f.dataType))
    spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(dir)
      .select(col("content"))
      .as(Encoders.BINARY)
      .flatMap { bytes =>
        val rd = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
        val hasField = rd.getSchema.getFields.asScala.map(_.name).toSet
        val it = rd.iterator().asScala.map { rec =>
          Row.fromSeq(fields.toIndexedSeq.map { case (n, dt) =>
            if (hasField(n)) fromAvro(rec.get(n), dt) else null
          })
        }
        // DataFileReader is fully drained before close: materialize.
        val rows = it.toVector
        rd.close()
        rows
      }(Encoders.row(st))
  }
}
