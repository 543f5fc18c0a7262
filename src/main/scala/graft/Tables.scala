package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-asserted readers for the shared testdata tables (FIXTURES.md).
  *
  * Design stance (SURVEY.md §1.2): fixed, declared schemas mirroring the
  * reference's declared trend/attribute stores — we read parquet with the
  * footer schema and assert the columns we depend on, rather than inferring.
  * At 100 TB these reads are directory-partitioned parquet scans; here each
  * table is a single file, but every query is written against the DataFrame
  * so partition pruning / pushdown apply unchanged on a real layout.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String, required: Seq[String]): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"table $name missing expected columns: ${missing.mkString(",")}")
    df
  }

  def region(s: SparkSession, d: String): DataFrame =
    read(s, d, "region", Seq("r_regionkey", "r_name"))
  def nation(s: SparkSession, d: String): DataFrame =
    read(s, d, "nation", Seq("n_nationkey", "n_name", "n_regionkey"))
  def supplier(s: SparkSession, d: String): DataFrame =
    read(s, d, "supplier", Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
  def customer(s: SparkSession, d: String): DataFrame =
    read(s, d, "customer", Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
  def part(s: SparkSession, d: String): DataFrame =
    read(s, d, "part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
  def orders(s: SparkSession, d: String): DataFrame =
    read(s, d, "orders", Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
  def lineitem(s: SparkSession, d: String): DataFrame =
    read(s, d, "lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
  /** events.ts has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 cannot read as a
    * timestamp — we read it as a long and truncate to microseconds with
    * integral division, the same truncation DuckDB applies on CAST(ts_ns AS
    * TIMESTAMP); plain `/ 1000` would go through double and lose precision
    * at 1.7e18), and plain TIMESTAMP(MICROS) (read natively by both
    * engines). We branch on the footer schema so every downstream query
    * sees one canonical µs `ts` either way. TIMESTAMP_NTZ is normalized to
    * TIMESTAMP (session-local) because the JVM runs UTC and DuckDB's
    * TIMESTAMP is zone-less — epoch_us agrees bit-for-bit.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events", Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    read(s, d, "documents", Seq("doc_id", "text", "lang", "source", "n_chars"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    read(s, d, "embeddings", Seq("vec_id", "embedding", "label"))
}
