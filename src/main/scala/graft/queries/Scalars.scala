package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** Scalar function surface (SURVEY.md §2 sections H and J): string/date/
  * math/conditional/cast/array/map expressions, the unpivot generator, and
  * the DN-builder (kept on built-in format_string — Catalyst-optimizable —
  * rather than a black-box UDF; see §2 J rule of thumb).
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // H1 — DN-style string parsing on c_name ("Customer#000000042").
    "scalar_string" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "[0-9]+$", 0).as("id_str"),
          upper(col("c_mktsegment")).as("seg_u"),
          substring(col("c_name"), 1, 8).as("pfx"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          concat(lit("seg="), trim(lower(col("c_mktsegment")))).as("tagged"))
        .orderBy("c_custkey")
    }),

    // H2 — datetime arithmetic: truncation, ISO weekday, day diff, interval.
    "scalar_date" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          expr("weekday(o_orderdate)").cast("int").as("dow"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          expr("o_orderdate + INTERVAL 1 MONTH").as("plus_month"))
        .orderBy("o_orderkey")
    }),

    // H3 — math functions on prices.
    "scalar_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 4).as("absd"),
          ceil(col("l_extendedprice")).as("ceilp"),
          floor(col("l_extendedprice")).as("floorp"),
          round(log(col("l_extendedprice") + 1.0), 4).as("lnp"),
          round(pow(col("l_quantity"), 2), 4).as("qty2"),
          (col("l_linenumber") % 3).as("lmod"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // H4 — CASE WHEN / coalesce / nullif three-valued logic.
    "scalar_case_null" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)")).as("seg"),
          nullif(col("c_nationkey") % 5, lit(0)).as("nn"))
        .orderBy("c_custkey")
    }),

    // H5 — decimal cast + exact decimal sums (the oracle-exactness
    // workhorse: decimal aggregation is order-insensitive). The final cast
    // back to DOUBLE is deliberate: a DECIMAL output column survives the
    // parquet dump as decimal128 (stringifies '123.4500') while DuckDB's
    // DECIMAL result reaches pandas as float64 ('123.45') — round 1's only
    // driver-side hash mismatch besides simhash. The exact decimal sum is
    // still what's computed; only the output representation is double.
    "scalar_cast_decimal" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // H6 — higher-order functions over the embedding array. Products are
    // forced to double before accumulating so Spark and DuckDB both sum
    // float32 values in float64, in list order.
    "scalar_array" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("norm"),
          round(aggregate(slice(col("embedding"), 1, 3), lit(0.0),
            (acc, x) => acc + x.cast("double")), 4).as("head3_sum"))
        .orderBy("vec_id")
    }),

    // H7 — JSON -> map: keys and typed value extraction.
    "scalar_map_json" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
        .select(col("event_id"),
          element_at(map_keys(col("m")), 1).as("first_key"),
          col("m").getItem("k").as("kv"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy("event_id")
    }),

    // J1 — wide counter row -> long (counter, value) pairs via the stack
    // generator (Minerva data-package unpivot).
    "udtf_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .selectExpr("l_orderkey", "l_linenumber",
          "stack(3, 'disc', round(l_discount, 4), 'price', round(l_extendedprice, 4), 'qty', round(l_quantity, 4)) AS (counter, value)")
        .orderBy("l_orderkey", "l_linenumber", "counter")
    }),

    // J2 — DN builder on format_string (not a UDF: stays inside codegen).
    "udf_dn_build" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          format_string("Network=G1,Node=%03d", (col("c_custkey") % 100).cast("int")).as("dn"))
        .orderBy("c_custkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT c_custkey, regexp_extract(c_name, '[0-9]+$') AS id_str,
        |       upper(c_mktsegment) AS seg_u, substring(c_name, 1, 8) AS pfx,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |       concat('seg=', trim(lower(c_mktsegment))) AS tagged
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(isodow(o_orderdate) - 1 AS INTEGER) AS dow,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
        |       o_orderdate + INTERVAL 1 MONTH AS plus_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(abs(l_discount - 0.05), 4) AS absd,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS ceilp,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS floorp,
        |       round(ln(l_extendedprice + 1.0), 4) AS lnp,
        |       round(power(l_quantity, 2), 4) AS qty2,
        |       l_linenumber % 3 AS lmod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scalar_case_null" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
        |       nullif(c_nationkey % 5, 0) AS nn
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_cast_decimal" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "scalar_array" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |       round(sqrt(list_aggregate(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS norm,
        |       round(list_aggregate(list_transform(embedding[1:3],
        |         x -> CAST(x AS DOUBLE)), 'sum'), 4) AS head3_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "scalar_map_json" ->
      """SELECT event_id, json_keys(props)[1] AS first_key,
        |       CAST(json_extract(props, '$.k') AS INTEGER) AS kv,
        |       CAST(len(json_keys(props)) AS INTEGER) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "udtf_unpivot" ->
      """SELECT l_orderkey, l_linenumber, counter, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'disc' AS counter, round(l_discount, 4) AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', round(l_extendedprice, 4) FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'qty', round(l_quantity, 4) FROM lineitem
        |) ORDER BY l_orderkey, l_linenumber, counter""".stripMargin,
    "udf_dn_build" ->
      """SELECT c_custkey, printf('Network=G1,Node=%03d', CAST(c_custkey % 100 AS INTEGER)) AS dn
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
