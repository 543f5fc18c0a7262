package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial operators (SURVEY.md §2 section M): grid-blocked proximity
  * analytics over planar entity coordinates.
  *
  * The warehouse has no native coordinates, so each entity gets a
  * deterministic planar position synthesized from md5 of its key — exact
  * integer METERS in a 1 000 km × 1 000 km square, identical on both
  * engines (`conv(md5)` ↔ DuckDB `CAST('0x'||substr(md5) AS BIGINT)`,
  * the established cross-engine hash idiom). Planar integer coordinates
  * are deliberate: every distance is the exact long dx²+dy² — no trig, so
  * none of the libm 1-ulp divergence a haversine oracle would risk — and
  * the spatial-join SHAPE (grid blocking) is identical to the geodetic
  * case.
  *
  * Scale stance: all three keys block on the 100 km grid cell — a spatial
  * LSH. Candidate volume per probe is bounded by 3×3-neighborhood
  * occupancy, never corpus²; at growing entity counts production shrinks
  * the cell edge to hold occupancy constant (the `Ivf.autoNlist` sizing
  * argument in space). Cell-grain aggregates are ≤ grid² rows at any
  * corpus size.
  */
object Geo {
  type Q = (SparkSession, String) => DataFrame

  /** 1 000 km square, 100 km cells ⇒ 10×10 grid. */
  private val Side = 1000000L
  private val Cell = 100000L

  /** Deterministic planar meters from the entity key: 48 md5 bits mod the
    * square side. `tag` disambiguates entity type and axis. */
  private def coord(tag: String, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(tag), key.cast("string"))), 1, 12), 16, 10)
      .cast("long"), lit(Side))

  private def coordSql(tag: String, key: String): String =
    s"CAST(concat('0x', substring(md5(concat('$tag', CAST($key AS VARCHAR))), 1, 12)) AS BIGINT) % $Side"

  /** Suppliers / customers with coordinates and grid cells. */
  private def suppliers(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_suppkey"),
      coord("gxs:", col("s_suppkey")).as("sx"),
      coord("gys:", col("s_suppkey")).as("sy"))
      .withColumn("scx", expr(s"sx div $Cell"))
      .withColumn("scy", expr(s"sy div $Cell"))

  private def customers(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      coord("gxc:", col("c_custkey")).as("cx"),
      coord("gyc:", col("c_custkey")).as("cy"))
      .withColumn("ccx", expr(s"cx div $Cell"))
      .withColumn("ccy", expr(s"cy div $Cell"))

  private val suppliersSql: String =
    s"""SELECT s_suppkey,
       |       ${coordSql("gxs:", "s_suppkey")} AS sx,
       |       ${coordSql("gys:", "s_suppkey")} AS sy
       |FROM supplier""".stripMargin

  private val customersSql: String =
    s"""SELECT c_custkey,
       |       ${coordSql("gxc:", "c_custkey")} AS cx,
       |       ${coordSql("gyc:", "c_custkey")} AS cy
       |FROM customer""".stripMargin

  val queries: Map[String, Q] = Map(
    // M1 — grid density map: entity counts per 100 km cell — the spatial
    // histogram every coverage/siting readout starts from. Two map-side
    // projections union into ONE cell-grain aggregation (≤ grid² = 100
    // rows at any corpus size); no join, no window.
    "geo_grid_stats" -> ((s, d) => {
      val sup = suppliers(s, d)
        .select(col("scx").as("gx"), col("scy").as("gy"),
          lit(1L).as("is_s"), lit(0L).as("is_c"))
      val cus = customers(s, d)
        .select(col("ccx").as("gx"), col("ccy").as("gy"),
          lit(0L).as("is_s"), lit(1L).as("is_c"))
      sup.unionByName(cus)
        .groupBy("gx", "gy")
        .agg(sum("is_s").as("n_suppliers"), sum("is_c").as("n_customers"))
        .orderBy("gx", "gy")
    }),

    // M2 — nearest supplier per customer via the 3×3 neighbor-cell
    // blocked join (spatial k-NN, k=1): each customer explodes its 9
    // neighbor cells, equi-joins suppliers on the cell key (candidates ∝
    // cell occupancy, never n²), argmin over the EXACT long dx²+dy² with
    // the supplier key as integer tiebreak (min over a (dist², key)
    // struct). Customers with an empty neighborhood keep their row with
    // found=0 — the miss rate is a first-class number (the cell-sizing
    // signal). dist_m = ⌊√dist²⌋ — one IEEE sqrt of an exact long.
    "geo_knn_grid" -> ((s, d) => {
      val cand = customers(s, d)
        .withColumn("dx", explode(expr("sequence(-1, 1)")))
        .withColumn("dy", explode(expr("sequence(-1, 1)")))
        .withColumn("jx", col("ccx") + col("dx"))
        .withColumn("jy", col("ccy") + col("dy"))
        .join(suppliers(s, d), col("jx") === col("scx") && col("jy") === col("scy"))
        .withColumn("d2", (col("cx") - col("sx")) * (col("cx") - col("sx"))
          + (col("cy") - col("sy")) * (col("cy") - col("sy")))
      val best = cand.groupBy("c_custkey")
        .agg(min(struct(col("d2"), col("s_suppkey"))).as("b"))
        .select(col("c_custkey"), col("b.s_suppkey").as("nearest_suppkey"),
          col("b.d2").as("d2"))
      customers(s, d).select("c_custkey")
        .join(best, Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          when(col("nearest_suppkey").isNotNull, lit(1L)).otherwise(lit(0L)).as("found"),
          col("nearest_suppkey"),
          floor(sqrt(col("d2").cast("double"))).cast("long").as("dist_m"))
        .orderBy("c_custkey")
    }),

    // M3 — all supplier pairs within 100 km (spatial self-join): canonical
    // a<b pairs from the same 3×3 blocked join (each qualifying pair is
    // matched by exactly ONE (dx,dy) offset — no dedup pass needed), exact
    // integer radius test d² ≤ R². The blocked candidate volume is
    // Σ occupancy² over cells — the spatial analog of LSH banding; at
    // sf0.001 the square is sparse enough that zero pairs qualify, which
    // is itself the correct answer (oracle agrees).
    "geo_radius_pairs" -> ((s, d) => {
      val a = suppliers(s, d)
        .select(col("s_suppkey").as("s1"), col("sx").as("x1"), col("sy").as("y1"),
          col("scx"), col("scy"))
        .withColumn("dx", explode(expr("sequence(-1, 1)")))
        .withColumn("dy", explode(expr("sequence(-1, 1)")))
        .withColumn("jx", col("scx") + col("dx"))
        .withColumn("jy", col("scy") + col("dy"))
      val b = suppliers(s, d)
        .select(col("s_suppkey").as("s2"), col("sx").as("x2"), col("sy").as("y2"),
          col("scx").as("bx"), col("scy").as("by"))
      a.join(b, col("jx") === col("bx") && col("jy") === col("by")
          && col("s1") < col("s2"))
        .withColumn("d2", (col("x1") - col("x2")) * (col("x1") - col("x2"))
          + (col("y1") - col("y2")) * (col("y1") - col("y2")))
        .where(col("d2") <= lit(Cell * Cell))
        .select(col("s1"), col("s2"),
          floor(sqrt(col("d2").cast("double"))).cast("long").as("dist_m"))
        .orderBy("s1", "s2")
    }),

    // M4 — DBSCAN density classification (the clustering's step 1): each
    // supplier classified core (≥ 3 neighbors within 100 km) / border /
    // isolated from the SAME lossless 3×3 blocked self-join —
    // neighborhood counts are the canonical-pair table read from both
    // ends, so pair work is paid once. Suppliers with no qualifying pair
    // keep their row at 0 via the left join (the noise class is the
    // density-threshold-sizing signal, like geo_knn_grid's miss rate).
    "geo_density_core" -> ((s, d) => {
      val a = suppliers(s, d)
        .select(col("s_suppkey").as("s1"), col("sx").as("x1"), col("sy").as("y1"),
          col("scx"), col("scy"))
        .withColumn("dx", explode(expr("sequence(-1, 1)")))
        .withColumn("dy", explode(expr("sequence(-1, 1)")))
        .withColumn("jx", col("scx") + col("dx"))
        .withColumn("jy", col("scy") + col("dy"))
      val b = suppliers(s, d)
        .select(col("s_suppkey").as("s2"), col("sx").as("x2"), col("sy").as("y2"),
          col("scx").as("bx"), col("scy").as("by"))
      val pairs = a.join(b, col("jx") === col("bx") && col("jy") === col("by")
          && col("s1") < col("s2"))
        .where((col("x1") - col("x2")) * (col("x1") - col("x2"))
          + (col("y1") - col("y2")) * (col("y1") - col("y2")) <= lit(Cell * Cell))
        .select("s1", "s2")
      val deg = pairs.select(col("s1").as("k")).unionByName(pairs.select(col("s2").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n_neighbors"))
      suppliers(s, d).select(col("s_suppkey"))
        .join(deg, col("s_suppkey") === col("k"), "left")
        .select(col("s_suppkey"),
          coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
          when(coalesce(col("n_neighbors"), lit(0L)) >= 3, lit("core"))
            .when(coalesce(col("n_neighbors"), lit(0L)) >= 1, lit("border"))
            .otherwise(lit("isolated")).as("density_class"))
        .orderBy("s_suppkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "geo_grid_stats" ->
      s"""WITH sup AS ($suppliersSql),
        |cus AS ($customersSql),
        |u AS (
        |  SELECT sx // $Cell AS gx, sy // $Cell AS gy, 1 AS is_s, 0 AS is_c FROM sup
        |  UNION ALL
        |  SELECT cx // $Cell, cy // $Cell, 0, 1 FROM cus
        |)
        |SELECT gx, gy, CAST(sum(is_s) AS BIGINT) AS n_suppliers,
        |       CAST(sum(is_c) AS BIGINT) AS n_customers
        |FROM u GROUP BY 1, 2 ORDER BY gx, gy""".stripMargin,
    "geo_knn_grid" ->
      s"""WITH sup AS ($suppliersSql),
        |cus AS ($customersSql),
        |cand AS (
        |  SELECT c.c_custkey, s.s_suppkey,
        |         (c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy) AS d2
        |  FROM cus c
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
        |  JOIN sup s ON c.cx // $Cell + ox.dx = s.sx // $Cell
        |            AND c.cy // $Cell + oy.dy = s.sy // $Cell
        |),
        |best AS (
        |  SELECT c_custkey, s_suppkey, d2,
        |         row_number() OVER (PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rn
        |  FROM cand
        |)
        |SELECT c.c_custkey,
        |       CASE WHEN b.s_suppkey IS NOT NULL THEN 1 ELSE 0 END AS found,
        |       b.s_suppkey AS nearest_suppkey,
        |       CAST(floor(sqrt(CAST(b.d2 AS DOUBLE))) AS BIGINT) AS dist_m
        |FROM cus c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON c.c_custkey = b.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "geo_radius_pairs" ->
      s"""WITH sup AS ($suppliersSql)
        |SELECT a.s_suppkey AS s1, b.s_suppkey AS s2,
        |       CAST(floor(sqrt(CAST(
        |         (a.sx - b.sx) * (a.sx - b.sx) + (a.sy - b.sy) * (a.sy - b.sy)
        |       AS DOUBLE))) AS BIGINT) AS dist_m
        |FROM sup a
        |CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
        |CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
        |JOIN sup b ON a.sx // $Cell + ox.dx = b.sx // $Cell
        |          AND a.sy // $Cell + oy.dy = b.sy // $Cell
        |          AND a.s_suppkey < b.s_suppkey
        |WHERE (a.sx - b.sx) * (a.sx - b.sx) + (a.sy - b.sy) * (a.sy - b.sy)
        |      <= ${Cell * Cell}
        |ORDER BY s1, s2""".stripMargin,
    "geo_density_core" ->
      s"""WITH sup AS ($suppliersSql),
        |pr AS (
        |  SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
        |  FROM sup a
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) ox
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) oy
        |  JOIN sup b ON a.sx // $Cell + ox.dx = b.sx // $Cell
        |            AND a.sy // $Cell + oy.dy = b.sy // $Cell
        |            AND a.s_suppkey < b.s_suppkey
        |  WHERE (a.sx - b.sx) * (a.sx - b.sx) + (a.sy - b.sy) * (a.sy - b.sy)
        |        <= ${Cell * Cell}
        |),
        |deg AS (
        |  SELECT k, count(*) AS n FROM (
        |    SELECT s1 AS k FROM pr UNION ALL SELECT s2 FROM pr
        |  ) GROUP BY 1
        |)
        |SELECT s.s_suppkey, coalesce(deg.n, 0) AS n_neighbors,
        |       CASE WHEN coalesce(deg.n, 0) >= 3 THEN 'core'
        |            WHEN coalesce(deg.n, 0) >= 1 THEN 'border'
        |            ELSE 'isolated' END AS density_class
        |FROM sup s LEFT JOIN deg ON s.s_suppkey = deg.k
        |ORDER BY s.s_suppkey""".stripMargin,
  )
}
