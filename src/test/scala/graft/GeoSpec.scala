package graft

import org.apache.spark.sql.functions._

/** Spatial family (queries.Geo): driver recomputes of the md5-planar
  * coordinates plus the blocking-completeness theorem — the 3×3
  * neighbor-cell join is LOSSLESS for radius ≤ cell edge (|dx| ≤ cell ⇒
  * cell index delta ≤ 1), so the blocked outputs must equal full
  * brute force, not approximate it. */
class GeoSpec extends SparkSpec {

  private val Side = 1000000L
  private val Cell = 100000L

  /** Same 48-bit md5 coordinate synthesis as queries.Geo. */
  private def coord(tag: String, key: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 12)
    java.lang.Long.parseLong(hex, 16) % Side
  }

  private def numAt(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private def supplierCoords(): Seq[(Long, Long, Long)] =
    Tables.supplier(spark, sf0001).select("s_suppkey").collect()
      .map(r => numAt(r, 0)).toSeq
      .map(k => (k, coord("gxs:", k), coord("gys:", k)))

  private def customerCoords(): Seq[(Long, Long, Long)] =
    Tables.customer(spark, sf0001).select("c_custkey").collect()
      .map(r => numAt(r, 0)).toSeq
      .map(k => (k, coord("gxc:", k), coord("gyc:", k)))

  test("geo_grid_stats matches a driver recompute of the md5 coordinates") {
    val cells = supplierCoords().map(t => (t._2 / Cell, t._3 / Cell, 1L, 0L)) ++
      customerCoords().map(t => (t._2 / Cell, t._3 / Cell, 0L, 1L))
    val expect = cells.groupBy(t => (t._1, t._2)).view
      .mapValues(vs => (vs.map(_._3).sum, vs.map(_._4).sum)).toMap
    val got = SparkEntry.queries("geo_grid_stats")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(got.values.map(v => v._1 + v._2).sum ==
      (supplierCoords().size + customerCoords().size).toLong)
  }

  test("geo_knn_grid matches a driver blocked-argmin recompute; block misses flagged") {
    val sup = supplierCoords()
    val expect = customerCoords().map { case (ck, cx, cy) =>
      val (ccx, ccy) = (cx / Cell, cy / Cell)
      val cand = sup.filter { case (_, sx, sy) =>
        math.abs(sx / Cell - ccx) <= 1 && math.abs(sy / Cell - ccy) <= 1
      }
      if (cand.isEmpty) ck -> (0L, None: Option[Long], None: Option[Long])
      else {
        val (bk, d2) = cand.map { case (sk, sx, sy) =>
          (sk, (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy))
        }.minBy { case (sk, d2) => (d2, sk) } match { case (sk, d2) => (sk, d2) }
        ck -> (1L, Some(bk), Some(math.floor(math.sqrt(d2.toDouble)).toLong))
      }
    }.toMap
    val got = SparkEntry.queries("geo_knn_grid")(spark, sf0001)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getLong(0) -> (r.getLong(1), opt(2), opt(3))
      }.toMap
    assert(got == expect)
    // both branches live at fixture scale (10 suppliers / 100 cells)
    assert(got.values.exists(_._1 == 1L), "no customer found a neighbor — fixture degenerate")
    assert(got.values.exists(_._1 == 0L), "every neighborhood occupied — miss branch untested")
  }

  test("geo_radius_pairs equals FULL brute force — 3×3 blocking is lossless at radius = cell") {
    val sup = supplierCoords()
    val expect = (for {
      (k1, x1, y1) <- sup; (k2, x2, y2) <- sup if k1 < k2
      d2 = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
      if d2 <= Cell * Cell
    } yield (k1, k2) -> math.floor(math.sqrt(d2.toDouble)).toLong).toMap
    val got = SparkEntry.queries("geo_radius_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    got.values.foreach(d => assert(d <= Cell, d))
  }

  test("geo_density_core matches brute-force neighborhood counts; classes consistent") {
    val sup = supplierCoords()
    val expect = sup.map { case (k, x, y) =>
      val n = sup.count { case (k2, x2, y2) =>
        k2 != k && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= Cell * Cell
      }.toLong
      k -> (n, if (n >= 3) "core" else if (n >= 1) "border" else "isolated")
    }.toMap
    val got = SparkEntry.queries("geo_density_core")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got == expect)
    // degree table must agree with the pairs key read from both ends
    val pairDeg = SparkEntry.queries("geo_radius_pairs")(spark, sf0001)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { case (k, (n, _)) => assert(n == pairDeg.getOrElse(k, 0L), k) }
  }

  // ---- geodetic variant (r9) ----------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Same geodetic synthesis + quantized-ECEF projection as queries.Geo —
    * java.lang.Math trig, matching Spark's evaluation exactly. */
  private def geoEcef(tagLat: String, tagLon: String, key: Long)
      : (Long, Long, Long, Long, Long) = {
    def bits(tag: String) = java.lang.Long.parseLong(md5hex(s"$tag$key").take(12), 16)
    val lat = bits(tagLat) % 120000000L - 60000000L
    val lon = bits(tagLon) % 360000000L - 180000000L
    val latr = lat.toDouble / 1e6 * math.Pi / 180.0
    val lonr = lon.toDouble / 1e6 * math.Pi / 180.0
    def fdiv(c: Long) = { val m = ((c % 5000000L) + 5000000L) % 5000000L; (c - m) / 5000000L }
    (math.floor(6371000.0 * math.cos(latr) * math.cos(lonr)).toLong,
      math.floor(6371000.0 * math.cos(latr) * math.sin(lonr)).toLong,
      math.floor(6371000.0 * math.sin(latr)).toLong,
      fdiv(lat), fdiv(lon))
  }

  test("geo_knn_haversine: exact=1 rows equal GLOBAL brute force; exact=0 rows are past the envelope") {
    val sup = Tables.supplier(spark, sf0001).select("s_suppkey").collect()
      .map(r => numAt(r, 0)).toSeq.map(k => k -> geoEcef("hlats:", "hlons:", k))
    val cus = Tables.customer(spark, sf0001).select("c_custkey").collect()
      .map(r => numAt(r, 0)).toSeq.map(k => k -> geoEcef("hlatc:", "hlonc:", k))
    def d2(a: (Long, Long, Long, Long, Long), b: (Long, Long, Long, Long, Long)): Long = {
      val dx = a._1 - b._1; val dy = a._2 - b._2; val dz = a._3 - b._3
      dx * dx + dy * dy + dz * dz
    }
    def arcM(dd: Long): Long =
      math.floor(12742000.0 * math.asin(math.sqrt(dd.toDouble) / 12742000.0)).toLong
    // global (unblocked) nearest with the (d2, key) tie-break
    val brute = cus.map { case (ck, cpos) =>
      ck -> sup.map { case (sk, spos) => (d2(cpos, spos), sk) }.min
    }.toMap
    val rows = SparkEntry.queries("geo_knn_haversine")(spark, sf0001).collect()
    assert(rows.length == cus.size)
    var nExact = 0
    rows.foreach { r =>
      val ck = r.getLong(0); val found = r.getLong(1)
      val exact = r.getLong(4)
      if (exact == 1) {
        nExact += 1
        assert(found == 1)
        val (bd2, bsk) = brute(ck)
        assert(r.getLong(2) == bsk,
          s"customer $ck: exact=1 but blocked pick ${r.getLong(2)} != global nearest $bsk")
        assert(r.getLong(3) == arcM(bd2))
        assert(r.getLong(3) <= 277000L)
      } else if (found == 1) {
        // declared blocked approximation: only legal PAST the envelope
        assert(r.getLong(3) > 277000L,
          s"customer $ck: found=1 exact=0 inside the 277 km envelope")
      }
    }
    // the envelope must be live in the fixture, or the theorem is untested
    assert(nExact > 0, "no exact=1 row at sf0.001 — completeness claim unexercised")
  }

  test("geo_diameter matches a driver brute-force farthest pair per region") {
    val reg = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => numAt(r, 0) -> numAt(r, 1)).toMap
    val nat = Tables.supplier(spark, sf0001)
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => numAt(r, 0) -> reg(numAt(r, 1))).toMap
    val pts = supplierCoords().map { case (k, x, y) => (nat(k), k, x, y) }
    val expect = pts.groupBy(_._1).collect { case (region, ps) if ps.length >= 2 =>
      val pairs = for {
        a <- ps; b <- ps; if a._2 < b._2
      } yield {
        val (dx, dy) = (a._3 - b._3, a._4 - b._4)
        (a._2, b._2, dx * dx + dy * dy)
      }
      val best = pairs.minBy(p => (-p._3, p._1, p._2))
      region -> ((ps.length.toLong, best._1, best._2, best._3))
    }
    val got = SparkEntry.queries("geo_diameter")(spark, sf0001).collect()
      .map(r => numAt(r, 0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect.toMap)
    // the diameter dominates every sampled pair distance
    assert(got.values.forall(_._4 > 0))
  }

  test("Hull.monotoneChain: vertices only, degenerate inputs, interior/collinear dropped") {
    import graft.ops.Hull
    // unit square + interior + edge-midpoint + duplicate corner
    val hull = Hull.monotoneChain(Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L),
      (5L, 5L), (5L, 0L), (0L, 0L))).toSet
    assert(hull == Set((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L)))
    // all collinear -> the two extremes
    assert(Hull.monotoneChain(Seq((0L, 0L), (2L, 2L), (5L, 5L), (3L, 3L))).toSet ==
      Set((0L, 0L), (5L, 5L)))
    // <= 2 distinct points pass through
    assert(Hull.monotoneChain(Seq((7L, 7L), (7L, 7L))) == Seq((7L, 7L)))
    assert(Hull.monotoneChain(Seq((1L, 2L))) == Seq((1L, 2L)))
    // random cloud: every input point lies inside or on the hull
    val rnd = new scala.util.Random(11)
    val cloud = Seq.fill(200)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val h = Hull.monotoneChain(cloud)
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    cloud.foreach { p =>
      val inside = h.indices.forall { k =>
        cross(h(k), h((k + 1) % h.size), p) >= 0 }
      assert(inside, s"$p outside hull $h")
    }
    assert(h.size < cloud.distinct.size, "hull should compress a random cloud")
  }

  test("geo_hull_diameter equals geo_diameter exactly (hull shortcut is lossless)") {
    def snap(key: String) = SparkEntry.queries(key)(spark, sf0001).collect()
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toLong,
        r.get(2).toString.toLong, r.get(3).toString.toLong, r.get(4).toString.toLong)).toSeq
    val viaHull = snap("geo_hull_diameter")
    val brute = snap("geo_diameter")
    assert(viaHull == brute, s"hull diameter diverged:\n$viaHull\nvs\n$brute")
    assert(viaHull.nonEmpty)
  }

  test("geo_point_in_poly: polygon is simple; parity matches JDK Path2D geometry") {
    val v = graft.queries.Geo.PolyVerts
    // simplicity: no two non-adjacent edges intersect (exact long segment
    // intersection via orientation signs)
    def orient(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long): Long =
      java.lang.Long.signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
    val edges = v.zip(v.tail :+ v.head)
    for (i <- edges.indices; j <- edges.indices if j > i + 1 && !(i == 0 && j == edges.size - 1)) {
      val ((a, b), (c, dd)) = (edges(i), edges(j))
      val o1 = orient(a._1, a._2, b._1, b._2, c._1, c._2)
      val o2 = orient(a._1, a._2, b._1, b._2, dd._1, dd._2)
      val o3 = orient(c._1, c._2, dd._1, dd._2, a._1, a._2)
      val o4 = orient(c._1, c._2, dd._1, dd._2, b._1, b._2)
      assert(!(o1 != o2 && o3 != o4), s"edges $i and $j intersect — polygon not simple")
    }
    // every classified customer agrees with the JDK's own even-odd
    // geometry (Path2D.WIND_EVEN_ODD) — an independent oracle
    val path = new java.awt.geom.Path2D.Double(java.awt.geom.Path2D.WIND_EVEN_ODD)
    path.moveTo(v.head._1.toDouble, v.head._2.toDouble)
    v.tail.foreach { case (x, y) => path.lineTo(x.toDouble, y.toDouble) }
    path.closePath()
    def md5coord(tag: String, key: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$key".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val rows = SparkEntry.queries("geo_point_in_poly")(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.map(_.getLong(1)).sum > 0)
    // re-derive per-customer insideness driver-side and re-aggregate
    val cust = Tables.customer(spark, sf0001).select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.get(1).toString.toLong))
    val expect = cust.groupBy(_._2).map { case (nat, cs) =>
      val ins = cs.filter { case (k, _) =>
        path.contains(md5coord("gxc:", k).toDouble, md5coord("gyc:", k).toDouble) }
      nat -> ((cs.length.toLong, ins.length.toLong, ins.map(_._1).sum))
    }
    val got = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect, s"$got\nvs\n$expect")
    // the fixture exercises both classes
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._2).sum < cust.length)
  }

  test("geo_geohash integer closed form equals the textbook float bisection") {
    // reference implementation: standard geohash binary subdivision
    def textbook(lat: Double, lon: Double, chars: Int): String = {
      val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      var evenBit = true
      val sb = new StringBuilder
      var idx = 0; var bit = 0
      while (sb.length < chars) {
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { idx = idx * 2 + 1; lonLo = mid }
          else { idx = idx * 2; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { idx = idx * 2 + 1; latLo = mid }
          else { idx = idx * 2; latHi = mid }
        }
        evenBit = !evenBit
        bit += 1
        if (bit == 5) { sb.append(alphabet(idx)); bit = 0; idx = 0 }
      }
      sb.toString
    }
    val rows = SparkEntry.queries("geo_geohash")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lat, lon) = (r.getLong(1), r.getLong(2))
      val expect = textbook(lat.toDouble / 1e6, lon.toDouble / 1e6, 6)
      assert(r.getString(3) == expect,
        s"supplier ${r.getLong(0)}: ${r.getString(3)} != textbook $expect")
    }
    // prefix-share = proximity is real on the fixture: at least two
    // suppliers land in distinct hashes (non-degenerate)
    assert(rows.map(_.getString(3)).distinct.length > 1)

    // boundary clamp (r9 ADVICE): the closed-form axis value reads 2¹⁵ at
    // exactly lat=+90 / lon=+180 and must clamp to the topmost cell
    // (32767) — which is also where the textbook bisection puts the
    // boundary (lat >= mid always takes the upper half). Evaluate the
    // key's own clamped expressions on the corner fixtures.
    import spark.implicits._
    val lonBits = "least((((lon + 180000000L) * 32768L) div 360000000L), 32767L)"
    val latBits = "least((((lat + 90000000L) * 32768L) div 180000000L), 32767L)"
    val corners = Seq((90000000L, 180000000L), (90000000L, -180000000L),
      (-90000000L, 180000000L), (0L, 0L))
      .toDF("lat", "lon")
      .selectExpr(s"$latBits AS latb", s"$lonBits AS lonb", "lat", "lon")
      .collect()
    corners.foreach { r =>
      val (latb, lonb) = (r.getLong(0), r.getLong(1))
      assert(latb >= 0 && latb <= 32767, s"lat bits out of field: $latb")
      assert(lonb >= 0 && lonb <= 32767, s"lon bits out of field: $lonb")
      if (r.getLong(2) == 90000000L) assert(latb == 32767L)
      if (r.getLong(3) == 180000000L) assert(lonb == 32767L)
    }
  }

  test("geo_idw matches a driver recompute of the blocked integer-weight interpolation") {
    val stations = supplierCoords().map { case (k, sx, sy) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"gz:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val zq = java.lang.Long.parseLong(hex, 16) % 100000001L
      (sx / Cell, sy / Cell, sx, sy, zq)
    }
    val expect = (0 until 100).map { i =>
      val (gx, gy) = (i % 10L, i / 10L)
      val (px, py) = (gx * Cell + Cell / 2, gy * Cell + Cell / 2)
      val cand = stations.filter(st =>
        math.abs(st._1 - gx) <= 1 && math.abs(st._2 - gy) <= 1)
      if (cand.isEmpty) (gx, gy, 0L, None: Option[Double])
      else {
        val ws = cand.map { case (_, _, sx, sy, zq) =>
          val d2 = (px - sx) * (px - sx) + (py - sy) * (py - sy)
          val wq = 1000000000000000L / math.max(d2, 1L)
          (BigInt(wq), BigInt(wq) * BigInt(zq))
        }
        val w = ws.map(_._1).sum
        val wz = ws.map(_._2).sum
        val idw = math.floor(wz.toDouble / w.toDouble / 1e6 * 1e4) / 1e4
        (gx, gy, cand.size.toLong, Some(idw))
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("geo_idw")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == expect)
    // both raster states live on the fixture: covered cells and holes
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0))
  }

  test("geo_speed_outliers matches a driver recompute of the integer speed quotients") {
    val pts = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def c(tag: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$tag$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16) % Side
    }
    val expect = pts.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ord = evs.sortBy(e => (e._2, e._3)).toSeq
      val speeds = ord.zip(ord.drop(1)).map { case ((_, us0, id0), (_, us1, id1)) =>
        val (dx, dy) = (c("px:", id1) - c("px:", id0), c("py:", id1) - c("py:", id0))
        val d = math.floor(math.sqrt((dx * dx + dy * dy).toDouble)).toLong
        d * 1000000L / math.max(us1 - us0, 1L)
      }
      // single-event users have no steps — the key drops them too
      if (speeds.isEmpty) None
      else {
        val out = speeds.count(_ > 50L).toLong
        Some((uid, speeds.size.toLong, out,
          math.floor(out.toDouble / speeds.size * 1e4) / 1e4, speeds.max))
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("geo_speed_outliers")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    assert(got == expect)
    // the screen discriminates: both clean steps and violations exist
    assert(got.exists(_._3 > 0) && got.exists(t => t._3 < t._2))
  }
}
