package graft

import org.apache.spark.sql.functions._

/** Graph operators (SURVEY §2 L) + the r5 analytic keys: invariants that
  * hold by construction, checked against independent driver-side
  * recomputations where feasible. */
class GraphSpec extends SparkSpec {

  /** Driver-side supported co-purchase edges: canonical (u < v) part
    * pairs sharing ≥ 2 distinct orders, baskets capped at ≤ 8 parts —
    * the same graph `Graph.copurchaseEdges` builds (support ≥ 2 since
    * r6, aligned across triangles / common-neighbors / adamic-adar / cc). */
  private def supportedEdges(sfDir: String): Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val pairSupport = scala.collection.mutable.Map.empty[(Long, Long), Int].withDefaultValue(0)
    byOrder.values.filter(_.size <= 8).foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        pairSupport((parts(i), parts(j))) += 1
    }
    pairSupport.filter(_._2 >= 2).keys.toSet
  }

  test("graph_pagerank: ranks are positive and sum to 1 (mass conservation)") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf0001)
    val rows = pr.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0.0), "a rank went non-positive")
    // symmetrized graph has no dangling nodes, so total rank mass is
    // conserved exactly (up to float drift + the output rounding)
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass $total drifted from 1")
  }

  test("graph_pagerank: a uniform cycle graph converges to uniform ranks") {
    // 4-node directed cycle written as a lineitem-shaped table is overkill;
    // instead run the same iteration arithmetic driver-side and compare
    // the fixture's top node against a direct recomputation
    val e0 = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0.flatMap { case (s, p) => Seq(s"s$s" -> s"p$p", s"p$p" -> s"s$s") }
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    val n = deg.size
    var rank = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      edges.foreach { case (src, dst) => contrib(dst) += rank(src) / deg(src) }
      rank = contrib.map { case (k, v) => k -> (0.15 / n + 0.85 * v) }.toMap
    }
    val got = SparkEntry.queries("graph_pagerank")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet)
    rank.foreach { case (node, r) =>
      assert(math.abs(got(node) - r) < 1e-6, s"$node: spark ${got(node)} vs driver $r")
    }
  }

  test("graph_ppr matches a driver-side seeded recompute; mass conserved; seeds keep the restart floor") {
    val e0 = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = e0.flatMap { case (s, p) => Seq(s"s$s" -> s"p$p", s"p$p" -> s"s$s") }
    val deg = edges.groupBy(_._1).view.mapValues(_.length).toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = deg.keys.toSeq.sortBy(n => (md5hex(n + "|ppr"), n)).take(5).toSet
    var rank: Map[String, Double] = seeds.map(_ -> 1.0 / 5).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      edges.foreach { case (src, dst) =>
        rank.get(src).foreach(r => contrib(dst) += r / deg(src)) }
      rank = (contrib.keySet ++ seeds).map { n =>
        n -> (contrib.getOrElse(n, 0.0) * 0.85 +
          (if (seeds(n)) 0.15 / 5.0 else 0.0))
      }.toMap
    }
    val got = SparkEntry.queries("graph_ppr")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet)
    rank.foreach { case (node, r) =>
      assert(math.abs(got(node) - r) < 1e-6, s"$node: spark ${got(node)} vs driver $r") }
    // restart vector sums to 1 and no dangling nodes ⇒ mass conserved
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"PPR mass ${got.values.sum}")
    // every seed keeps at least its own restart mass
    seeds.foreach(sd => assert(got(sd) >= 0.15 / 5.0 - 1e-9, s"seed $sd below restart floor"))
    // sparsity: the walk reaches a strict subset of the graph or at most all of it
    assert(got.size <= deg.size)
    assert(got.size > 5, "walk never left the seed set")
  }

  test("graph_triangles matches a driver-side brute-force count") {
    val edges = supportedEdges(sf0001)
    assert(edges.nonEmpty, "supported graph degenerate — fixture exercises nothing")
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b); c <- cs if adj.getOrElse(a, Set.empty).contains(c)
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val got = SparkEntry.queries("graph_triangles")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == triCount.toMap, s"per-node triangle counts diverge")
  }

  test("graph_common_neighbors matches driver brute force and excludes existing edges") {
    val edges = supportedEdges(sf0001)
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    neighbors.foreach { case (w, ns) =>
      if (ns.size <= 64) {
        val sorted = ns.toSeq.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.size)
          counts((sorted(i), sorted(j))) += 1
      }
    }
    val nonEdge = counts.filter { case (p, _) => !edges.contains(p) }
    val expectTop = nonEdge.toSeq
      .sortBy { case ((u, v), c) => (-c, u, v) }.take(100)
      .map { case ((u, v), c) => (u, v, c) }
    val got = SparkEntry.queries("graph_common_neighbors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectTop)
  }

  test("graph_jaccard matches driver brute force (hub-pruned intersections, full-degree unions)") {
    val edges = supportedEdges(sf0001)
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    neighbors.foreach { case (_, ns) =>
      if (ns.size <= 64) {
        val sorted = ns.toSeq.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.size)
          counts((sorted(i), sorted(j))) += 1
      }
    }
    val expectTop = counts.filter { case (p, _) => !edges.contains(p) }.toSeq
      .map { case ((u, v), c) =>
        val un = neighbors(u).size + neighbors(v).size - c
        (u, v, c, un, math.floor(1e9 * c / un).toLong)
      }
      .sortBy { case (u, v, _, _, ju) => (-ju, u, v) }.take(100)
    val got = SparkEntry.queries("graph_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expectTop)
    // jaccard must reorder at least one pair vs raw common counts on this
    // fixture (else normalization did nothing — flag it, don't silently pass)
    val unweighted = SparkEntry.queries("graph_common_neighbors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(t => (t._1, t._2)) != unweighted || got.isEmpty || unweighted.isEmpty,
      "Jaccard ordering identical to common-neighbors — normalization had no effect on fixture")
  }

  test("graph_adamic_adar matches driver brute force (quantized 1/ln(deg) weights)") {
    val edges = supportedEdges(sf0001)
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val scores = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    neighbors.foreach { case (_, ns) =>
      if (ns.size >= 2 && ns.size <= 64) {
        val units = math.floor(1e9 / math.log(ns.size.toDouble)).toLong
        val sorted = ns.toSeq.sorted
        for (i <- sorted.indices; j <- i + 1 until sorted.size)
          scores((sorted(i), sorted(j))) += units
      }
    }
    val expectTop = scores.filter { case (p, _) => !edges.contains(p) }.toSeq
      .sortBy { case ((u, v), s) => (-s, u, v) }.take(100)
      .map { case ((u, v), s) => (u, v, s) }
    val got = SparkEntry.queries("graph_adamic_adar")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expectTop)
    // hubs must score below their common-neighbor rank somewhere: at least
    // one pair ordering differs from the unweighted key (else the weight
    // did nothing on this fixture — flag it rather than silently pass)
    val unweighted = SparkEntry.queries("graph_common_neighbors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(t => (t._1, t._2)) != unweighted || got.isEmpty || unweighted.isEmpty,
      "Adamic-Adar ordering identical to common-neighbors — weighting had no effect on fixture")
  }

  test("graph_label_prop matches a driver-side 3-round synchronous LPA") {
    val edges = supportedEdges(sf0001)
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = neighbors.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = neighbors.map { case (node, ns) =>
        val counts = ns.groupBy(labels).view.mapValues(_.size)
        // most frequent neighbor label, ties to the smallest label
        node -> counts.toSeq.sortBy { case (lbl, c) => (-c, lbl) }.head._1
      }
    }
    val allParts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().collect().map(_.getLong(0))
    val expect = allParts.map(p => p -> labels.getOrElse(p, p)).toMap
    val got = SparkEntry.queries("graph_label_prop")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // propagation must actually merge something on this fixture
    assert(got.values.toSet.size < got.size,
      "every node kept its own label — LPA did nothing; fixture degenerate?")
  }

  test("graph_assortativity matches a driver-side exact-moment Pearson over endpoint degrees") {
    val edges = supportedEdges(sf0001)
    val sym = edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (m2, sx, sxx, sxy) = sym.foldLeft((0L, BigInt(0), BigInt(0), BigInt(0))) {
      case ((c, x, xx, xy), (a, b)) =>
        (c + 1, x + deg(a), xx + BigInt(deg(a)) * deg(a), xy + BigInt(deg(a)) * deg(b))
    }
    val r = math.floor((m2.toDouble * sxy.toDouble - sx.toDouble * sx.toDouble)
      / (m2.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) * 1e4) / 1e4
    val rows = SparkEntry.queries("graph_assortativity")(spark, sf0001).collect()
    assert(rows.length == 1)
    assert((rows(0).getLong(0), rows(0).getDouble(1)) == (m2 / 2, r))
    assert(r >= -1.0001 && r <= 1.0001, s"assortativity $r out of [-1, 1]")
  }

  test("graph_modularity matches a driver recompute from the label_prop partition; Q in range") {
    val edges = supportedEdges(sf0001)
    val sym = edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val com = SparkEntry.queries("graph_label_prop")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.size.toDouble
    val eIntra = edges.toSeq.filter(e => com(e._1) == com(e._2))
      .groupBy(e => com(e._1)).view.mapValues(_.size.toLong).toMap
    val byCom = com.keys.groupBy(com)
    val expect = byCom.map { case (c, members) =>
      val dTot = members.toSeq.map(p => deg.getOrElse(p, 0L)).sum
      val e = eIntra.getOrElse(c, 0L)
      val q = math.floor((e.toDouble / m
        - (dTot.toDouble / (2.0 * m)) * (dTot.toDouble / (2.0 * m))) * 1e6) / 1e6
      c -> (members.size.toLong, e, dTot, q)
    }
    val got = SparkEntry.queries("graph_modularity")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expect)
    // Q = Σ q_c must land in the modularity range, and the LPA partition
    // must beat the trivial all-in-one partition (Q = 0) on this fixture
    val q = got.values.map(_._4).sum
    assert(q > 0.0 && q <= 1.0, s"modularity Q=$q out of (0, 1]")
  }

  test("graph_bfs_levels matches a driver-side BFS capped at 8 hops") {
    val edges = supportedEdges(sf0001)
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val src = edges.map(_._1).min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = Set(src)
    for (lvl <- 1L to 8L) {
      frontier = frontier.flatMap(n => neighbors.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = lvl)
    }
    val allParts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().collect().map(_.getLong(0))
    val expect = allParts.map(p => p -> dist.getOrElse(p, -1L)).toMap
    val got = SparkEntry.queries("graph_bfs_levels")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.values.exists(_ > 0), "BFS reached nothing — fixture degenerate?")
  }

  test("graph_cc matches a driver-side union-find over the supported graph") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val pairSupport = scala.collection.mutable.Map.empty[(Long, Long), Int].withDefaultValue(0)
    byOrder.values.filter(_.size <= 8).foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.size)
        pairSupport((parts(i), parts(j))) += 1
    }
    val supported = pairSupport.filter(_._2 >= 2).keys.toSeq
    // union-find with path compression
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    supported.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // min-id labeling: find() roots at the minimum because unions always
    // point the larger root at the smaller one
    val allParts = li.map(_._2).distinct
    val expect = allParts.map(p => p -> find(p)).toMap
    val got = SparkEntry.queries("graph_cc")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // sanity: the fixture has real structure — a non-trivial component
    // exists, and the support threshold actually dropped edges (at
    // sf0.001's co-purchase density the supported graph can still be one
    // giant component, so don't demand singletons — demand thresholding)
    val sizes = expect.values.groupBy(identity).map(_._2.size)
    assert(sizes.exists(_ >= 2), "no non-trivial component in fixture")
    assert(supported.size < pairSupport.size,
      "support >= 2 threshold dropped no edges — fixture exercises nothing")
  }

  test("graph_kcore matches a driver-side peel to fixpoint (k = 3)") {
    var edges = supportedEdges(sf0001)
    // driver-side peel to TRUE fixpoint — no round cap, so the test also
    // proves the key's 16-round cap covers this graph (the capped key
    // agreeing with an uncapped reference means convergence ≤ 16)
    var rounds = 0
    var stable = false
    while (!stable) {
      val deg = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val pruned = edges.filter(e => keep(e._1) && keep(e._2))
      if (pruned == edges) stable = true else { edges = pruned; rounds += 1 }
    }
    assert(rounds <= 16, s"peel needed $rounds rounds — the 16-round cap is too low")
    val coreDeg = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val allParts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().collect().map(_.getLong(0))
    val expect = allParts.map(p =>
      p -> (if (coreDeg.contains(p)) 1 else 0, coreDeg.getOrElse(p, 0L))).toMap
    val got = SparkEntry.queries("graph_kcore")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got == expect)
    // every member's within-core degree honors the k-core invariant
    assert(coreDeg.values.forall(_ >= 3), "a 3-core member has degree < 3")
  }

  test("win_seasonal_decompose: components recompose and seasonal indexes center") {
    val rows = SparkEntry.queries("win_seasonal_decompose")(spark, sf001).collect()
    assert(rows.length == 30)
    // where trend exists, value ≈ trend + seasonal + residual (all rounded at 4)
    rows.filter(!_.isNullAt(2)).foreach { r =>
      val (v, t, s, res) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(v - (t + s + res)) < 2e-4, s"day ${r.get(0)} does not recompose")
    }
    // edge days (first 3, last 3) have null trend and null residual
    assert(rows.count(_.isNullAt(2)) == 6)
  }

  test("agg_corr_matrix: 6 pairs, all within [-1, 1], self-consistent ordering") {
    val rows = SparkEntry.queries("agg_corr_matrix")(spark, sf001).collect()
    assert(rows.length == 6)
    val declOrder = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .zipWithIndex.toMap
    rows.foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 && v <= 1.0, s"corr out of range: $r")
      assert(declOrder(r.getString(0)) < declOrder(r.getString(1)),
        "pair not in declaration-order canonical form")
    }
  }

  test("graph_clustering_coeff matches a driver recompute from triangles and degrees") {
    val edges = supportedEdges(sf0001)
    val sym = edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, bs) <- adj; b <- bs
      cs <- adj.get(b); c <- cs if adj.getOrElse(a, Set.empty).contains(c)
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val expect = deg.filter(_._2 >= 2).map { case (x, dg) =>
      val tri = triCount(x)
      x -> (dg, tri,
        math.floor(2.0 * tri.toDouble / (dg.toDouble * (dg - 1L).toDouble) * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("graph_clustering_coeff")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expect)
    got.values.foreach { case (_, _, c) => assert(c >= 0.0 && c <= 1.0, c) }
    assert(got.values.exists(_._3 == 0.0) || got.values.forall(_._2 > 0),
      "expected some deg>=2 node without triangles (left-join path) on this fixture")
  }

  test("graph_degree_dist: histogram sums to node count, CCDF monotone from 1.0") {
    val edges = supportedEdges(sf0001)
    val sym = edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val hist = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = deg.size.toLong
    val got = SparkEntry.queries("graph_degree_dist")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.map(r => r._1 -> r._2).toMap == hist)
    assert(got.forall(_._4 == nTotal))
    assert(got.map(_._2).sum == nTotal)
    // ascending by degree: n_ge decreasing; smallest degree has n_ge = n_total
    assert(got.head._3 == nTotal)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 < a._3 && b._1 > a._1)
      case _ =>
    }
    got.foreach { case (dg, n, nGe, _, ccdf) =>
      assert(ccdf == math.floor(nGe.toDouble / nTotal.toDouble * 1e4) / 1e4, (dg, n))
    }
  }

  test("llm_lsh_curve: capture probability is the analytic S-curve and monotone") {
    val rows = SparkEntry.queries("llm_lsh_curve")(spark, sf001).collect()
    assert(rows.nonEmpty)
    var prev = -1.0
    rows.foreach { r =>
      val s = r.getDouble(1)
      val p = r.getDouble(3)
      val expect = { val s4 = s * s * s * s; 1.0 - (1.0 - s4) * (1.0 - s4) }
      assert(math.abs(p - expect) < 1e-6, s"bucket ${r.getInt(0)}: p=$p expected $expect")
      assert(p >= prev, "S-curve must be monotone in similarity")
      prev = p
    }
  }

  private def spPairs(): Seq[(Long, Long)] = Tables.lineitem(spark, sf0001)
    .select("l_suppkey", "l_partkey").distinct().collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("graph_hits matches a driver quantized power-iteration recompute; maxima pinned at 1") {
    val e = spPairs()
    val Q = 1000000000L
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.view.mapValues(v => math.floor(v.toDouble / mx.toDouble * Q).toLong).toMap
    }
    val a1 = norm(e.groupBy(_._2).view.mapValues(_.size.toLong * Q).toMap)
    val h1 = norm(e.groupBy(_._1).view.mapValues(_.map(p => a1(p._2)).sum).toMap)
    val a2 = norm(e.groupBy(_._2).view.mapValues(_.map(p => h1(p._1)).sum).toMap)
    val h2 = norm(e.groupBy(_._1).view.mapValues(_.map(p => a2(p._2)).sum).toMap)
    val expect = h2.map { case (k, v) => ("hub", s"s$k") -> v.toDouble / Q } ++
      a2.map { case (k, v) => ("authority", s"p$k") -> v.toDouble / Q }
    val got = SparkEntry.queries("graph_hits")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == expect)
    // each side's leader normalizes to exactly 1.0; everything in [0,1]
    assert(got.collect { case (("hub", _), v) => v }.max == 1.0)
    assert(got.collect { case (("authority", _), v) => v }.max == 1.0)
    got.values.foreach(v => assert(v >= 0.0 && v <= 1.0, v))
  }

  test("graph_random_walk matches a driver md5-argmin walk; hops alternate bipartite sides") {
    val e = spPairs()
    val out: Map[String, Seq[String]] =
      (e.map(p => (s"s${p._1}", s"p${p._2}")) ++ e.map(p => (s"p${p._2}", s"s${p._1}")))
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = out.keys.filter(_.startsWith("s")).map { start =>
      var cur = start
      val hops = (1 to 4).map { i =>
        cur = out(cur).minBy(nb => (md5hex(s"$start:$i:$nb"), nb))
        cur
      }
      start -> hops
    }.toMap
    val got = SparkEntry.queries("graph_random_walk")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        Seq(r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    assert(got == expect)
    got.foreach { case (start, hops) =>
      assert(start.startsWith("s"))
      assert(hops.map(_.head) == Seq('p', 's', 'p', 's'),
        s"walk from $start broke bipartite alternation: $hops")
    }
  }

  test("graph_closeness matches a driver multi-seed BFS recompute") {
    val edges = supportedEdges(sf0001)
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = adj.keys.toSeq.sortBy(n => (md5hex(s"$n|close"), n)).take(4)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = seeds.map { s =>
      var dist = Map(s -> 0L)
      (1 to 8).foreach { _ =>
        val next = dist.toSeq.flatMap { case (n, d) =>
          adj.getOrElse(n, Set.empty[Long]).map(_ -> (d + 1))
        }
        dist = (dist.toSeq ++ next).groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      }
      val r = dist.size.toLong
      val sd = dist.values.sum
      s -> (r, dist.values.max,
        if (sd > 0) Some(fl((r - 1).toDouble / sd.toDouble)) else None)
    }.toMap
    val got = SparkEntry.queries("graph_closeness")(spark, sf0001)
      .collect().map { r =>
        val c = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        r.getLong(0) -> (r.getLong(1), r.getLong(2), c)
      }.toMap
    assert(got == expect)
    // the 8-round horizon covers the measured diameter-7 graph: every
    // seed's eccentricity sits strictly inside the cap
    got.values.foreach { case (_, ecc, _) => assert(ecc < 8, ecc) }
  }

  test("graph_betweenness matches a driver horizon-bounded Brandes with identical fold orders") {
    val edges = supportedEdges(sf0001)
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val seeds = adj.keys.toSeq.sortBy(n => (md5hex(s"$n|btw"), n)).take(4)
    // (seed, node) -> delta, mirroring the key's exact IEEE fold orders
    val deltas = seeds.flatMap { s =>
      // forward: level-synchronous BFS with exact path counts
      var level = Map(s -> 0)
      var sigma = Map(s -> 1L)
      (1 to 8).foreach { r =>
        val frontier = level.filter(_._2 == r - 1).keys
        val contrib = frontier.toSeq.flatMap(u =>
          adj.getOrElse(u, Set.empty[Long]).map(v => v -> sigma(u)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum)
        contrib.foreach { case (v, sg) =>
          if (!level.contains(v)) { level += v -> r; sigma += v -> sg }
        }
      }
      // backward: process levels high -> low; per node fold successor
      // terms in successor-id order (the key's array_sort order)
      var delta = Map.empty[Long, Double]
      val maxL = level.values.max
      (maxL to 0 by -1).foreach { l =>
        level.filter(_._2 == l).keys.foreach { v =>
          val terms = adj.getOrElse(v, Set.empty[Long]).toSeq
            .filter(w => level.get(w).contains(l + 1)).sorted
            .map(w => sigma(v).toDouble / sigma(w).toDouble
              * (1.0 + delta.getOrElse(w, 0.0)))
          delta += v -> terms.foldLeft(0.0)(_ + _)
        }
      }
      level.keys.filter(_ != s).map(v => (s, v, delta.getOrElse(v, 0.0)))
    }
    // per node: fold its seed deltas in seed order (the key's final fold)
    val expect = deltas.groupBy(_._2).view.mapValues { vs =>
      val bc = vs.sortBy(_._1).map(_._3).foldLeft(0.0)(_ + _)
      (vs.size.toLong, math.floor(bc * 1e4) / 1e4)
    }.toMap
    val got = SparkEntry.queries("graph_betweenness")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // at least one genuine bridge node must carry positive betweenness,
    // or the fixture exercises nothing
    assert(got.values.exists(_._2 > 0), "no positive betweenness in fixture")
  }

  test("graph_katz matches a driver exact-integer recompute; isolated parts at the beta floor (r11)") {
    val edges = supportedEdges(sf0001)
    val nbrs = (edges.toSeq.map(e => e._1 -> e._2) ++ edges.toSeq.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val parts = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().collect().map(_.getLong(0)).toSet
    var z: Map[Long, Long] = parts.map(_ -> 1L).toMap
    for (t <- 1 to 3) {
      z = parts.map { p =>
        p -> ((1L << (3 * t)) + nbrs.getOrElse(p, Nil).map(z).sum)
      }.toMap
    }
    val expect = z.map { case (p, v) =>
      p -> (v, math.floor(v.toDouble / 512.0 * 1e6) / 1e6) }
    val got = SparkEntry.queries("graph_katz")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    // the beta floor: a part scores exactly (z3=512, katz=1.0) iff it sits
    // on no supported edge (every sf0.001 part is connected, so the floor
    // branch is equivalence-checked rather than existence-checked)
    val isolated = parts -- nbrs.keySet
    isolated.foreach(p => assert(got(p) == ((512L, 1.0)), s"floor broken at $p"))
    nbrs.keys.foreach(p => assert(got(p)._1 > 512L, s"connected $p at floor"))
  }

  test("graph_ego_stats matches a driver-side 2-hop BFS over the supported graph") {
    val edges = supportedEdges(sf0001)
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = adj.toSeq.map { case (node, nb) =>
      val two = nb.flatMap(adj(_)) - node
      val ego = nb ++ two
      (node, nb.size.toLong, ego.size.toLong, (ego.size - nb.size).toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("graph_ego_stats")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // the 2-hop frontier is live (some node reaches beyond its neighbors)
    assert(got.exists(_._4 > 0))
  }
}
