package graft

import org.apache.spark.sql.functions._

/** Round-5 business/pipeline keys: last-touch attribution, deterministic
  * DP count release, and BPE merge-pair statistics — each checked against
  * an independent driver-side recomputation. */
class MiscOpsSpec extends SparkSpec {

  test("win_attribution matches a driver-side last-touch recomputation") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1)).toSeq
      var lastTouch: Option[(Long, Long, String)] = None // (id, us, type)
      ordered.flatMap { case (id, _, us, tpe) =>
        val out = if (tpe == "purchase") {
          lastTouch match {
            case Some((tId, tUs, tType)) if us - tUs <= 86400000000L =>
              Some((id, Some(tId), Some(tType), Some((us - tUs).toDouble / 1e6)))
            case _ => Some((id, None, None, None))
          }
        } else None
        if (tpe == "click" || tpe == "view") lastTouch = Some((id, us, tpe))
        out
      }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("win_attribution")(spark, sf0001)
      .collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.toSeq
    assert(got == expect)
    // at least one attributed and (ideally) one unattributed conversion
    assert(got.exists(_._2.isDefined), "no attributed purchase in fixture")
  }

  test("agg_dp_counts: noise matches the driver-side inverse-CDF Laplace exactly") {
    val got = SparkEntry.queries("agg_dp_counts")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 5)
    got.foreach { case (tpe, n, noisy) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tpe.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 8), 16).toDouble
      val v = (h + 0.5) / 4294967296.0 - 0.5
      val noise = -math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
      val expect = BigDecimal(n + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(noisy - expect) < 1e-9, s"$tpe: $noisy vs $expect")
    }
    // determinism: a second run releases the identical values
    val again = SparkEntry.queries("agg_dp_counts")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("llm_bpe_pairs matches a driver-side weighted bigram count") {
    val words = Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val wf = words.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._1.length >= 2)
    val pairCounts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    wf.foreach { case (w, f) =>
      (0 until w.length - 1).foreach(i => pairCounts(w.substring(i, i + 2)) += f)
    }
    val expect = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(50)
    val got = SparkEntry.queries("llm_bpe_pairs")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("agg_apdex matches a driver-side recomputation, one-divide exact") {
    val events = Tables.events(spark, sf001)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expect = events.groupBy(_._1).view.mapValues { vs =>
      val n = vs.length.toLong
      val sat = vs.count(_._2 <= 1.0).toLong
      val tol = vs.count(v => v._2 > 1.0 && v._2 <= 4.0).toLong
      // the key's contract: ONE IEEE divide of exact integers
      (n, sat, tol, (2L * sat + tol).toDouble / (2L * n).toDouble)
    }.toMap
    val got = SparkEntry.queries("agg_apdex")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expect)
    got.values.foreach { case (_, _, _, score) =>
      assert(score >= 0.0 && score <= 1.0, "apdex out of [0,1]")
    }
  }

  test("agg_ab_ttest matches a driver-side Welch recomputation from exact sums") {
    val vals = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 1e6).toLong)
    val g = vals.groupBy(_._1).view.mapValues { vs =>
      val ys = vs.map(_._2)
      (ys.length.toLong, ys.map(BigInt(_)).sum, ys.map(y => BigInt(y) * BigInt(y)).sum)
    }.toMap
    def d(b: BigInt) = b.toDouble
    val expect = (for {
      (ta, (na, sya, syya)) <- g; (tb, (nb, syb, syyb)) <- g if ta < tb
    } yield {
      val (nad, nbd) = (na.toDouble, nb.toDouble)
      val t = (d(sya) / nad - d(syb) / nbd) /
        math.sqrt(((d(syya) - d(sya) * d(sya) / nad) / (nad - 1.0)) / nad +
          ((d(syyb) - d(syb) * d(syb) / nbd) / (nbd - 1.0)) / nbd)
      (ta, tb) -> math.floor(t * 1e4) / 1e4
    }).toMap
    val got = SparkEntry.queries("agg_ab_ttest")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(got == expect)
  }

  test("agg_hist_merge: merged weekly p90 brackets the exact weekly p90 within one bucket") {
    val rows = Tables.events(spark, sf0001)
      .select(weekofyear(col("ts")).as("w"), col("event_type"), col("value"))
      .where(col("value").isNotNull)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getDouble(2)))
    val got = SparkEntry.queries("agg_hist_merge")(spark, sf0001)
      .collect().map(r => ((r.getInt(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val byKey = rows.groupBy(_._1)
    assert(got.keySet == byKey.keySet)
    byKey.foreach { case (k, vs) =>
      val (n, p90) = got(k)
      assert(n == vs.length.toLong)
      // exact p90 (the ceil-rank order statistic the readout targets)
      val sorted = vs.map(_._2).sorted
      val exact = sorted(((9 * n + 9) / 10 - 1).toInt)
      // grid resolution contract: the interpolated estimate lives in the
      // exact value's bucket, so it is within one bucket width of truth
      assert(math.abs(p90 - exact) <= 25.0 + 1e-9,
        s"$k: merged-histogram p90 $p90 vs exact $exact beyond one bucket width")
    }
  }

  test("agg_anova_f matches a driver-side one-way ANOVA from exact sums") {
    val vals = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 1e6).toLong)
    val g = vals.groupBy(_._1).view.mapValues { vs =>
      val ys = vs.map(_._2)
      (ys.length.toLong, ys.map(BigInt(_)).sum, ys.map(y => BigInt(y) * BigInt(y)).sum)
    }.toMap
    val k = g.size
    val nn = vals.length.toDouble
    val (syt, syyt) = (g.values.map(_._2).sum.toDouble, g.values.map(_._3).sum.toDouble)
    // the engine folds sy²/n in event_type order — mirror it exactly
    val t = g.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, (n, sy, _))) =>
      acc + sy.toDouble * sy.toDouble / n.toDouble
    }
    val ssb = math.floor((t - syt * syt / nn) / 1e12 * 1e4) / 1e4
    val ssw = math.floor((syyt - t) / 1e12 * 1e4) / 1e4
    val f = math.floor((t - syt * syt / nn) / (k - 1.0)
      / ((syyt - t) / (nn - k.toDouble)) * 1e4) / 1e4
    val row = SparkEntry.queries("agg_anova_f")(spark, sf0001).collect()
    assert(row.length == 1)
    assert((row(0).getLong(0), row(0).getLong(1), row(0).getDouble(2),
      row(0).getDouble(3), row(0).getDouble(4)) ==
      (k.toLong, vals.length.toLong, ssb, ssw, f))
    assert(f > 0.0, "F must be positive on this fixture")
  }

  test("agg_mann_whitney matches a textbook rank recomputation (independent of the 2R trick)") {
    val vals = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 1e6).toLong)
    val byType = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expect = (for {
      ta <- byType.keys; tb <- byType.keys if ta < tb
    } yield {
      val (as, bs) = (byType(ta), byType(tb))
      val comb = (as ++ bs).sorted
      // textbook tie-averaged ranks: rank of value v = mean of the 1-based
      // positions v occupies in the sorted combined sample
      val rankOf = comb.zipWithIndex.groupBy(_._1).view
        .mapValues(ps => ps.map(_._2 + 1.0).sum / ps.length).toMap
      val ra = as.map(rankOf).sum
      val (na, nb) = (as.length.toDouble, bs.length.toDouble)
      val uA = ra - na * (na + 1.0) / 2.0
      val nn = na + nb
      val tie3 = comb.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * t * t - t }).sum.toDouble
      val z = math.floor((uA - na * nb / 2.0)
        / math.sqrt(na * nb / 12.0 * ((nn + 1.0) - tie3 / (nn * (nn - 1.0))))
        * 1e4) / 1e4
      (ta, tb) -> (as.length.toLong, bs.length.toLong, uA, na * nb - uA, z)
    }).toMap
    val got = SparkEntry.queries("agg_mann_whitney")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got == expect)
  }

  test("agg_bootstrap_ci matches a driver-side Poisson-bootstrap recompute and brackets the mean") {
    val rows = Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), math.floor(r.getDouble(2) * 1e6).toLong))
    val ts = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L)
    def weight(eventId: Long, b: Int): Long = {
      // window (b mod 4) of md5(event_id|⌊b/4⌋) — the 4-draws-per-hash packing
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$eventId|${b / 4}")
      val u = java.lang.Long.parseLong(hex.substring((b % 4) * 8, (b % 4) * 8 + 8), 16)
      val i = ts.indexWhere(u < _)
      if (i < 0) 8L else i.toLong
    }
    val expect = rows.groupBy(_._1).map { case (t, vs) =>
      val means = (0 until 32).map { b =>
        var (nw, sw) = (BigInt(0), BigInt(0))
        vs.foreach { case (_, id, yq) =>
          val w = weight(id, b); nw += w; sw += BigInt(w) * yq
        }
        (sw.toDouble / nw.toDouble / 1e6, b)
      }.sorted
      val sy = vs.map(v => BigInt(v._3)).sum
      t -> (vs.length.toLong,
        math.floor(sy.toDouble / vs.length.toDouble / 1e6 * 1e4) / 1e4,
        math.floor(means(1)._1 * 1e4) / 1e4,
        math.floor(means(30)._1 * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("agg_bootstrap_ci")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expect)
    // the interval must bracket the point mean and be nondegenerate
    got.values.foreach { case (_, mean, lo, hi) =>
      assert(lo < hi, "degenerate interval")
      assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] does not bracket mean $mean")
    }
  }

  test("agg_ks_drift matches a driver-side exact-rational ECDF sup-diff") {
    val rows = Tables.events(spark, sf001)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) ->
        math.min(math.max(math.floor(r.getDouble(1) / 2).toLong, 0L), 255L))
    val grid = rows.map(_._2).distinct.sorted
    val nAll = rows.length.toLong
    val byType = rows.groupBy(_._1)
    val expect = byType.map { case (t, vs) =>
      val nT = vs.length.toLong
      val binsT = vs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val binsAll = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var (cumT, cumAll, best) = (0L, 0L, BigInt(0))
      grid.foreach { b =>
        cumT += binsT.getOrElse(b, 0L); cumAll += binsAll.getOrElse(b, 0L)
        val num = (BigInt(cumT) * nAll - BigInt(cumAll) * nT).abs
        if (num > best) best = num
      }
      t -> (nT, math.floor(best.toDouble / (BigInt(nT) * nAll).toDouble * 1e6) / 1e6)
    }
    val got = SparkEntry.queries("agg_ks_drift")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    // KS is a probability-scale statistic; the per-type-vs-global design
    // means no type can deviate by more than its complement's mass
    got.values.foreach { case (_, ks) => assert(ks >= 0.0 && ks <= 1.0) }
  }

  test("agg_psi_drift matches a driver-side smoothed-bin fold, in bin order") {
    val rows = Tables.events(spark, sf001)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) ->
        math.min(math.max(math.floor(r.getDouble(1) / 64).toLong, 0L), 7L))
    val nAll = rows.length.toLong
    val binsAll = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = rows.groupBy(_._1).map { case (t, vs) =>
      val nT = vs.length.toLong
      val binsT = vs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // fold strictly in bin order — the ordered-list-sum contract
      val psi = (0L to 7L).foldLeft(0.0) { (acc, b) =>
        val pT = (binsT.getOrElse(b, 0L) + 1).toDouble / (nT + 8).toDouble
        val pA = (binsAll.getOrElse(b, 0L) + 1).toDouble / (nAll + 8).toDouble
        acc + (pT - pA) * math.log(pT / pA)
      }
      t -> (nT, math.floor(psi * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("agg_psi_drift")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    // PSI ≥ 0 by Gibbs' inequality (it is a symmetrized KL term sum)
    got.values.foreach { case (_, psi) => assert(psi >= 0.0) }
  }

  test("llm_quality_linear matches a driver-side hashed-weight fold and flags exactly") {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(md5hex(tok).take(8), 16) % 256
    def weight(b: Long): Long =
      java.lang.Long.parseLong(md5hex("qw" + b).take(8), 16) % 1000001L - 500000L
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val wsum = toks.map(t => weight(bucket(t))).sum
        Some(id -> (toks.length.toLong, wsum,
          math.floor(wsum.toDouble / toks.length) / 1e6, if (wsum >= 0) 1 else 0))
      }
    }.toMap
    val got = SparkEntry.queries("llm_quality_linear")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5)))
      .toMap
    assert(got == expect)
    // the fixture must exercise both sides of the decision boundary
    assert(got.values.exists(_._4 == 1) && got.values.exists(_._4 == 0),
      "all docs on one side of the keep threshold — classifier fixture degenerate")
  }

  test("llm_embed_pca_power matches a driver-side exact-covariance power iteration") {
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = rows.length
    val d = rows.head._2.length
    val xq = rows.map(_._2.map(x => math.floor(x.toDouble * 1e6).toLong))
    val si = Array.tabulate(d)(i => xq.map(v => BigInt(v(i))).sum)
    val a = Array.tabulate(d, d) { (i, j) =>
      val spp = xq.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      (BigInt(n) * spp - si(i) * si(j)).toDouble
    }
    var v = Array.fill(d)(0.125d)
    for (_ <- 1 to 8) {
      // folds strictly in j order / i order — the key's ordered-sum contract
      val w = Array.tabulate(d)(i => (0 until d).foldLeft(0.0)((acc, j) => acc + a(i)(j) * v(j)))
      val nm = math.sqrt((0 until d).foldLeft(0.0)((acc, i) => acc + w(i) * w(i)))
      v = w.map(_ / nm)
    }
    val expect = v.zipWithIndex.map { case (x, i) => i -> math.floor(x * 1e6) / 1e6 }.toMap
    val got = SparkEntry.queries("llm_embed_pca_power")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == expect)
    // the iterate is (approximately) unit norm — the normalization bites
    val norm = math.sqrt(got.values.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"pc1 norm $norm")
  }

  test("llm_shard_plan: full shards of 64, dense positions, md5-order permutation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = SparkEntry.queries("llm_shard_plan")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(got.length == ids.length)
    // the assignment IS the md5-order permutation, recomputed driver-side
    val expect = ids.map(id => (md5hex(id + "|shard"), id)).sorted
      .zipWithIndex.map { case ((_, id), i) => (id, i.toLong / 64, i.toLong % 64) }.toSet
    assert(got.toSet == expect)
    // every shard except the last is exactly full, positions dense from 0
    val byShard = got.groupBy(_._2)
    val last = byShard.keys.max
    byShard.foreach { case (sh, rows) =>
      val expectSize = if (sh == last) ids.length - 64 * last else 64L
      assert(rows.length.toLong == expectSize, s"shard $sh has ${rows.length} docs")
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length.toLong),
        s"shard $sh positions not dense")
    }
  }

  test("llm_hash_embed matches a driver-side signed-hash recomputation, exact longs") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expect = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map { t =>
        val h = md5hex(t)
        val dim = java.lang.Long.parseLong(h.take(8), 16) % 16
        val sgn = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L
        (id, dim) -> sgn
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0).toMap
    // sum(sgn) can cancel to 0 — those dims are still emitted (a zero sum
    // is an occupied dim, not an absent one), so compare on the full map
    val expectAll = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map { t =>
        val h = md5hex(t)
        ((id, java.lang.Long.parseLong(h.take(8), 16) % 16),
          if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = SparkEntry.queries("llm_hash_embed")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expectAll)
    // signs genuinely mix (both positive and negative sums exist)
    assert(got.values.exists(_ > 0) && got.values.exists(_ < 0),
      "all hash-embed sums one-signed — sign hash degenerate")
    assert(expect.nonEmpty)
  }

  test("llm_dedup_stats matches a driver-side dup-mass rollup") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byText = docs.groupBy(_._3)
    val gDocs = byText.view.mapValues(_.size).toMap
    val gSrcs = byText.view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val dup = ds.count(d => gDocs(d._3) >= 2).toLong
      val cross = ds.count(d => gSrcs(d._3) >= 2).toLong
      src -> (ds.size.toLong, dup, cross,
        math.floor(dup.toDouble / ds.size * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("llm_dedup_stats")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expect)
    // cross-source duplication implies a ≥2-doc group, so cross ≤ dup
    // per source (the text corpus has exact-dup mass only at sf0.1 — 8
    // docs — so the sf0.001 run checks the zero-mass path exactly)
    got.values.foreach { case (n, dup, cross, _) =>
      assert(cross <= dup && dup <= n)
    }
  }

  test("llm_hard_negatives: cross-label only, 3 per query, sims non-increasing") {
    val rows = SparkEntry.queries("llm_hard_negatives")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, qLabel, _, negLabel, rank, _) =>
      assert(qLabel != negLabel, "a same-label vector leaked into the negatives")
      assert(rank >= 1 && rank <= 3)
    }
    rows.groupBy(_._1).foreach { case (q, ns) =>
      assert(ns.length == 3, s"query $q returned ${ns.length} negatives")
      val bySim = ns.sortBy(_._5).map(_._6)
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b },
        s"query $q: sims not non-increasing in rank")
    }
  }

  test("llm_hard_negatives gated branch: IVF route keeps the contract and hits the exact top-1 mostly") {
    import org.apache.spark.sql.functions._
    // 12k synthetic vectors (> HardNegGate) staged as an embeddings table
    // so the query runs its production IVF branch end-to-end
    val dir = java.nio.file.Files.createTempDirectory("graft_hardneg").toString
    graft.functions.VecDot.register(spark)
    spark.range(12000).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(7)), j =>
          (conv(substring(md5(concat(col("id").cast("string"), lit(":"), j.cast("string"))),
            1, 4), 16, 10).cast("double") / 65535.0 - 0.5).cast("float")).as("embedding"),
        pmod(col("id"), lit(4)).cast("int").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("llm_hard_negatives")(spark, dir).collect()
    assert(rows.length > 30000, s"${rows.length} rows — gated branch starved")
    rows.foreach { r =>
      assert(r.getInt(1) != r.getInt(3), "same-label negative from the IVF route")
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 3)
    }
    // ANN-recall sanity on a 300-query sample: the IVF top-1 negative
    // should match the exact cross-label top-1 for a solid majority
    // (nprobe=2 over ~50-occupancy cells; uniform corpus is the WORST
    // case for IVF, so the bar is deliberately modest)
    val ivfTop = rows.filter(r => r.getInt(4) == 1 && r.getLong(0) < 300)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val v = Tables.embeddings(spark, dir)
      .withColumn("norm", sqrt(call_function("vec_dot", col("embedding"), col("embedding"))))
    val q = v.where(col("vec_id") < 300)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_e"),
        col("norm").as("q_n"), col("label").as("q_label"))
    val c = v.select(col("vec_id").as("c_id"), col("embedding").as("c_e"),
      col("norm").as("c_n"), col("label").as("c_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    val exactTop = q.join(c, col("q_id") =!= col("c_id") && col("q_label") =!= col("c_label"))
      .withColumn("sim", call_function("vec_dot", col("q_e"), col("c_e"))
        / (col("q_n") * col("c_n")))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("q_id", "c_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exactTop.count { case (qid, cid) => ivfTop.get(qid).contains(cid) }
    assert(hits >= exactTop.size / 2,
      s"IVF top-1 recall $hits/${exactTop.size} — index policy degenerated")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("llm_span_mask: sentinel-splicing the target back into the input reconstructs the text") {
    val rows = SparkEntry.queries("llm_span_mask")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var maskedSomething = false
    rows.foreach { r =>
      val (docId, nSpans) = (r.getLong(0), r.getLong(3))
      val input = r.getString(4)
      val target = if (r.isNullAt(5)) "" else r.getString(5)
      val original = docs(docId).split(" ").filter(_.nonEmpty).mkString(" ")
      if (nSpans == 0) assert(input == original && target.isEmpty)
      else {
        maskedSomething = true
        // parse target into sentinel -> span-token map, then splice
        val spans = ("<extra_id_(\\d+)>".r.findAllMatchIn(target).toSeq)
        val parts = target.split("<extra_id_\\d+> ?").toSeq.drop(1)
        assert(spans.map(_.group(1).toInt) == (1 to nSpans.toInt),
          s"doc $docId: sentinel numbering not sequential in target")
        var rebuilt = input
        spans.map(_.group(1).toInt).zip(parts).foreach { case (n, span) =>
          rebuilt = rebuilt.replace(s"<extra_id_$n>", span.trim)
        }
        assert(rebuilt == original,
          s"doc $docId: splice failed\nrebuilt:  $rebuilt\noriginal: $original")
      }
    }
    assert(maskedSomething, "no document got a span — masking rate broken on fixture")
  }

  test("win_theil_sen matches a driver-side pairwise-median recomputation") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def medianSlope(ys: Seq[Double]): Option[Double] = {
      if (ys.length < 2) None
      else {
        val slopes = (for {
          i <- ys.indices; j <- i + 1 until ys.length
        } yield (ys(j) - ys(i)) / (j - i).toDouble).sorted
        val n = slopes.length
        val m = if (n % 2 == 1) slopes(n / 2)
                else (slopes(n / 2 - 1) + slopes(n / 2)) / 2.0
        Some(math.floor(m * 10000) / 10000)
      }
    }
    val expect = events.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 15), i + 1).map(_._4)
        ordered(i)._1 -> medianSlope(frame)
      }
    }
    val got = SparkEntry.queries("win_theil_sen")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == expect)
  }

  test("win_forecast_eval matches a driver-side walk-forward backtest") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def holt(zs: Seq[Double]): Double = {
      var lv = zs.head; var tr = 0.0
      zs.tail.foreach { x =>
        val nlv = 0.3 * x + 0.7 * (lv + tr)
        tr = 0.4 * (nlv - lv) + 0.6 * tr
        lv = nlv
      }
      lv + tr
    }
    val expect = events.groupBy(_._2).map { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      val errs = ordered.indices.flatMap { i =>
        val hist = ordered.slice(math.max(0, i - 16), i).map(_._4)
        if (hist.isEmpty) None
        else Some(ordered(i)._4 - holt(hist))
      }
      val vals = ordered.indices.flatMap { i =>
        if (i == 0) None else Some(ordered(i)._4)
      }
      val n = errs.length.toLong
      val seq = errs.map(e => BigInt(math.floor(e * 1e6).toLong)).sum
      val saq = errs.map(e => BigInt(math.floor(math.abs(e) * 1e6).toLong)).sum
      val pos = errs.zip(vals).filter(_._2 > 0.0)
      val spq = pos
        .map { case (e, v) => BigInt(math.floor(math.abs(e) / v * 1e6).toLong) }.sum
      uid -> (n, saq.toDouble / n.toDouble / 1e6, seq.toDouble / n.toDouble / 1e6,
        spq.toDouble / pos.length.toDouble / 1e6)
    }
    val got = SparkEntry.queries("win_forecast_eval")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expect)
    // MAE must be >= |bias| for every entity (triangle inequality)
    got.values.foreach { case (_, mae, bias, _) =>
      assert(mae >= math.abs(bias) - 1e-12, s"mae $mae < |bias| $bias")
    }
  }

  test("win_kalman matches a driver-side fold, and the gain adapts downward") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (qv, rv) = (4.0, 16.0)
    def fold(zs: Seq[Double]): Double = {
      var x = zs.head; var p = rv
      zs.tail.foreach { z =>
        val pPred = p + qv
        val k = pPred / (pPred + rv)
        x = x + k * (z - x)
        p = (1.0 - k) * pPred
      }
      math.floor(x * 10000) / 10000
    }
    val expect = events.groupBy(_._2).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 15), i + 1).map(_._4)
        ordered(i)._1 -> fold(frame)
      }
    }
    val got = SparkEntry.queries("win_kalman")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expect)
    // the adaptive gain must settle: K starts at (R+Q)/(R+Q+R) = 0.556 and
    // decreases monotonically toward the steady state every fold step
    var p = rv
    var kPrev = 1.0
    (1 to 16).foreach { _ =>
      val pPred = p + qv
      val k = pPred / (pPred + rv)
      assert(k < kPrev, "Kalman gain failed to decrease")
      kPrev = k; p = (1.0 - k) * pPred
    }
  }

  test("filter_trigger_escalate matches a driver-side streak recompute and fires all severities") {
    val hourly = Tables.events(spark, sf001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(x => (x._1, x._2)).toSeq.map { case ((tpe, h), rs) =>
        val sq = rs.map(x => math.floor(x._3 * 1e4).toLong).sum
        (tpe, h, math.floor(sq.toDouble / rs.length) / 1e4)
      }.toArray
    val expect = hourly.filter(_._3 > 50.0).groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      val ordered = rs.sortBy(_._2)
      var streak = 0
      var prev = Long.MinValue
      ordered.map { case (_, h, kpi) =>
        streak = if (h - prev == 3600000L) streak + 1 else 1
        prev = h
        val sev = if (streak >= 6) "critical" else if (streak >= 3) "major" else "warning"
        (tpe, h, kpi, streak.toLong, sev)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("filter_trigger_escalate")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == expect)
    // the fixture must genuinely exercise the escalation ladder
    val sevs = got.map(_._5).toSet
    assert(sevs == Set("warning", "major", "critical"),
      s"expected all three severities at sf0.01, got $sevs")
  }

  test("llm_positive_pairs matches a driver-side exact same-label top-1") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }; acc
    }
    val norms = emb.map { case (id, _, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val expect = emb.flatMap { case (id, label, e) =>
      val cands = emb.filter(x => x._1 != id && x._2 == label)
        .map { case (cid, _, ce) => (dot(e, ce) / (norms(id) * norms(cid)), cid) }
      if (cands.isEmpty) None
      else {
        val (sim, cid) = cands.minBy { case (s, c) => (-s, c) }
        Some((id, label, cid,
          BigDecimal(sim).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("llm_positive_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // every anchor has a positive on this fixture (each label has >= 2 members)
    assert(got.length == emb.length)
  }

  test("llm_triplet_margin matches a driver-side recompute and agrees with the twins' rank-1 rows") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }; acc
    }
    val norms = emb.map { case (id, _, e) => id -> math.sqrt(dot(e, e)) }.toMap
    def top1(id: Long, label: Int, e: Array[Float], same: Boolean) = {
      val cands = emb.filter(x => x._1 != id && (if (same) x._2 == label else x._2 != label))
        .map { case (cid, _, ce) => (dot(e, ce) / (norms(id) * norms(cid)), cid) }
      if (cands.isEmpty) None else Some(cands.minBy { case (s, c) => (-s, c) })
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = emb.flatMap { case (id, label, e) =>
      for { (ps, pid) <- top1(id, label, e, same = true)
            (ns, nid) <- top1(id, label, e, same = false) }
        yield (id, label, pid, r4(ps), nid, r4(ns), r4(ps - ns), ps - ns < 0.2)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("llm_triplet_margin")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toSeq
    assert(got == expect)
    // consistency with the twins: the rank-1 rows of each must reappear
    val posRows = SparkEntry.queries("llm_positive_pairs")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val negRows = SparkEntry.queries("llm_hard_negatives")(spark, sf0001)
      .collect().filter(_.getInt(4) == 1)
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(5))).toSet
    got.foreach { case (id, _, pid, ps, nid, ns, _, _) =>
      assert(posRows.contains((id, pid, ps)), s"anchor $id positive mismatch")
      assert(negRows.contains((id, nid, ns)), s"anchor $id negative mismatch")
    }
  }

  private def md5hex(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  /** Driver-side NN-descent recompute (the engine/oracle recipe: seeded
    * sorted-fold floor-1e-6 coarse cells, cell-mate + next-cell init,
    * 2 synchronous rounds of top-4 over N ∪ N∘N). Returns the cosine
    * function, the final neighbor map, and the per-stage best-sim maps —
    * shared by the nn_descent and graph_search specs. */
  private def descentDriver(sfDir: String)
      : ((Long, Long) => Double, Map[Long, Set[Long]], Seq[Map[Long, Double]]) = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norms = emb.map { case (id, e) => id -> math.sqrt(dotd(e, e)) }
    val sim = (a: Long, b: Long) => dotd(emb(a), emb(b)) / (norms(a) * norms(b))
    val nlist = graft.ops.Ivf.occupancyNlist(emb.size.toLong, 50)
    def seedOf(id: Long) =
      (java.lang.Long.parseLong(md5hex(id.toString).substring(0, 4), 16) % nlist).toInt
    val cent = emb.keys.groupBy(seedOf).map { case (c, ids) =>
      c -> (0 until 64).map { i =>
        val xs = ids.map(emb(_)(i)).toSeq.sorted
        math.floor(xs.foldLeft(0.0)(_ + _) / xs.size * 1e6) / 1e6
      }.toArray
    }
    val cnorm = cent.map { case (c, v) => c -> math.sqrt(dotd(v, v)) }
    val cellOf = emb.keys.map { id =>
      id -> cent.keys.toSeq
        .map(c => (dotd(emb(id), cent(c)) / (norms(id) * cnorm(c)), c))
        .minBy { case (cs, c) => (-cs, c) }._2
    }.toMap
    val byCell = emb.keys.groupBy(cellOf).view.mapValues(_.toSeq.sorted).toMap
    var nbrs: Map[Long, Set[Long]] = emb.keys.map { id =>
      val c = cellOf(id)
      val ownN = byCell(c).filter(_ != id).take(2)
      val nxtN = byCell.getOrElse((c + 1) % nlist, Seq.empty).take(2)
      id -> ((ownN ++ nxtN).toSet - id)
    }.toMap
    def bestSims(m: Map[Long, Set[Long]]) = m.map { case (id, ns) =>
      id -> (if (ns.isEmpty) -2.0 else ns.map(sim(id, _)).max)
    }
    val stages = scala.collection.mutable.ListBuffer(bestSims(nbrs))
    (1 to 2).foreach { _ =>
      nbrs = nbrs.map { case (id, ns) =>
        val cand = (ns ++ ns.flatMap(nbrs.getOrElse(_, Set.empty))) - id
        id -> cand.toSeq.sortBy(c => (-sim(id, c), c)).take(4).toSet
      }
      stages += bestSims(nbrs)
    }
    (sim, nbrs, stages.toList)
  }

  test("llm_nn_descent matches a driver recompute; best sim per node never decreases across rounds") {
    val (sim, nbrs, stages) = descentDriver(sf0001)
    val expect = nbrs.toSeq.flatMap { case (id, ns) =>
      ns.toSeq.sortBy(c => (-sim(id, c), c)).zipWithIndex.map { case (c, i) =>
        (id, i + 1, c, BigDecimal(sim(id, c))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("llm_nn_descent")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // the descent invariant: previous top-k is always in the candidate
    // set, so per-node best sim is monotonically non-decreasing — and it
    // must strictly improve somewhere or the rounds are vacuous
    stages.toList.sliding(2).foreach {
      case List(a, b) =>
        a.keys.foreach(id => assert(b(id) >= a(id) - 1e-12, s"node $id regressed"))
        assert(a.keys.map(id => b(id) - a(id)).max > 1e-9, "a round improved nothing")
      case _ =>
    }
  }

  test("llm_graph_search matches a driver-side greedy walk; routability is live") {
    val (sim, nbrs, _) = descentDriver(sf0001)
    val ids = nbrs.keys.toSeq
    val qids = ids.sortBy(id => md5hex(id.toString + "|sq")).take(500)
    val entry = ids.sortBy(id => (md5hex(id.toString + "|entry"), id)).head
    val expect = qids.map { q =>
      var (cur, curSim, hops) = (entry, sim(q, entry), 0)
      (1 to 6).foreach { _ =>
        val ns = nbrs.getOrElse(cur, Set.empty)
        if (ns.nonEmpty) {
          val (bs, b) = ns.toSeq.map(nb => (sim(q, nb), nb))
            .minBy { case (s2, n2) => (-s2, n2) }
          if (bs > curSim) { cur = b; curSim = bs; hops += 1 }
        }
      }
      (q, cur,
        BigDecimal(curSim).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        hops, cur == q)
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_graph_search")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getBoolean(4))).toSeq
    assert(got == expect)
    // navigability must be live in both directions: some walks reach
    // their query, and the 6-hop greedy horizon leaves some short (the
    // number an operator reads to size rounds/degree)
    val reached = got.count(_._5)
    assert(reached > 0, "no walk reached its query — graph not navigable at all")
    info(f"greedy routability: $reached/${got.size} (${reached * 100.0 / got.size}%.1f%%)")
  }

  test("llm_pack_padded matches a driver recompute; sorted padding never exceeds arrival's") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    def batches(ordered: Seq[(String, Long, Long)], policy: String) =
      ordered.grouped(32).zipWithIndex.map { case (g, i) =>
        val (toks, mx) = (g.map(_._3).sum, g.map(_._3).max)
        (g.head._1, policy, i.toLong, g.length.toLong, toks, mx,
          g.length * mx - toks,
          math.floor(toks.toDouble / (g.length * mx).toDouble * 1e4) / 1e4)
      }.toSeq
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      batches(ds.sortBy(_._2), "arrival") ++
        batches(ds.sortBy(d => (d._3, d._2)), "sorted")
    }.sortBy(t => (t._1, t._2, t._3))
    val got = SparkEntry.queries("llm_pack_padded")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.get(2).toString.toLong, r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getDouble(7))).toSeq
    assert(got == expect)
    // the point of sorting: total padding per source never increases
    got.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._7).sum).toSeq
      .groupBy(_._1._1).foreach { case (src, rows) =>
        val m = rows.map { case ((_, p), pad) => p -> pad }.toMap
        assert(m("sorted") <= m("arrival"),
          s"$src: sorted padding ${m("sorted")} > arrival ${m("arrival")}")
      }
  }

  test("llm_mmr_rerank matches a driver-side greedy MMR; diversity beats the plain top-5 tail") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }; acc
    }
    val norms = emb.map { case (id, e) => id -> math.sqrt(dot(e, e)) }
    def sim(a: Long, b: Long): Double = dot(emb(a), emb(b)) / (norms(a) * norms(b))
    def md5hex(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val qids = emb.keys.filter(norms(_) > 0).toSeq
      .sortBy(id => md5hex(id.toString + "|mmr")).take(5)
    val expect = qids.flatMap { q =>
      val cands = emb.keys.filter(_ != q).toSeq
        .map(c => (c, sim(q, c))).sortBy { case (c, r) => (-r, c) }.take(20)
      val rel = cands.toMap
      // seed = argmax rel, ties to the lower id
      var sel = List(cands.minBy { case (c, r) => (-r, c) }._1)
      (2 to 5).foreach { _ =>
        val pick = cands.filterNot(c => sel.contains(c._1)).map { case (c, r) =>
          val ms = sel.map(s => sim(c, s)).max
          (c, 0.5 * r - 0.5 * ms)
        }.minBy { case (c, sc) => (-sc, c) }._1
        sel = sel :+ pick
      }
      sel.zipWithIndex.map { case (c, i) =>
        val score = if (i == 0) rel(c)
          else 0.5 * rel(c) - 0.5 * sel.take(i).map(s => sim(c, s)).max
        (q, i + 1, c, math.floor(score * 1e4) / 1e4)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("llm_mmr_rerank")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // diversity property: the MMR set's max internal similarity must not
    // exceed the plain top-5's on any query (that is the whole point)
    qids.foreach { q =>
      val top5 = emb.keys.filter(_ != q).toSeq
        .map(c => (c, sim(q, c))).sortBy { case (c, r) => (-r, c) }.take(5).map(_._1)
      val mmr5 = got.filter(_._1 == q).map(_._3)
      def maxInternal(xs: Seq[Long]) =
        (for (i <- xs.indices; j <- i + 1 until xs.size) yield sim(xs(i), xs(j))).max
      assert(maxInternal(mmr5) <= maxInternal(top5) + 1e-12,
        s"q=$q: MMR did not reduce internal similarity")
    }
  }

  test("llm_rake_keywords matches a driver-side RAKE recompute") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val stops = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    // phrases: maximal stop-free runs, tagged by (doc, phrase_id = #stops before)
    val phrases = docs.flatMap { case (id, toks) =>
      var stopCount = 0L
      toks.zipWithIndex.flatMap { case (t, pos) =>
        if (stops(t)) { stopCount += 1; None }
        else Some((id, stopCount, pos, t))
      }
    }
    val plen = phrases.groupBy(p => (p._1, p._2)).view.mapValues(_.length.toLong).toMap
    val freq = phrases.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val deg = phrases.groupBy(_._4).view
      .mapValues(_.map(p => plen((p._1, p._2))).sum).toMap
    def wscore(t: String) = deg(t).toDouble / freq(t).toDouble
    val expect = phrases.groupBy(p => (p._1, p._2)).toSeq.map { case ((id, pid), ps) =>
      val ordered = ps.sortBy(_._3)
      val score = ordered.foldLeft(0.0)((acc, p) => acc + wscore(p._4))
      (id, pid, ordered.map(_._4).mkString(" "), ordered.length, score)
    }.groupBy(_._1).toSeq.flatMap { case (id, ph) =>
      ph.sortBy { case (_, pid, phrase, _, sc) => (-sc, phrase, pid) }.take(3)
        .zipWithIndex.map { case ((_, _, phrase, n, sc), i) =>
          (id, i + 1, phrase, n, math.floor(sc * 1e4) / 1e4)
        }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("llm_rake_keywords")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getDouble(4))).toSeq
    assert(got == expect)
    // multi-word phrases must exist — RAKE degenerates to tf otherwise
    assert(got.exists(_._4 > 1), "no multi-word keyphrase extracted")
  }

  test("llm_embed_whiten matches a driver-side projection against the pca key's own pc1") {
    val v = SparkEntry.queries("llm_embed_pca_power")(spark, sf0001)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val expect = emb.map { case (id, label, e) =>
      var proj = 0.0
      var i = 0
      while (i < e.length) { proj += e(i).toDouble * v(i); i += 1 }
      var rs = 0.0
      i = 0
      while (i < e.length) {
        val dlt = e(i).toDouble - proj * v(i); rs += dlt * dlt; i += 1
      }
      (id, label, math.floor(proj * 1e4) / 1e4, math.floor(math.sqrt(rs) * 1e4) / 1e4)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("llm_embed_whiten")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // Pythagoras (v is unit up to the 1e-6 quantization): proj² + resid² ≈ |x|²
    val norms = emb.map { case (id, _, e) =>
      id -> e.map(x => x.toDouble * x.toDouble).sum }.toMap
    got.foreach { case (id, _, p, r) =>
      val lhs = p * p + r * r
      assert(math.abs(lhs - norms(id)) / math.max(norms(id), 1e-9) < 1e-2,
        s"vec $id: proj^2+resid^2 $lhs vs |x|^2 ${norms(id)}")
      assert(r * r <= norms(id) * (1.0 + 1e-6), s"vec $id residual exceeds the norm")
    }
  }

  test("llm_bpe_train matches a driver-side reference trainer") {
    val wordCounts = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var vocab: Seq[(List[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val expect = (1 to 4).map { r =>
      val pc = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).withFilter(_.size == 2).foreach(p => pc((p(0), p(1))) += c)
      }
      val ((a, b), n) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      vocab = vocab.map { case (syms, c) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) {
            out.remove(out.size - 1); out += (a + b)
          } else out += x
        }
        (out.toList, c)
      }
      (r.toLong, a, b, n)
    }
    val got = SparkEntry.queries("llm_bpe_train")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expect)
    // 4 distinct merges, all with genuinely positive weighted counts
    assert(got.map(x => (x._2, x._3)).distinct.size == 4)
    assert(got.forall(_._4 > 0))
  }

  test("llm_bpe_encode matches a driver-side re-tokenization under the learned merges") {
    // re-derive the 4 merges with the same reference trainer
    val wordCounts = Tables.documents(spark, sf0001).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    def rewrite(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      syms.foreach { x =>
        if (out.nonEmpty && out.last == a && x == b) {
          out.remove(out.size - 1); out += (a + b)
        } else out += x
      }
      out.toList
    }
    var vocab: Seq[(List[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = (1 to 4).map { _ =>
      val pc = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).withFilter(_.size == 2).foreach(p => pc((p(0), p(1))) += c)
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      vocab = vocab.map { case (syms, c) => (rewrite(syms, a, b), c) }
      (a, b)
    }
    val expect = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .collect().map { r =>
        val words = r.getString(1).split(" ").filter(_.nonEmpty)
        val nSyms = words.map(_.length.toLong).sum
        val nBpe = words.map { w =>
          merges.foldLeft(w.map(_.toString).toList) {
            case (syms, (a, b)) => rewrite(syms, a, b) }.length.toLong
        }.sum
        (r.getLong(0), nSyms, nBpe,
          if (nBpe > 0) Some(math.floor(nSyms.toDouble / nBpe * 1e4) / 1e4) else None)
      }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("llm_bpe_encode")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == expect)
    // merges only ever shrink a token sequence, and the fixture must
    // genuinely compress somewhere
    got.foreach { case (_, ns, nb, _) => assert(nb <= ns && nb >= 0) }
    assert(got.exists { case (_, ns, nb, _) => nb < ns }, "no doc compressed")
  }

  test("the BPE merge rewrite is greedy left-to-right (overlapping pair)") {
    // merging ('a','a') over [a,a,a] must give [aa, a] — the merged symbol
    // does not immediately re-merge with the following raw symbol
    val out = spark.sql(
      """SELECT aggregate(array('a', 'a', 'a'), CAST(array() AS ARRAY<STRING>),
        |  (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = 'a' AND x = 'a'
        |                   THEN concat(slice(acc, 1, size(acc) - 1), array('aa'))
        |                   ELSE concat(acc, array(x)) END) AS m""".stripMargin)
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("llm_dsir_weights matches a driver-side recompute and ranks the target domain higher") {
    def bucket(t: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 8), 16) % 16).toInt
    }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cr = Array.fill(16)(0L); val ct = Array.fill(16)(0L)
    docs.foreach { case (_, lang, text) =>
      text.split(" ").filter(_.nonEmpty).foreach { t =>
        val b = bucket(t); cr(b) += 1; if (lang == "en") ct(b) += 1
      }
    }
    val (nr, nt) = (cr.sum, ct.sum)
    val lr = Array.tabulate(16)(b =>
      math.log(((ct(b) + 1) * (nr + 16)).toDouble / ((cr(b) + 1) * (nt + 16)).toDouble))
    val expect = docs.map { case (id, lang, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      var acc = 0.0
      toks.foreach(t => acc += lr(bucket(t)))
      (id, lang, toks.length, math.floor(acc * 1e4) / 1e4)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("llm_dsir_weights")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // the point of DSIR: target-domain docs must rank above the rest
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val (en, rest) = got.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    assert(avg(en.map(_._4)) > avg(rest.map(_._4)),
      "target-domain docs did not average a higher importance weight")
  }

  test("win_acf matches a driver-side dense-grid ACF recomputation") {
    val raw = Tables.events(spark, sf0001)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      val hourly = rs.groupBy(_._2).map { case (h, g) =>
        h -> g.map(x => math.floor(x._3 * 1e4).toLong).sum }
      val (h0, h1) = (hourly.keys.min, hourly.keys.max)
      val xs = (h0 to h1 by 3600000L).map(h => hourly.getOrElse(h, 0L)).toArray
      val n = xs.length
      val s1 = xs.iterator.map(BigInt(_)).sum
      val s2 = xs.iterator.map(x => BigInt(x) * BigInt(x)).sum
      val den = BigInt(n) * BigInt(n) * s2 - BigInt(n) * s1 * s1
      Seq(1, 2, 24).map { l =>
        val acf =
          if (l >= n || den == 0) None
          else {
            val sl = (0 until n - l).iterator.map(i => BigInt(xs(i)) * BigInt(xs(i + l))).sum
            val a = (0 until n - l).iterator.map(i => BigInt(xs(i))).sum
            val b = (l until n).iterator.map(i => BigInt(xs(i))).sum
            val num = BigInt(n) * BigInt(n) * sl - BigInt(n) * s1 * a -
              BigInt(n) * s1 * b + BigInt(n - l) * s1 * s1
            Some(math.floor(num.toDouble / den.toDouble * 1e6) / 1e6)
          }
        (tpe, n.toLong, l.toLong, acf)
      }
    }.sortBy(t => (t._1, t._3))
    val got = SparkEntry.queries("win_acf")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == expect)
    // structure: 5 types × 3 lags, every defined ACF within [-1, 1]
    assert(got.length == 15)
    got.flatMap(_._4).foreach(a => assert(a >= -1.0000011 && a <= 1.0000011, a))
    assert(got.flatMap(_._4).nonEmpty, "no defined ACF value in fixture")
  }

  test("agg_assoc_rules matches a driver-side basket recompute; lift is symmetric") {
    val baskets = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1))).distinct
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val itemCnt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val pairCnt = byOrder.values.toSeq.flatMap { bs =>
      for (a <- bs; b <- bs if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = pairCnt.toSeq.flatMap { case ((a, b), nab) =>
      Seq((a, b, nab), (b, a, nab))
    }.filter(_._3 >= 2).map { case (ant, con, nab) =>
      (ant, con) -> (nab, itemCnt(ant), itemCnt(con), nOrders,
        fl(nab.toDouble / nOrders.toDouble), fl(nab.toDouble / itemCnt(ant).toDouble),
        fl(nab.toDouble * nOrders.toDouble / (itemCnt(ant).toDouble * itemCnt(con).toDouble)))
    }.toMap
    val got = SparkEntry.queries("agg_assoc_rules")(spark, sf0001)
      .collect().map { r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getDouble(6), r.getDouble(7), r.getDouble(8))
      }.toMap
    assert(got == expect)
    // lift is direction-free: a→b and b→a agree
    got.foreach { case ((a, b), row) =>
      assert(got((b, a))._7 == row._7, s"lift asymmetric for ($a, $b)")
    }
    assert(got.nonEmpty)
  }

  test("agg_cramers_v matches a driver contingency recompute; V in [0, 1]") {
    val rows = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf0001), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("c_mktsegment"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expect = rows.groupBy(_._1).map { case (region, rs) =>
      val cells = rs.groupBy(x => (x._2, x._3)).view.mapValues(_.length.toLong).toMap
      val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val n = rs.length.toLong
      val chi2 = cells.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, ((sg, pr), o)) =>
        val e = rt(sg).toDouble * ct(pr).toDouble / n.toDouble
        acc + (o.toDouble - e) * (o.toDouble - e) / e
      }
      val k = math.min(rt.size, ct.size).toLong - 1L
      region -> (n, math.floor(chi2 * 1e4) / 1e4,
        math.floor(math.sqrt(chi2 / (n.toDouble * k.toDouble)) * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("agg_cramers_v")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got == expect)
    got.values.foreach { case (_, _, v) => assert(v >= 0.0 && v <= 1.0, v) }
  }

  test("agg_hhi matches a driver recompute; HHI bounded by [1/n, 1]") {
    val rev = Tables.lineitem(spark, sf0001)
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(100.0))
          .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val supNation = Tables.supplier(spark, sf0001)
      .join(Tables.nation(spark, sf0001), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = rev.toSeq.map { case (sk, r) => (supNation(sk), sk, r) }
      .groupBy(_._1).map { case (nation, ss) =>
        val tot = ss.map(_._3).sum
        val hhi = ss.sortBy(_._2).foldLeft(0.0) { case (acc, (_, _, r)) =>
          val sh = r.toDouble / tot.toDouble; acc + sh * sh
        }
        nation -> (ss.length.toLong, tot, math.floor(hhi * 1e4) / 1e4)
      }
    val got = SparkEntry.queries("agg_hhi")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expect)
    got.values.foreach { case (n, _, hhi) =>
      assert(hhi <= 1.0 && hhi >= math.floor(1e4 / n.toDouble) / 1e4, (n, hhi))
    }
  }

  test("agg_survival_km matches a driver Kaplan-Meier recompute; survival non-increasing") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    val maxd = evs.map(_._2).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val users = evs.groupBy(_._1).values.map { es =>
      val f = es.map(_._2).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
      val conv = es.filter(e => e._3 == "purchase" && !e._4.isNaN && e._4 >= 200).map(_._2)
      if (conv.nonEmpty) {
        val p = conv.min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
        (p.toEpochDay - f.toEpochDay, 1L)
      } else (maxd.toEpochDay - f.toEpochDay, 0L)
    }.toSeq
    val nTotal = users.length.toLong
    val durs = users.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, us) =>
      (dur, us.length.toLong, us.map(_._2).sum)
    }
    var before = 0L
    val risk = durs.map { case (dur, allCnt, d) =>
      val r = (dur, nTotal - before, d); before += allCnt; r
    }.filter(_._3 > 0)
    val expect = risk.map { case (t, _, _) =>
      val s = risk.filter(_._1 <= t).foldLeft(1.0) { case (acc, (_, nr, dd)) =>
        acc * ((nr - dd).toDouble / nr.toDouble)
      }
      val (_, nr0, d0) = risk.find(_._1 == t).get
      (t, nr0, d0, math.floor(s * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("agg_survival_km")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // survival is non-increasing in t, and both states are live in the fixture
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 <= a._4, s"survival increased: $a -> $b")
      case _ =>
    }
    assert(got.map(_._3).sum < nTotal, "no censored user in fixture")
    assert(got.map(_._3).sum > 0, "no conversion event in fixture")
  }

  test("llm_recall_graph matches driver-side |graph ∩ exact top-4| / 4 per query") {
    val (sim, nbrs, _) = descentDriver(sf0001)
    val ids = nbrs.keys.toSeq.sorted
    // at sf0.001 every (norm>0) vector is inside the 500-query md5 budget
    val expect = ids.map { id =>
      val top4 = ids.filter(_ != id).sortBy(c => (-sim(id, c), c)).take(4).toSet
      val hits = (nbrs(id) intersect top4).size.toLong
      id -> (hits, math.floor(hits.toDouble / 4.0 * 1e4) / 1e4)
    }.toMap
    val got = SparkEntry.queries("llm_recall_graph")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    // liveness only: on the near-orthogonal random fixture 2 descent
    // rounds recover little of the true graph (~3% at sf0.001) — that
    // honest low number is exactly what this eval key exists to surface
    assert(got.values.exists(_._1 > 0), "no query recovered any true neighbor")
    assert(got.values.exists(_._1 < 4), "recall saturated — eval exercises nothing")
  }

  test("llm_cluster_eval: purity arithmetic from the shared Lloyd partition; occupancy matches llm_kmeans_lloyd") {
    val asg = graft.ops.Ivf.lloyd(
      Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding"),
          sqrt(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double") * x.cast("double"))).as("norm")),
      k = 8, rounds = 3)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val labels = Tables.embeddings(spark, sf0001).select("vec_id", "label")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val expect = asg.toSeq.groupBy(_._2).map { case (cell, ms) =>
      val counts = ms.map(m => labels(m._1)).groupBy(identity)
        .view.mapValues(_.size.toLong).toSeq
      val (majLabel, majN) = counts.minBy { case (l, c) => (-c, l) }
      cell -> (ms.size.toLong, majLabel, majN,
        math.floor(majN.toDouble / ms.size.toDouble * 1e4) / 1e4)
    }
    val got = SparkEntry.queries("llm_cluster_eval")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == labels.size.toLong, "not every vector assigned")
    val occ = SparkEntry.queries("llm_kmeans_lloyd")(spark, sf0001)
      .select("cell", "n_members").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap == occ,
      "cluster_eval and kmeans_lloyd disagree on the partition occupancy")
  }

  test("llm_source_card matches a driver recompute over the raw documents") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "lang", "n_chars", "text")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4).split(" ").count(_.nonEmpty).toLong))
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = docs.groupBy(_._1).map { case (source, ds) =>
      val nDocs = ds.length.toLong
      val nTokens = ds.map(_._4).sum
      val nChars = ds.map(_._3).sum
      val langCounts = ds.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val (topLang, topN) = langCounts.minBy { case (l, c) => (-c, l) }
      val nShort = ds.count(_._4 < 20).toLong
      source -> (nDocs, nTokens, nChars, langCounts.size.toLong, topLang,
        fl(topN.toDouble / nDocs.toDouble), fl(nTokens.toDouble / nDocs.toDouble),
        fl(nShort.toDouble / nDocs.toDouble))
    }
    val got = SparkEntry.queries("llm_source_card")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getDouble(6), r.getDouble(7), r.getDouble(8)))
      .toMap
    assert(got == expect)
    got.values.foreach { case (_, _, _, _, _, share, _, shortFrac) =>
      assert(share > 0.0 && share <= 1.0 && shortFrac >= 0.0 && shortFrac <= 1.0)
    }
  }

  test("sql_recursive_cte matches a driver-side tree walk (depth, root, path cost)") {
    val parts = Tables.part(spark, sf0001).select("p_partkey", "p_retailprice")
      .collect().map(r => r.getLong(0) -> math.floor(r.getDouble(1) * 100).toLong).toMap
    def chain(k: Long): List[Long] = if (k <= 9) List(k) else k :: chain(k / 10)
    val expect = parts.keys.toSeq.sorted.map { k =>
      val c = chain(k)
      (k, (c.length - 1).toLong, c.last, c.map(parts).sum)
    }
    val got = SparkEntry.queries("sql_recursive_cte")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // every part lands exactly once; the recursion actually deepens
    assert(got.length == parts.size)
    assert(got.map(_._2).max >= 2, "fixture tree too shallow to exercise recursion")
  }

  test("agg_winsorized_mean matches a driver order-statistic recompute") {
    val vals = Tables.events(spark, sf0001).where(col("value").isNotNull)
      .select(col("event_type"), floor(col("value") * 1e6).cast("long").as("vq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = vals.groupBy(_._1).map { case (tpe, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      val vLo = sorted(((n + 9) / 10 - 1).toInt)
      val vHi = sorted(((9 * n + 9) / 10 - 1).toInt)
      val wsum = sorted.map(v => math.max(math.min(v, vHi), vLo)).map(BigInt(_)).sum
      val kept = sorted.filter(v => v >= vLo && v <= vHi)
      tpe -> (n, fl(vLo.toDouble / 1e6), fl(vHi.toDouble / 1e6),
        fl(wsum.toDouble / n.toDouble / 1e6), kept.length.toLong,
        fl(kept.map(BigInt(_)).sum.toDouble / kept.length.toDouble / 1e6))
    }
    val got = SparkEntry.queries("agg_winsorized_mean")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got == expect)
    got.values.foreach { case (n, p10, p90, wm, nk, tm) =>
      assert(p10 <= wm && wm <= p90, (p10, wm, p90))
      assert(p10 <= tm && tm <= p90, (p10, tm, p90))
      assert(nk < n, "trim kept everything — cuts exercise nothing")
    }
  }

  test("llm_tokenizer_fertility is consistent with llm_bpe_encode's per-doc totals") {
    val docLang = Tables.documents(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = SparkEntry.queries("llm_bpe_encode")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = perDoc.groupBy(d => docLang(d._1)).map { case (lang, ds) =>
      val nChars = ds.map(_._2).sum
      val nBpe = ds.map(_._3).sum
      lang -> (nChars, nBpe)
    }
    val got = SparkEntry.queries("llm_tokenizer_fertility")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.view.mapValues(v => (v._2, v._3)).toMap == expect,
      "lang rollup diverged from the per-doc encoder totals")
    // word counts from a direct recount; ratio arithmetic from the totals
    val wordCounts = Tables.documents(spark, sf0001).select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    got.foreach { case (lang, (nw, nc, nb, fert, cpt)) =>
      assert(nw == wordCounts(lang))
      assert(fert == fl(nb.toDouble / nw.toDouble))
      assert(cpt == fl(nc.toDouble / nb.toDouble))
      assert(fert >= 1.0, "a word encodes to at least one symbol")
      assert(cpt >= 1.0, "a symbol holds at least one char")
      assert(nb < nc, s"$lang: merges never fired — fertility degenerate")
    }
  }

  test("llm_ngram_lm_interp matches a driver recompute; interpolation bound vs raw MLE holds") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val bigrams = docs.flatMap { case (id, ts) => ts.sliding(2).collect {
      case Seq(a, b) => (id, a, b) } }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val allToks = docs.flatMap(_._2)
    val cu = allToks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = allToks.length.toLong
    val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
      val nll = bs.map { case (_, a, b) =>
        -math.log(0.5 * (c2((a, b)).toDouble / c1(a)) + 0.5 * (cu(b).toDouble / total))
      }
      id -> (bs.length.toLong, nll.sum / nll.length)
    }
    val got = SparkEntry.queries("llm_ngram_lm_interp")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (n, v)) =>
      assert(n == expect(id)._1)
      assert(math.abs(v - expect(id)._2) < 2e-4, s"doc $id: $v vs ${expect(id)._2}")
    }
    // p_interp >= 0.5 * p_ML per bigram ⇒ interp NLL <= raw MLE NLL + ln 2
    val raw = SparkEntry.queries("llm_bigram_nll")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.foreach { case (id, (_, v)) =>
      assert(v <= raw(id) + math.log(2.0) + 1e-3, s"doc $id breaks the smoothing bound")
    }
  }

  // shared fixture for the three r9 rolling-window keys: per-user series
  // ordered by (ts, event_id), values µ-quantized
  private def userSeries(): Map[Long, Seq[(Long, Long)]] =
    Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        floor(col("value") * 1e6).cast("long").as("vq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).map(e => (e._3, e._4)).toSeq).toMap

  test("win_rolling_regression matches a driver OLS recompute on every full frame") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = userSeries().values.flatMap { series =>
      series.indices.drop(15).map { i =>
        val ys = (0 to 15).map(p => series(i - 15 + p)._2)
        val sy = ys.sum
        val sxy = (0 to 15).map(p => p.toLong * ys(p)).sum
        val sy2 = ys.map(y => BigInt(y) * BigInt(y)).sum
        val num = 16.0 * sxy.toDouble - 120.0 * sy.toDouble
        val denY = 16.0 * sy2.toDouble - sy.toDouble * sy.toDouble
        (series(i)._1, (fl(num / 5440.0),
          fl((1240.0 * sy.toDouble - 120.0 * sxy.toDouble) / 5440.0),
          if (denY > 0) Some(fl(num * num / (5440.0 * denY))) else None))
      }
    }.toMap
    val got = SparkEntry.queries("win_rolling_regression")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == expect)
    got.values.flatMap(_._3).foreach(r2 => assert(r2 >= -1e-4 && r2 <= 1.0000001, r2))
    assert(got.nonEmpty)
  }

  test("win_bollinger matches a driver recompute; bands ordered, all flags live") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = userSeries().values.flatMap { series =>
      series.indices.drop(7).map { i =>
        val ys = (0 to 7).map(p => series(i - 7 + p)._2)
        val s1 = ys.sum
        val s2 = ys.map(y => BigInt(y) * BigInt(y)).sum
        val mean = s1.toDouble / 8.0
        val sigma = math.sqrt((8.0 * s2.toDouble - s1.toDouble * s1.toDouble) / 64.0)
        val vq = series(i)._2
        val flag = if (vq.toDouble > mean + 2.0 * sigma) 1L
          else if (vq.toDouble < mean - 2.0 * sigma) -1L else 0L
        (series(i)._1,
          (fl(mean / 1e6), fl((mean + 2.0 * sigma) / 1e6), fl((mean - 2.0 * sigma) / 1e6), flag))
      }
    }.toMap
    val got = SparkEntry.queries("win_bollinger")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got == expect)
    got.values.foreach { case (mid, up, lo, _) =>
      assert(lo <= mid && mid <= up, (lo, mid, up))
    }
  }

  test("win_changepoint matches a driver brute-force best split; gain non-negative") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = userSeries().toSeq.collect { case (uid, series) if series.length >= 2 =>
      val ys = series.map(_._2)
      def sse(vs: Seq[Long]): Double = {
        val s1 = vs.sum; val s2 = vs.map(y => BigInt(y) * BigInt(y)).sum
        s2.toDouble - s1.toDouble * s1.toDouble / vs.length.toDouble
      }
      val full = sse(ys)
      val candidates = (1 until ys.length).map { k =>
        (sse(ys.take(k)) + sse(ys.drop(k)), series(k - 1)._1, k.toLong)
      }
      val best = candidates.minBy(c => (c._1, c._2))
      uid -> (ys.length.toLong, best._2, best._3, fl(full / 1e12), fl(best._1 / 1e12),
        if (full > 0) Some(fl((full - best._1) / full)) else None)
    }.toMap
    val got = SparkEntry.queries("win_changepoint")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(got == expect)
    got.values.foreach { case (_, _, _, full, split, gain) =>
      assert(split <= full + 1e-4, (split, full))
      gain.foreach(g => assert(g >= 0.0 && g <= 1.0, g))
    }
    assert(got.nonEmpty)
  }

  private def numAt(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private def custRegion(): Map[Long, String] = {
    val nat = Tables.nation(spark, sf0001).select("n_nationkey", "n_regionkey")
      .collect().map(r => numAt(r, 0) -> numAt(r, 1)).toMap
    val reg = Tables.region(spark, sf0001).select("r_regionkey", "r_name")
      .collect().map(r => numAt(r, 0) -> r.getString(1)).toMap
    nat.view.mapValues(reg).toMap
  }

  private def custSpendCents(): Map[Long, Long] = Tables.orders(spark, sf0001)
    .select(col("o_custkey"), floor(col("o_totalprice") * 100.0).cast("long").as("c"))
    .collect().map(r => (numAt(r, 0), r.getLong(1)))
    .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  test("agg_spearman matches a driver tie-averaged rank recompute") {
    val natReg = custRegion()
    val spend = custSpendCents()
    val rows = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (natReg(numAt(r, 1)), math.floor(r.getDouble(2) * 100.0).toLong,
        spend.getOrElse(numAt(r, 0), 0L)))
    // doubled average rank per distinct value: 2·cumBefore + cnt + 1
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var cum = 0L
      hist.keys.toSeq.sorted.map { v =>
        val c = hist(v); val r = 2 * cum + c + 1; cum += c; v -> r
      }.toMap
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = rows.groupBy(_._1).map { case (reg, rs) =>
      val rb = rank2(rs.toSeq.map(_._2)); val rsp = rank2(rs.toSeq.map(_._3))
      val xs = rs.toSeq.map(t => rb(t._2)); val ys = rs.toSeq.map(t => rsp(t._3))
      val n = rs.length.toDouble
      val sx = xs.map(BigInt(_)).sum; val sy = ys.map(BigInt(_)).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
      val sxx = xs.map(a => BigInt(a) * BigInt(a)).sum
      val syy = ys.map(a => BigInt(a) * BigInt(a)).sum
      val rho = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble)
          * math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble))
      reg -> (rs.length.toLong, fl(rho))
    }
    val got = SparkEntry.queries("agg_spearman")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    got.values.foreach { case (_, rho) => assert(rho >= -1.0 && rho <= 1.0, rho) }
  }

  test("agg_mutual_info matches a driver contingency recompute") {
    val natReg = custRegion()
    val pairs = Tables.customer(spark, sf0001).select("c_mktsegment", "c_nationkey")
      .collect().map(r => (r.getString(0), natReg(numAt(r, 1))))
    val joint = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val margx = joint.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val margy = joint.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val n = joint.values.sum.toDouble
    // same fold orders as the engines: MI by (seg, region); H by key
    val mi = joint.toSeq.sortBy(t => (t._1._1, t._1._2)).foldLeft(0.0) { case (acc, ((s, g), c)) =>
      acc + c.toDouble / n * math.log(c.toDouble * n / (margx(s).toDouble * margy(g).toDouble))
    }
    val hs = margx.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
      acc + -(c.toDouble / n) * math.log(c.toDouble / n)
    }
    val hr = margy.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, c)) =>
      acc + -(c.toDouble / n) * math.log(c.toDouble / n)
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val r = SparkEntry.queries("agg_mutual_info")(spark, sf0001).collect().head
    assert(r.getLong(0) == n.toLong)
    assert(r.getDouble(1) == fl(mi))
    assert(r.getDouble(2) == fl(hs))
    assert(r.getDouble(3) == fl(hr))
    assert(r.getDouble(4) == fl(mi / math.sqrt(hs * hr)))
    // information inequalities (floor slack): 0 ≤ MI ≤ min(H); NMI ∈ [0,1]
    assert(r.getDouble(1) >= -1e-4 && r.getDouble(1) <= math.min(hs, hr) + 1e-4)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-4)
  }

  test("agg_price_elasticity matches a driver exact-moment OLS recompute") {
    val brandOf = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .collect().map(r => numAt(r, 0) -> r.getString(1)).toMap
    val pts = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_extendedprice", "l_quantity").collect()
      .map { r =>
        val ep = r.getDouble(1); val q = r.getDouble(2)
        (brandOf(numAt(r, 0)),
          math.floor(math.log(ep / q) * 1e6).toLong,
          math.floor(math.log(q) * 1e6).toLong)
      }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = pts.groupBy(_._1).map { case (b, ps) =>
      val n = ps.length.toDouble
      val sx = ps.map(p => BigInt(p._2)).sum; val sy = ps.map(p => BigInt(p._3)).sum
      val sxy = ps.map(p => BigInt(p._2) * BigInt(p._3)).sum
      val sxx = ps.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val syy = ps.map(p => BigInt(p._3) * BigInt(p._3)).sum
      val dx = n * sxx.toDouble - sx.toDouble * sx.toDouble
      val dy = n * syy.toDouble - sy.toDouble * sy.toDouble
      val num = n * sxy.toDouble - sx.toDouble * sy.toDouble
      val slope = if (dx > 0) Some(num / dx) else None
      b -> (ps.length.toLong,
        slope.map(fl),
        slope.map(s => fl((sy.toDouble / n - s * (sx.toDouble / n)) / 1e6)),
        if (dy > 0) slope.map(s => fl(s * num / dy)) else None)
    }
    val got = SparkEntry.queries("agg_price_elasticity")(spark, sf0001)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getString(0) -> (r.getLong(1), opt(2), opt(3), opt(4))
      }.toMap
    assert(got == expect)
    got.values.foreach { case (_, _, _, r2) =>
      r2.foreach(v => assert(v >= -1e-4 && v <= 1.0 + 1e-4, v))
    }
  }

  test("agg_markov_steady matches a driver power-iteration recompute; mass conserved") {
    val evs = Tables.events(spark, sf0001)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"), col("event_type"))
      .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2, t._3))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.map(_._4).toSeq.sliding(2).collect { case Seq(a, b) => (a, b) }
    }
    val counts = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = counts.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val p = counts.map { case ((a, b), c) => (a, b) -> c.toDouble / rowTot(a).toDouble }
    val states = (counts.keys.map(_._1) ++ counts.keys.map(_._2)).toSeq.distinct.sorted
    var v: Map[String, Double] = states.map(_ -> 1.0 / states.length.toDouble).toMap
    (1 to 3).foreach { _ =>
      v = states.map { st =>
        val terms = p.collect { case ((a, b), pp) if b == st => (a, v(a) * pp) }
          .toSeq.sortBy(_._1)
        st -> terms.foldLeft(0.0)(_ + _._2)
      }.toMap
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val got = SparkEntry.queries("agg_markov_steady")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == v.view.mapValues(fl).toMap)
    // chain has no dangling state at fixture scale ⇒ mass conserved up to floor slack
    val mass = got.values.sum
    assert(mass >= 1.0 - got.size * 1e-4 && mass <= 1.0 + 1e-9, mass)
  }

  test("agg_pareto matches a driver coverage recompute; decile dominance holds") {
    val natReg = custRegion()
    val spend = custSpendCents()
    val rows = Tables.customer(spark, sf0001).select("c_custkey", "c_nationkey").collect()
      .map(r => (natReg(numAt(r, 1)), numAt(r, 0), spend.getOrElse(numAt(r, 0), 0L)))
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = rows.groupBy(_._1).map { case (reg, rs) =>
      val sorted = rs.toSeq.sortBy(t => (-t._3, t._2))
      val n = sorted.length.toLong
      val tot = sorted.map(_._3).sum
      var cum = 0L; var k80 = 0L
      sorted.foreach { t => if (cum * 5 < tot * 4) k80 += 1; cum += t._3 }
      val topn = (n + 9) / 10
      val top10 = sorted.take(topn.toInt).map(_._3).sum
      reg -> (n, tot, k80, fl(k80.toDouble / n.toDouble), fl(top10.toDouble / tot.toDouble))
    }
    val got = SparkEntry.queries("agg_pareto")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got == expect)
    got.values.foreach { case (n, _, k80, k80f, top10) =>
      assert(k80 >= 1 && k80 <= n, (k80, n))
      // top decile of a descending sort carries at least its uniform share
      assert(top10 >= 0.1 - 1e-4, top10)
      assert(k80f <= 1.0, k80f)
    }
  }

  /** Per-user (value ordered by µs ts, event_id) series, nulls dropped —
    * the shared input of the finance-window recomputes. */
  private def valueSeries(): Map[Long, Seq[Double]] = Tables.events(spark, sf0001)
    .where(col("value").isNotNull)
    .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"), col("value"))
    .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .groupBy(_._1).view.mapValues(_.toSeq.sortBy(t => (t._2, t._3)).map(_._4)).toMap

  test("win_macd matches a driver nested-EMA recompute") {
    def ema(vs: Seq[Double], num: Double, den: Double): Double = {
      val a = num / den; val b = (den - num) / den
      vs.tail.foldLeft(vs.head)((acc, x) => a * x + b * acc)
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    // keyed by event_id: rebuild the (user, pos) → event_id mapping
    val evIds = Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"))
      .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(t => (t._2, t._3)).map(_._3)).toMap
    val expect = valueSeries().flatMap { case (u, vs) =>
      vs.indices.drop(40).map { i =>
        val l = vs.slice(i - 40, i + 1) // 41 samples
        val m = (8 to 0 by -1).map { j =>
          val sl = l.slice(8 - j, 8 - j + 33)
          ema(sl, 2.0, 13.0) - ema(sl, 2.0, 27.0)
        }
        val sig = m.tail.foldLeft(m.head)((acc, x) => 0.2 * x + 0.8 * acc)
        val macd = m.last
        evIds(u)(i) -> (fl(macd), fl(sig), fl(macd - sig),
          if (macd > sig) 1L else if (macd < sig) -1L else 0L)
      }
    }
    val got = SparkEntry.queries("win_macd")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
    assert(got.values.map(_._4).toSet.subsetOf(Set(-1L, 0L, 1L)))
  }

  test("win_stochastic matches a driver envelope recompute; %K bounded") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val evIds = Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"))
      .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(t => (t._2, t._3)).map(_._3)).toMap
    val expect = valueSeries().flatMap { case (u, vs) =>
      val vq = vs.map(v => math.floor(v * 1e6).toLong)
      val ks = vq.indices.drop(13).map { i =>
        val w = vq.slice(i - 13, i + 1)
        val (mn, mx) = (w.min, w.max)
        if (mx > mn) fl((vq(i) - mn).toDouble / (mx - mn).toDouble * 100.0) else 50.0
      }
      ks.indices.map { p =>
        val d = if (p >= 2) Some(fl((ks(p - 2) + ks(p - 1) + ks(p)) / 3.0)) else None
        val zone = if (ks(p) > 80.0) 1L else if (ks(p) < 20.0) -1L else 0L
        evIds(u)(p + 13) -> (ks(p), d, zone)
      }
    }
    val got = SparkEntry.queries("win_stochastic")(spark, sf0001)
      .collect().map { r =>
        val d = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        r.getLong(0) -> (r.getDouble(2), d, r.getLong(4))
      }.toMap
    assert(got == expect)
    got.values.foreach { case (k, _, _) => assert(k >= 0.0 && k <= 100.0, k) }
  }

  test("win_vwap matches a driver running-ratio recompute; vwap inside price range") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val rows = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("sd"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getDouble(5)))
    // (orderkey, linenumber) is NOT unique in the synthetic lineitem —
    // compare the full output as a multiset, not a keyed map
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (pk, ls) =>
      val sorted = ls.toSeq
        .sortBy(t => (t._2, t._3, t._4, math.floor(t._5 * 100.0).toLong, math.floor(t._6).toLong))
      var cp = 0L; var cq = 0L
      sorted.map { t =>
        cp += math.floor(t._5 * 100.0).toLong; cq += math.floor(t._6).toLong
        (t._3, t._4, pk, fl(cp.toDouble / cq.toDouble / 100.0), cq)
      }
    }.groupBy(identity).view.mapValues(_.size).toMap
    val got = SparkEntry.queries("win_vwap")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq.groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expect)
    got.keys.foreach { case (_, _, _, v, cq) => assert(v > 0 && cq > 0) }
  }

  test("win_runs_test matches a driver recompute; counts consistent") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = valueSeries().flatMap { case (u, vs) =>
      val vq = vs.map(v => math.floor(v * 1e6).toLong)
      val sgns = vq.sliding(2).collect {
        case Seq(a, b) if b != a => if (b > a) 1 else -1
      }.toSeq
      if (sgns.isEmpty) None else {
        val n = sgns.length.toLong
        val n1 = sgns.count(_ == 1).toLong; val n2 = n - n1
        val runs = 1L + sgns.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
        val z = if (n1 > 0 && n2 > 0 && n > 1 && 2 * n1 * n2 > n) {
          val t = 2.0 * n1.toDouble * n2.toDouble
          val nd = n.toDouble
          val mu = 1.0 + t / nd
          val vr = t * (t - nd) / (nd * nd * (nd - 1.0))
          Some(fl((runs.toDouble - mu) / math.sqrt(vr)))
        } else None
        Some(u -> (n, n1, n2, runs, z))
      }
    }
    val got = SparkEntry.queries("win_runs_test")(spark, sf0001)
      .collect().map { r =>
        val z = if (r.isNullAt(5)) None else Some(r.getDouble(5))
        numAt(r, 0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), z)
      }.toMap
    assert(got == expect.toMap)
    got.values.foreach { case (n, n1, n2, runs, _) =>
      assert(n1 + n2 == n)
      assert(runs >= 1 && runs <= n, (runs, n))
    }
  }

  test("llm_self_bleu matches a driver clipped-ngram recompute") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._3.length >= 2)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    def counts(g: Seq[String]) = g.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def clip(c: Map[String, Long], r: Map[String, Long]) =
      c.map { case (g, n) => math.min(n, r.getOrElse(g, 0L)) }.sum
    val expect = docs.groupBy(_._2).flatMap { case (_, ds) =>
      ds.toSeq.sortBy(_._1).sliding(2).collect { case Seq((cid, _, ct), (rid, _, rt)) =>
        val m1 = clip(counts(ct), counts(rt))
        val m2 = clip(counts(ct.sliding(2).map(_.mkString(" ")).toSeq),
          counts(rt.sliding(2).map(_.mkString(" ")).toSeq))
        val (cl, rl) = (ct.length.toLong, rt.length.toLong)
        val p1 = m1.toDouble / cl.toDouble
        val p2 = m2.toDouble / (cl - 1).toDouble
        val bp = math.min(1.0, math.exp(1.0 - rl.toDouble / cl.toDouble))
        cid -> (rid, m1, m2, p1, p2, fl(bp), fl(bp * math.sqrt(p1 * p2)))
      }
    }
    val got = SparkEntry.queries("llm_self_bleu")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(got == expect.toMap)
    got.values.foreach { case (_, _, _, p1, p2, bp, bleu) =>
      assert(p1 >= 0.0 && p1 <= 1.0, p1)
      assert(p2 >= 0.0 && p2 <= 1.0, p2)
      assert(bleu <= bp + 1e-9, (bleu, bp))
    }
    // the diversity eval is non-degenerate on the shared-vocabulary corpus:
    // unigram overlap is high, exact bigram echo is not universal
    assert(got.values.exists(_._4 > 0.5))
    assert(got.values.exists(_._7 < 1.0))
  }

  test("llm_embed_outliers matches a driver recompute; mean d² identity holds") {
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "label", "embedding")
      .collect().map(r => (r.getLong(0), numAt(r, 1),
        r.getSeq[Float](2).map(f => math.floor(f.toDouble * 1e6).toLong)))
    val dims = vecs.head._3.length
    val n = vecs.length.toDouble
    val stats = (0 until dims).map { d =>
      val xs = vecs.map(_._3(d))
      val sx = xs.map(BigInt(_)).sum; val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      (sx.toDouble / n, (n * sxx.toDouble - sx.toDouble * sx.toDouble) / (n * n))
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = vecs.map { case (id, lab, xs) =>
      val d2 = (0 until dims).foldLeft(0.0) { (acc, d) =>
        val (mu, vr) = stats(d)
        acc + (if (vr > 0) (xs(d).toDouble - mu) * (xs(d).toDouble - mu) / vr else 0.0)
      }
      id -> (lab, fl(d2), if (d2 > 96.0) 1L else 0L)
    }.toMap
    val got = SparkEntry.queries("llm_embed_outliers")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (numAt(r, 1), r.getDouble(2), r.getLong(3))).toMap
    assert(got == expect)
    // Σ_v (x−μ)²/σ̂² = n per dim under the population variance ⇒
    // mean d² = dims·(n−1)/n... exactly dims·n/n = dims (biased σ̂² uses n)
    val mean = got.values.map(_._2).sum / got.size
    assert(math.abs(mean - dims) < 1e-3, mean)
    assert(got.values.exists(_._3 == 1L) || got.values.forall(_._2 <= 96.0))
  }

  test("sql_group_by_all infers the same grouping as the explicit GROUP BY") {
    graft.Catalog.registerAll(spark, sf0001)
    val inferred = SparkEntry.queries("sql_group_by_all")(spark, sf0001).collect()
    val explicitly = spark.sql(
      """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY event_type, CAST(ts AS DATE)
        |ORDER BY event_type, day""".stripMargin).collect()
    assert(inferred.toSeq == explicitly.toSeq)
    assert(inferred.nonEmpty)
  }

  test("win_hurst matches a driver exact-integer R/S recompute") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val evIds = Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"))
      .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(t => (t._2, t._3)).map(_._3)).toMap
    val expect = valueSeries().flatMap { case (u, vs) =>
      val vq = vs.map(v => math.floor(v * 1e6).toLong)
      vq.indices.drop(31).map { i =>
        val w = vq.slice(i - 31, i + 1)
        val s1 = w.sum
        val s2 = w.map(x => BigInt(x) * BigInt(x)).sum
        var run = 0L; var mn = Long.MaxValue; var mx = Long.MinValue + 1
        w.zipWithIndex.foreach { case (x, k) =>
          run += x
          val dev = 32L * run - (k + 1L) * s1
          mn = math.min(mn, dev); mx = math.max(mx, dev)
        }
        val varn = (BigInt(32) * s2 - BigInt(s1) * BigInt(s1)).toDouble
        val out = if (varn > 0) {
          val rs = (mx - mn).toDouble / math.sqrt(varn)
          (Some(fl(rs)), Some(fl(math.log(rs) / math.log(16.0))))
        } else (None, None)
        evIds(u)(i) -> out
      }
    }
    val got = SparkEntry.queries("win_hurst")(spark, sf0001)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getLong(0) -> (opt(2), opt(3))
      }.toMap
    assert(got == expect.toMap)
    got.values.foreach { case (rs, _) => rs.foreach(v => assert(v > 0, v)) }
    assert(got.nonEmpty)
  }

  test("agg_dow_hour matches a driver recompute; calendar cells bounded") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val rows = Tables.events(spark, sf0001)
      .select(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("ed"),
        expr("hour(ts)").as("hr"), col("value"))
      .collect().map(r => ((numAt(r, 0) + 4) % 7, numAt(r, 1),
        if (r.isNullAt(2)) None else Some(math.floor(r.getDouble(2) * 100).toLong)))
    val expect = rows.groupBy(t => (t._1, t._2)).map { case (k, vs) =>
      val cents = vs.flatMap(_._3)
      k -> (vs.size.toLong, cents.sum, fl(cents.sum.toDouble / cents.size.toDouble / 100.0))
    }
    val got = SparkEntry.queries("agg_dow_hour")(spark, sf0001)
      .collect().map(r => (numAt(r, 0), numAt(r, 1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == expect)
    got.keys.foreach { case (dow, hr) =>
      assert(dow >= 0 && dow <= 6 && hr >= 0 && hr <= 23, (dow, hr))
    }
    assert(got.values.map(_._1).sum == rows.length.toLong)
  }

  test("win_series_features matches a driver exact-moment recompute") {
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = valueSeries().map { case (u, vs) =>
      val vq = vs.map(v => math.floor(v * 1e6).toLong)
      val n = vq.length.toLong
      val s1 = vq.sum
      val s2 = vq.map(x => BigInt(x) * BigInt(x)).sum
      val sxy = vq.sliding(2).collect { case Seq(a, b) => BigInt(a) * BigInt(b) }.sum
      val stx = vq.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
      val crossings = vq.map(x => BigInt(n) * BigInt(x) > BigInt(s1))
        .sliding(2).count { case Seq(a, b) => a != b; case _ => false }.toLong
      val varn = (BigInt(n) * s2 - BigInt(s1) * BigInt(s1)).toDouble
      val acfNum = (BigInt(n) * BigInt(n) * sxy
        - BigInt(n) * BigInt(s1) * (BigInt(2) * BigInt(s1) - vq.last - vq.head)
        + BigInt(n - 1) * BigInt(s1) * BigInt(s1)).toDouble
      val acfDen = (BigInt(n) * (BigInt(n) * s2 - BigInt(s1) * BigInt(s1))).toDouble
      val st = BigInt(n) * BigInt(n + 1) / 2
      val stt = BigInt(n) * BigInt(n + 1) * BigInt(2 * n + 1) / 6
      val slNum = (BigInt(n) * stx - st * BigInt(s1)).toDouble
      val slDen = (BigInt(n) * stt - st * st).toDouble
      val nd = n.toDouble
      u -> (n, fl(s1.toDouble / nd / 1e6),
        if (varn > 0) Some(fl(math.sqrt(varn) / nd / 1e6)) else None,
        if (varn > 0 && n > 2) Some(fl(acfNum / acfDen)) else None,
        if (n > 1) Some(fl(slNum / slDen / 1e6)) else None,
        if (n > 1) Some(fl(crossings.toDouble / (nd - 1.0))) else None)
    }
    val got = SparkEntry.queries("win_series_features")(spark, sf0001)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        numAt(r, 0) -> (r.getLong(1), r.getDouble(2), opt(3), opt(4), opt(5), opt(6))
      }.toMap
    assert(got == expect.toMap)
    got.values.foreach { case (_, _, _, acf, _, cr) =>
      acf.foreach(a => assert(a >= -1.0 - 1e-4 && a <= 1.0 + 1e-4, a))
      cr.foreach(c => assert(c >= 0.0 && c <= 1.0, c))
    }
  }

  test("store_diff classifies all four change classes with exact counts") {
    val base = Tables.events(spark, sf0001).select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(math.floor(r.getDouble(2) * 100).toLong)))
    val expect = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    base.foreach { case (_, et, c) =>
      et match {
        case "error"    => expect((et, "removed")) += 1
        case "click"    =>
          // doubled cents differ unless cents is 0 or NULL (null-safe equal)
          if (c.exists(_ != 0L)) expect((et, "changed")) += 1
          else expect((et, "unchanged")) += 1
        case "purchase" =>
          expect((et, "unchanged")) += 1 // original row keeps its value
          expect((et, "added")) += 1     // +10M twin has no base row
        case other      => expect((other, "unchanged")) += 1
      }
    }
    val got = SparkEntry.queries("store_diff")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect.toMap)
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(got.keys.map(_._2).toSet), "all four change classes must be live")
  }

  test("llm_bradley_terry matches a driver MM recompute; mean strength pinned at 1") {
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), numAt(r, 2)))
      .map { case (id, src, nc) =>
        val h = md5hex(id.toString)
        (java.lang.Long.parseLong(h.substring(0, 4), 16) % 256, h, id, src, nc)
      }
    val duels = docs.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      ds.toSeq.sortBy(t => (t._2, t._3)).sliding(2).collect {
        case Seq((_, _, _, s1, n1), (_, _, _, s2, n2)) if s1 != s2 && n1 != n2 =>
          if (n1 > n2) (s1, s2) else (s2, s1)
      }
    }
    val cells = duels.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val games = (cells.toSeq.map { case ((i, j), w) => ((i, j), w) } ++
      cells.toSeq.map { case ((i, j), w) => ((j, i), w) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wins = cells.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val srcs = games.keys.map(_._1).toSeq.distinct.sorted
    val k = srcs.length.toDouble
    var sv: Map[String, Double] = srcs.map(_ -> 1.0).toMap
    (1 to 3).foreach { _ =>
      val raw = srcs.map { i =>
        val den = games.collect { case ((a, j), nij) if a == i => (j, nij) }
          .toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (j, nij)) => acc + nij.toDouble / (sv(i) + sv(j)) }
        i -> wins.getOrElse(i, 0L).toDouble / den
      }
      val tot = raw.sortBy(_._1).foldLeft(0.0)(_ + _._2)
      sv = raw.map { case (i, s) => i -> (s * k / tot) }.toMap
    }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val got = SparkEntry.queries("llm_bradley_terry")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val expect = srcs.map(i => i ->
      (games.collect { case ((a, _), nij) if a == i => nij }.sum,
        wins.getOrElse(i, 0L), fl(sv(i)))).toMap
    assert(got == expect)
    val mean = got.values.map(_._3).sum / got.size
    assert(math.abs(mean - 1.0) < 1e-3, mean)
  }

  test("agg_mix_decompose matches a driver recompute; decomposition identity holds") {
    val rows = Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("event_type"),
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("ed"), col("value"))
      .collect().map(r => (r.getString(0), numAt(r, 1), math.floor(r.getDouble(2) * 100).toLong))
    val (d0, d1) = (rows.map(_._2).min, rows.map(_._2).max)
    def side(ed: Long) = if (ed * 2 <= d0 + d1) "A" else "B"
    val cells = rows.groupBy(t => (t._1, side(t._2)))
      .view.mapValues(vs => (vs.size.toLong, vs.map(_._3).sum)).toMap
    val tot = cells.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2._1).sum).toMap
    def wr(et: String, p: String): Option[(Double, Double)] = cells.get((et, p))
      .map { case (c, sc) => (c.toDouble / tot(p).toDouble, sc.toDouble / c.toDouble / 100.0) }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val ets = rows.map(_._1).distinct.sorted
    val expect = ets.map { et =>
      val a = wr(et, "A"); val b = wr(et, "B")
      val wa = a.map(_._1).getOrElse(0.0); val wb = b.map(_._1).getOrElse(0.0)
      et -> (fl(wa), fl(wb), a.map(t => fl(t._2)), b.map(t => fl(t._2)),
        fl((wb - wa) * a.map(_._2).getOrElse(0.0)),
        fl(wb * (b.map(_._2).getOrElse(0.0) - a.map(_._2).getOrElse(0.0))))
    }.toMap
    val got = SparkEntry.queries("agg_mix_decompose")(spark, sf0001)
      .collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), opt(3), opt(4),
          r.getDouble(5), r.getDouble(6))
      }.toMap
    assert(got == expect)
    // the identity the decomposition exists for: Σ(mix + rate) == R_B − R_A
    val rA = cells.collect { case ((_, "A"), (c, sc)) => (c, sc) }
    val rB = cells.collect { case ((_, "B"), (c, sc)) => (c, sc) }
    def rate(xs: Iterable[(Long, Long)]) =
      xs.map(_._2).sum.toDouble / xs.map(_._1).sum.toDouble / 100.0
    val sumContrib = ets.map { et =>
      val a = wr(et, "A"); val b = wr(et, "B")
      val wa = a.map(_._1).getOrElse(0.0); val wb = b.map(_._1).getOrElse(0.0)
      (wb - wa) * a.map(_._2).getOrElse(0.0) +
        wb * (b.map(_._2).getOrElse(0.0) - a.map(_._2).getOrElse(0.0))
    }.sum
    assert(math.abs(sumContrib - (rate(rB) - rate(rA))) < 1e-9)
  }

  test("agg_ab_srm hash split is balanced and exactly recomputable") {
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = Tables.events(spark, sf0001).select("user_id").distinct()
      .collect().map(r => numAt(r, 0))
    val arms = users.map(u => java.lang.Long.parseLong(md5hex(u.toString).substring(0, 8), 16) % 2)
    val n0 = arms.count(_ == 0L).toLong; val n1 = arms.length - n0
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val chi2 = fl((n0 - n1).toDouble * (n0 - n1).toDouble / (n0 + n1).toDouble)
    val r = SparkEntry.queries("agg_ab_srm")(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((n0, n1, chi2)))
    assert(r.getLong(0) + r.getLong(1) == users.length.toLong)
    assert(r.getLong(3) == (if (chi2 > 3.84) 1L else 0L))
  }

  test("win_sax matches a driver PAA recompute; words use the full alphabet") {
    val evIds = Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"), col("event_id"))
      .collect().map(r => (numAt(r, 0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(t => (t._2, t._3)).map(_._3)).toMap
    val expect = valueSeries().flatMap { case (u, vs) =>
      val vq = vs.map(v => math.floor(v * 1e6).toLong)
      vq.indices.drop(15).map { i =>
        val w = vq.slice(i - 15, i + 1)
        val s1 = w.sum
        val s2 = w.map(x => BigInt(x) * BigInt(x)).sum
        val varn = (BigInt(16) * s2 - BigInt(s1) * BigInt(s1)).toDouble
        val word = (0 to 3).map { k =>
          val seg = w.slice(4 * k, 4 * k + 4).sum
          if (varn <= 0) 'b'
          else {
            val z = (seg * 4 - s1).toDouble / math.sqrt(varn)
            if (z < -0.6745) 'a' else if (z < 0.0) 'b' else if (z < 0.6745) 'c' else 'd'
          }
        }.mkString
        evIds(u)(i) -> word
      }
    }
    val got = SparkEntry.queries("win_sax")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == expect.toMap)
    // a random-ish series exercises the whole alphabet somewhere
    assert(got.values.flatten.toSet == Set('a', 'b', 'c', 'd'))
  }

  test("llm_cohens_kappa matches a driver confusion recompute; kappa bounded") {
    val js = Tables.documents(spark, sf0001).select("text", "n_chars")
      .collect().map { r =>
        val toks = r.getString(0).split(" ").filter(_.nonEmpty)
        val j1 = if (numAt(r, 1) >= 300) 1 else 0
        val j2 = if (toks.distinct.length * 2 >= toks.length) 1 else 0
        (j1, j2)
      }
    val n = js.length.toDouble
    val n11 = js.count(_ == ((1, 1))).toLong; val n10 = js.count(_ == ((1, 0))).toLong
    val n01 = js.count(_ == ((0, 1))).toLong; val n00 = js.count(_ == ((0, 0))).toLong
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01).toDouble
      + (n00 + n01).toDouble * (n00 + n10).toDouble) / (n * n)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val r = SparkEntry.queries("llm_cohens_kappa")(spark, sf0001).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((n11, n10, n01, n00)))
    assert(r.getDouble(5) == fl(po) && r.getDouble(6) == fl(pe))
    if (pe < 1.0) {
      assert(r.getDouble(7) == fl((po - pe) / (1.0 - pe)))
      assert(r.getDouble(7) <= 1.0 && r.getDouble(7) >= -1.0 - 1e-4)
    }
    // both judges discriminate on the fixture (no degenerate 2×2 margin)
    assert(n11 + n10 > 0 && n01 + n00 > 0, "judge1 constant")
    assert(n11 + n01 > 0 && n10 + n00 > 0, "judge2 constant")
  }

  test("llm_ece_brier matches a driver recompute; bounds hold") {
    val rows = Tables.documents(spark, sf0001)
      .select("source", "text", "n_chars").collect().map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        val cq = math.min(numAt(r, 2), 1000L)
        val y = if (toks.distinct.length * 2 >= toks.length) 1L else 0L
        (r.getString(0), cq, y, math.min(cq * 10 / 1000, 9L))
      }
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val n = rs.length.toLong
      val eceNum = rs.groupBy(_._4).values.map { b =>
        math.abs(1000L * b.map(_._3).sum - b.map(_._2).sum)
      }.sum
      val brierNum = rs.map(r => (r._2 - 1000L * r._3) * (r._2 - 1000L * r._3)).sum
      src -> ((n, fl(eceNum.toDouble / (n.toDouble * 1000.0)),
        fl(brierNum.toDouble / (n.toDouble * 1e6))))
    }
    val got = SparkEntry.queries("llm_ece_brier")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == expect)
    // both statistics live in [0, 1] and the fixture is non-degenerate
    assert(got.values.forall { case (_, e, b) => e >= 0 && e <= 1 && b >= 0 && b <= 1 })
    assert(got.values.exists { case (_, e, b) => e > 0 && b > 0 })
  }

  test("agg_theil_index matches a driver recompute; Jensen bounds hold") {
    val nat = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => numAt(r, 0) -> numAt(r, 1)).toMap
    val rows = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .filter(r => r.getDouble(2) > 0)
      .map(r => (nat(numAt(r, 1)), numAt(r, 0),
        math.floor(r.getDouble(2) * 100.0).toLong))
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = rows.groupBy(_._1).map { case (region, rs) =>
      val n = rs.length.toLong
      val ctot = rs.map(_._3).sum
      val sorted = rs.sortBy(_._2)
      // identical fold order and per-term IEEE shape as the query
      val st = sorted.foldLeft(0.0) { (acc, r) =>
        acc + (r._3.toDouble / ctot.toDouble) *
          math.log(r._3.toDouble * n.toDouble / ctot.toDouble)
      }
      val sl = sorted.foldLeft(0.0) { (acc, r) =>
        acc + math.log(ctot.toDouble / (r._3.toDouble * n.toDouble))
      }
      region -> ((n, ctot, fl(st), fl(sl / n.toDouble)))
    }
    val got = SparkEntry.queries("agg_theil_index")(spark, sf0001).collect()
      .map(r => numAt(r, 0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expect)
    // Jensen: both indices nonnegative; fixture spreads balances so > 0
    assert(got.values.forall { case (_, _, t, l) => t >= -1e-4 && l >= -1e-4 })
    assert(got.values.exists { case (_, _, t, l) => t > 0 && l > 0 })
  }

  test("agg_tukey_fence matches a driver order-statistic recompute") {
    val rows = Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 1e6).toLong)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = rows.groupBy(_._1).map { case (et, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.length.toLong
      val q1 = vs(((n + 3) / 4 - 1).toInt)  // type-1: value at rank ceil(n/4)
      val q3 = vs(((3 * n + 3) / 4 - 1).toInt)
      val iqr = q3 - q1
      val nLow = vs.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong
      val nHigh = vs.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong
      et -> ((n, fl(q1.toDouble / 1e6), fl(q3.toDouble / 1e6), fl(iqr.toDouble / 1e6),
        nLow, nHigh, fl((nLow + nHigh).toDouble / n.toDouble)))
    }
    val got = SparkEntry.queries("agg_tukey_fence")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    assert(got == expect)
    // fences sit strictly outside the box, and some type flags outliers
    assert(got.values.forall { case (_, q1, q3, iqr, _, _, _) => q3 >= q1 && iqr >= 0 })
    assert(got.values.exists { case (_, _, _, _, lo, hi, _) => lo + hi > 0 })
  }

  test("llm_rouge_l bit-parallel LCS equals the classic DP recompute") {
    // classic O(n·m) dynamic program — the textbook truth the bit-vector
    // recurrence must reproduce token for token
    def lcsDp(a: Array[String], b: Array[String]): Long = {
      var prev = Array.fill(b.length + 1)(0)
      a.foreach { x =>
        val cur = Array.fill(b.length + 1)(0)
        var j = 1
        while (j <= b.length) {
          cur(j) = if (b(j - 1) == x) prev(j - 1) + 1 else math.max(prev(j), cur(j - 1))
          j += 1
        }
        prev = cur
      }
      prev(b.length).toLong
    }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (numAt(r, 0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).take(60)))
      .filter(_._3.nonEmpty)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val byId = docs.map(d => d._1 -> d._3).toMap
    val expect = docs.groupBy(_._2).values.flatMap { ds =>
      ds.map(_._1).sorted.sliding(2).filter(_.length == 2).map { case Array(c, ref) =>
        val (a, b) = (byId(c), byId(ref))
        val lcs = lcsDp(a, b)
        c -> ((ref, a.length.toLong, b.length.toLong, lcs,
          fl(lcs.toDouble / b.length), fl(lcs.toDouble / a.length),
          fl(2.0 * lcs / (a.length + b.length))))
      }
    }.toMap
    val got = SparkEntry.queries("llm_rouge_l")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got == expect)
    // the fixture exercises non-trivial subsequences (not just 0 / full)
    assert(got.values.exists { case (_, cl, rl, l, _, _, _) => l > 0 && l < math.min(cl, rl) })
  }

  test("win_dtw unrolled DP equals a driver DTW recompute; dtw <= L1") {
    def dtw(a: Array[Long], b: Array[Long]): Long = {
      val d = Array.ofDim[Long](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length) {
        val c = math.abs(a(i - 1) - b(j - 1))
        d(i)(j) =
          if (i == 1 && j == 1) c
          else if (i == 1) d(1)(j - 1) + c
          else if (j == 1) d(i - 1)(1) + c
          else c + math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      }
      d(a.length)(b.length)
    }
    val series = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .filter(!_.isNullAt(3))
      .map(r => (numAt(r, 0), (numAt(r, 1), numAt(r, 2),
        math.floor(r.getDouble(3) * 1e6).toLong)))
      .groupBy(_._1).map { case (u, rs) =>
        u -> rs.map(_._2).sortBy(t => (t._1, t._2))
      }
    val expect = series.flatMap { case (_, s) =>
      s.indices.drop(15).map { t =>
        val win = s.slice(t - 15, t + 1).map(_._3)
        val (a, b) = (win.take(8), win.drop(8))
        val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        s(t)._2 -> ((dtw(a, b), l1))
      }
    }
    val got = SparkEntry.queries("win_dtw")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect.toMap)
    // the diagonal is a valid warping path, and warping genuinely helps
    // somewhere on a random-ish fixture
    assert(got.values.forall { case (d, l1) => d <= l1 })
    assert(got.values.exists { case (d, l1) => d < l1 })
  }

  test("llm_moe_route conserves mass and matches an independent argmax route") {
    val rows = SparkEntry.queries("llm_moe_route")(spark, sf0001).collect()
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "top-1 loads partition the corpus")
    assert(rows.map(_.getLong(2)).sum == 2 * nVecs, "every vector routes to 2 experts")
    rows.foreach { r =>
      val (load, gate, aux) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(load >= 0 && load <= 1)
      // softmax over 8 experts: top-1 prob in (1/8 - eps, 1]
      assert(gate > 0.125 - 1e-4 && gate <= 1.0, s"gate $gate out of range")
      assert(aux >= 0)
    }
    // independent top-1 route: argmax cosine vs the same final centroids,
    // computed through a different expression (struct max, no window)
    import org.apache.spark.sql.functions._
    val v = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"),
        sqrt(call_function("vec_dot", col("embedding"), col("embedding"))).as("norm"))
    val asg = graft.ops.Ivf.lloyd(v.select("vec_id", "embedding", "norm"), k = 8, rounds = 3)
    val cent = graft.ops.Ivf.centroidsOf(asg)
    val top1 = v.crossJoin(broadcast(cent))
      .withColumn("csim", call_function("vec_dot", col("embedding"), col("centroid"))
        / (col("norm") * col("cnorm")))
      .groupBy("vec_id")
      .agg(expr("min_by(cell, named_struct('s', -csim, 'c', cell))").as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotLoads = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotLoads.filter(_._2 > 0) == top1)
  }

  test("llm_nb_tokens matches a driver log-odds recompute") {
    val docs = Tables.documents(spark, sf0001).select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val labeled = docs.map(t => (t.distinct.toSet, if (t.distinct.length * 2 >= t.length) 1L else 0L))
    val nPos = labeled.count(_._2 == 1L).toLong
    val nNeg = labeled.length - nPos
    val counts = labeled.flatMap { case (ts, y) => ts.map(_ -> y) }
      .groupBy(_._1).map { case (tok, ys) =>
        tok -> ((ys.count(_._2 == 1L).toLong, ys.count(_._2 == 0L).toLong))
      }.filter { case (_, (p, n)) => p + n >= 5 }
    val scored = counts.map { case (tok, (p, n)) =>
      val lo = math.log((p + 1).toDouble / (nPos + 2).toDouble) -
        math.log((n + 1).toDouble / (nNeg + 2).toDouble)
      (tok, p, n, lo)
    }.toSeq
    val expect = scored.sortBy(t => (-math.abs(t._4), t._1)).take(50)
      .map(t => t._1 -> ((t._2, t._3, math.floor(t._4 * 1e4) / 1e4))).toMap
    val got = SparkEntry.queries("llm_nb_tokens")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect)
    // the model discriminates: nonzero odds survive selection (on this
    // fixture the df>=5 tokens all skew to the repetitive y=0 class —
    // exactly what a boilerplate detector should learn)
    assert(got.values.exists(_._3 != 0))
  }

  test("agg_capture_recapture matches a driver recompute; estimator sane") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def parity(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val flags = Tables.events(spark, sf0001)
      .select("user_id", "event_id").collect()
      .map(r => (numAt(r, 0), parity(numAt(r, 1))))
      .groupBy(_._1).values.toSeq.map { rs =>
        (rs.exists(_._2 == 0), rs.exists(_._2 == 1))
      }
    val nTrue = flags.size.toLong
    val n1 = flags.count(_._1).toLong
    val n2 = flags.count(_._2).toLong
    val m = flags.count(f => f._1 && f._2).toLong
    val est = math.floor(((n1 + 1).toDouble * (n2 + 1).toDouble / (m + 1).toDouble
      - 1.0) * 1e4) / 1e4
    val r = SparkEntry.queries("agg_capture_recapture")(spark, sf0001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((nTrue, n1, n2, m)))
    assert(r.getDouble(4) == est)
    // Chapman is consistent when both samples cover most users: the
    // estimate lands within 20% of truth on this dense fixture
    assert(m > 0 && math.abs(r.getDouble(4) - nTrue.toDouble) < 0.2 * nTrue)
  }

  test("llm_elo_online matches a driver sequential Elo replay") {
    val mdi = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      mdi.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "n_chars").collect()
      .map { r =>
        val h = md5hex(numAt(r, 0).toString)
        (java.lang.Long.parseLong(h.substring(0, 4), 16) % 256, h,
          numAt(r, 0), r.getString(1), numAt(r, 2))
      }
    val sources = docs.map(_._4).distinct.sorted
    val si = sources.zipWithIndex.toMap // 0-based driver index
    val k = sources.length
    // duels replayed per bucket in (h, doc_id) order, Elo folded live
    val byBucket = docs.groupBy(_._1).toSeq.collect {
      case (bkt, ds) if ds.length >= 2 =>
        val ordered = ds.sortBy(t => (t._2, t._3))
        val duels = ordered.zip(ordered.tail).collect {
          case (a, b) if a._4 != b._4 && a._5 != b._5 =>
            if (a._5 > b._5) (si(a._4), si(b._4)) else (si(b._4), si(a._4))
        }
        bkt -> duels
    }.filter(_._2.nonEmpty)
    val perBucket = byBucket.map { case (bkt, duels) =>
      val rt = Array.fill(k)(1000.0)
      duels.foreach { case (wi, li) =>
        val delta = 16.0 / (1.0 + math.pow(10.0, (rt(wi) - rt(li)) / 400.0))
        rt(wi) += delta
        rt(li) -= delta
      }
      bkt -> rt
    }
    val nB = perBucket.length.toDouble
    val expect = sources.zipWithIndex.map { case (src, i) =>
      val sum = perBucket.sortBy(_._1).foldLeft(0.0)((acc, br) => acc + br._2(i))
      src -> (math.floor(sum / nB * 1e4) / 1e4)
    }.toMap
    val got = SparkEntry.queries("llm_elo_online")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expect)
    // duel conservation: total rating mass stays k*1000 per bucket, so
    // the mean over sources must be 1000 exactly up to float dust
    val meanAll = got.values.sum / k
    assert(math.abs(meanAll - 1000.0) < 0.01, s"rating mass drifted: $meanAll")
  }

  test("agg_ridge_ols matches a driver Cramer recompute; residuals beat the mean") {
    val raw = Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts").cast("date").cast("string").as("day"),
        hour(col("ts")).as("hr"), col("value")).collect()
      .filter(!_.isNullAt(3))
      .map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getInt(2).toLong, math.floor(r.getDouble(3) * 1e6).toLong))
    val d0 = raw.map(_._2).min
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    val expect = raw.groupBy(_._1).map { case (et, rs) =>
      val xs = rs.map(r => (r._2 - d0, r._3, r._4))
      val n = xs.length.toDouble
      val (s1, s2) = (xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
      val sy = xs.map(r => BigDecimal(r._3)).sum.toDouble
      val s11 = xs.map(r => r._1 * r._1).sum.toDouble
      val s12 = xs.map(r => r._1 * r._2).sum.toDouble
      val s22 = xs.map(r => r._2 * r._2).sum.toDouble
      val s1y = xs.map(r => BigDecimal(r._1) * BigDecimal(r._3)).sum.toDouble
      val s2y = xs.map(r => BigDecimal(r._2) * BigDecimal(r._3)).sum.toDouble
      val (a, b, c, e, f, i) = (n, s1, s2, s11 + 1.0, s12, s22 + 1.0)
      val (r0, r1, r2) = (sy, s1y, s2y)
      val det = a * (e * i - f * f) - b * (b * i - f * c) + c * (b * f - e * c)
      val dd0 = r0 * (e * i - f * f) - b * (r1 * i - f * r2) + c * (r1 * f - e * r2)
      val dd1 = a * (r1 * i - f * r2) - r0 * (b * i - f * c) + c * (b * r2 - r1 * c)
      val dd2 = a * (e * r2 - r1 * f) - b * (b * r2 - r1 * c) + r0 * (b * f - e * c)
      et -> ((rs.length.toLong, fl(dd0 / det / 1e6), fl(dd1 / det / 1e6), fl(dd2 / det / 1e6)))
    }
    val got = SparkEntry.queries("agg_ridge_ols")(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expect)
    // the ridge fit predicts no worse than the class mean on its own
    // training data for at least one group (regression sanity, not a
    // statistical claim): check residual SS <= total SS + epsilon
    raw.groupBy(_._1).foreach { case (et, rs) =>
      val (_, b0, b1, b2) = got(et)
      val ys = rs.map(_._4.toDouble / 1e6)
      val mean = ys.sum / ys.length
      val ssTot = ys.map(y => (y - mean) * (y - mean)).sum
      val ssRes = rs.map { r =>
        val pred = b0 + b1 * (r._2 - d0) + b2 * r._3
        val err = r._4.toDouble / 1e6 - pred
        err * err
      }.sum
      assert(ssRes <= ssTot * 1.05 + 1e-6, s"$et: ridge fit worse than the mean")
    }
  }

  test("set_ops_all matches a driver multiset recompute") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_discount").collect()
      .map(r => (numAt(r, 0), r.getDouble(1), r.getDouble(2)))
    val a = li.filter(_._2 >= 25).map(_._1)
    val b = li.filter(_._3 >= 0.05).map(_._1)
    val ca = a.groupBy(identity).view.mapValues(_.length).toMap
    val cb = b.groupBy(identity).view.mapValues(_.length).toMap
    val inter = ca.flatMap { case (k, n) =>
      Seq.fill(math.min(n, cb.getOrElse(k, 0)))(k)
    }.toSeq
    val exc = ca.flatMap { case (k, n) =>
      Seq.fill(math.max(n - cb.getOrElse(k, 0), 0))(k)
    }.toSeq
    val got = SparkEntry.queries("set_ops_all")(spark, sf0001).collect()
      .map(r => (r.getString(1), numAt(r, 0)))
    val gi = got.filter(_._1 == "intersect_all").map(_._2).sorted.toSeq
    val ge = got.filter(_._1 == "except_all").map(_._2).sorted.toSeq
    assert(gi == inter.sorted)
    assert(ge == exc.sorted)
    // multiplicities genuinely exceed 1 somewhere, or ALL == DISTINCT
    assert(gi.distinct.size < gi.size || ge.distinct.size < ge.size,
      "fixture degenerate: bag results equal set results")
  }

  test("win_hampel agrees with win_mad_anomaly and repairs toward the median") {
    val hampel = SparkEntry.queries("win_hampel")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    // repairs happen (the fence is live) and untouched rows pass through
    // value-identically (floor lattice of the original microunits)
    assert(hampel.values.exists(_._3 == 1), "no repair on the fixture")
    hampel.values.filter(_._3 == 0).foreach { case (vq, rep, _) =>
      assert(rep == math.floor(vq.toDouble / 100.0) / 1e4, s"$vq -> $rep")
    }
    // consistency with the flag key: hampel's fence is 3σ-equivalent,
    // mad_anomaly's 3.5σ — every 3.5σ flag must also be repaired
    val flags = SparkEntry.queries("win_mad_anomaly")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    flags.filter(_._2 == 1).keys.foreach { id =>
      assert(hampel(id)._3 == 1, s"event $id flagged at 3.5 sigma but not repaired at 3")
    }
  }

  test("filter_sargable_rewrite: range form pushes scan bounds, naive form cannot") {
    val ranged = SparkEntry.queries("filter_sargable_rewrite")(spark, sf0001)
    val rangedPlan = ranged.queryExecution.executedPlan.toString
    // the half-open range reaches the parquet scan as pushed ts bounds
    assert("PushedFilters: \\[[^\\]]*(GreaterThanOrEqual|LessThan)\\(ts".r
      .findFirstIn(rangedPlan).isDefined, rangedPlan.take(1500))
    // the naive truncate form is semantically identical but pushes NO ts
    // bound — the full-scan trap this key's rewrite removes
    val naive = Tables.events(spark, sf0001)
      .where(date_trunc("day", col("ts")) === lit("2024-01-10 00:00:00").cast("timestamp"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6).cast("long")).as("sum_value_microunits"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*(GreaterThanOrEqual|LessThan)\\(ts".r
      .findFirstIn(naivePlan).isEmpty, naivePlan.take(1500))
    // and the two forms agree row for row (the equivalence the oracle pins
    // cross-engine, re-proven here within Spark)
    val a = ranged.collect().map(_.toSeq).toSet
    val b = naive.orderBy("event_type").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("llm_rouge_n matches a driver clipped-recall recompute") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (numAt(r, 0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
      .filter(_._3.length >= 2)
    def fl(x: Double) = math.floor(x * 1e4) / 1e4
    def counts(ts: Array[String]) = ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def clip(a: Map[String, Long], b: Map[String, Long]) =
      a.map { case (g, c) => math.min(c, b.getOrElse(g, 0L)) }.sum
    val byId = docs.map(d => d._1 -> d._3).toMap
    val expect = docs.groupBy(_._2).values.flatMap { ds =>
      ds.map(_._1).sorted.sliding(2).filter(_.length == 2).map { case Array(c, ref) =>
        val (a, b) = (byId(c), byId(ref))
        def bigrams(t: Array[String]) = t.sliding(2).map(_.mkString(" ")).toArray
        val m1 = clip(counts(a), counts(b))
        val m2 = clip(counts(bigrams(a)), counts(bigrams(b)))
        val rlen = b.length.toLong
        c -> ((ref, m1, m2, rlen,
          fl(m1.toDouble / rlen), fl(m2.toDouble / (rlen - 1))))
      }
    }.toMap
    val got = SparkEntry.queries("llm_rouge_n")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == expect)
    // recall bounded and non-trivial somewhere on the fixture
    assert(got.values.forall { case (_, _, _, _, r1, r2) => r1 <= 1.0001 && r2 <= 1.0001 })
    assert(got.values.exists { case (_, m1, _, _, _, _) => m1 > 0 })
  }

  test("win_islands matches a driver run-length recompute") {
    val series = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .filter(!_.isNullAt(3))
      .map(r => (numAt(r, 0), (numAt(r, 1), numAt(r, 2),
        if (r.getDouble(3) >= 100) 1 else 0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2))).toMap
    val expect = series.flatMap { case (u, evs) =>
      // fold into maximal same-state runs in order
      val runs = evs.foldLeft(List.empty[(Int, Long, Long, Long)]) {
        case (acc, (us, _, st)) => acc match {
          case (s0, n, a, _) :: rest if s0 == st => (s0, n + 1, a, us) :: rest
          case _ => (st, 1L, us, us) :: acc
        }
      }.reverse
      runs.zipWithIndex.map { case ((st, n, a, b), i) =>
        (u, i + 1L) -> ((st, n, a, b))
      }
    }
    val got = SparkEntry.queries("win_islands")(spark, sf0001).collect()
      .map { r =>
        (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getLong(3),
          unixMicros(r.getTimestamp(4)), unixMicros(r.getTimestamp(5))))
      }.toMap
    assert(got == expect.toMap)
    // runs alternate by construction: adjacent islands differ in state
    got.groupBy(_._1._1).values.foreach { isl =>
      isl.toSeq.sortBy(_._1._2).map(_._2._1).sliding(2).foreach {
        case Seq(a, b) => assert(a != b, "adjacent islands share a state")
        case _ =>
      }
    }
  }

  private def unixMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("win_mann_kendall matches a driver recompute of S, tau, and tie-corrected z") {
    val daily = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        floor(col("value") * 1e6).cast("long").as("yq"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.flatMap { u =>
      val vs = daily.collect { case ((`u`, dy), v) => (dy, v) }.toSeq.sortBy(_._1.toEpochDay)
        .map(_._2)
      val n = vs.size
      if (n < 2) None else {
        val sStat = (for (i <- 0 until n; j <- i + 1 until n)
          yield java.lang.Long.signum(vs(j) - vs(i)).toLong).sum
        val tsum = vs.groupBy(identity).values.map(_.size.toLong)
          .map(t => t * (t - 1) * (2 * t + 5)).sum
        val var18 = n.toLong * (n - 1) * (2L * n + 5) - tsum
        val z: Option[Double] =
          if (var18 <= 0) None
          else if (sStat > 0) Some(math.floor((sStat - 1) / math.sqrt(var18 / 18.0) * 1e4) / 1e4)
          else if (sStat < 0) Some(math.floor((sStat + 1) / math.sqrt(var18 / 18.0) * 1e4) / 1e4)
          else Some(0.0)
        val tau = math.floor(sStat.toDouble / (n.toLong * (n - 1) / 2).toDouble * 1e4) / 1e4
        val trend =
          if (z.isEmpty) "flat"
          else if (z.get > 1.96) "up" else if (z.get < -1.96) "down" else "none"
        Some(u -> ((n.toLong, sStat, tau, z, trend)))
      }
    }.toMap
    val got = SparkEntry.queries("win_mann_kendall")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getString(5)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("win_croston matches a driver recompute of the two-smoother fold") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"),
        floor(col("value") * 1e6).cast("long").as("yq"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2), r.getLong(3)))
    val (lo, hi) = (ev.map(_._2).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay)),
      ev.map(_._2).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay)))
    val days = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq
    val demand = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.collect { case (_, _, id, yq) if id % 37 == 0 => yq }.sum).toMap
    val expect = ev.map(_._1).distinct.map { u =>
      val ds = days.map(dy => demand.getOrElse((u, dy), 0L).toDouble)
      var (z, p, q, init) = (0.0, 0.0, 0.0, false)
      ds.foreach { x =>
        if (x > 0 && !init) { z = x; p = q + 1.0; q = 0.0; init = true }
        else if (x > 0) { z = 0.2 * x + 0.8 * z; p = 0.2 * (q + 1.0) + 0.8 * p; q = 0.0 }
        else q += 1.0
      }
      u -> ((days.size.toLong, ds.count(_ > 0).toLong,
        if (init) Some(math.floor(z / p / 1e2) / 1e4) else None))
    }.toMap
    val got = SparkEntry.queries("win_croston")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got == expect)
    // intermittency is real on the fixture: demands are sparse
    assert(got.values.forall(v => v._2 < v._1))
    assert(got.values.exists(v => v._2 > 0))
  }

  test("llm_dedup_lines matches a driver recompute of segmentation, gate, and kept hash") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def lines(t: String): Seq[String] =
      t.split(" ").filter(_.nonEmpty).grouped(5).map(_.mkString(" ")).toSeq
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = docs.flatMap { case (id, t) => lines(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = docs.flatMap { case (id, t) =>
      val ls = lines(t)
      if (ls.isEmpty) None
      else Some(id -> ((ls.size.toLong, ls.count(df(_) >= 3).toLong,
        md5hex(ls.filter(df(_) < 3).mkString(" ")))))
    }.toMap
    val got = SparkEntry.queries("llm_dedup_lines")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect)
    // the gate is live in both directions on the fixture
    assert(got.values.exists(_._2 > 0) && got.values.exists(v => v._2 < v._1))
  }

  test("win_ewm_var matches a driver-side RiskMetrics fold over µ-unit return lags") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 1e6).cast("long").as("yq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._1)).toSeq
      val rets = ordered.zip(ordered.drop(1)).map { case (p, c) => (c._1, c._4 - p._4) }
      rets.zipWithIndex.map { case ((id, _), i) =>
        val l2 = rets.slice(math.max(0, i - 15), i + 1)
          .map { case (_, rq) => (rq.toDouble / 1e6) * (rq.toDouble / 1e6) }
        val v = l2.tail.foldLeft(l2.head)((acc, x) => 0.94 * acc + 0.06 * x)
        (id, math.floor(v * 1e4) / 1e4, math.floor(math.sqrt(v) * 1e4) / 1e4)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("win_ewm_var")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // variance is live on the fixture (not all-zero returns)
    assert(got.exists(_._2 > 0))
  }

  test("win_atr matches a driver-side Wilder fold over hourly OHLC true ranges") {
    val events = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 1e6).cast("long").as("yq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = events.groupBy(_._2).toSeq.flatMap { case (uid, evs) =>
      val bars = evs.groupBy(e => e._3 - e._3 % 3600000000L).toSeq.map { case (h, bs) =>
        val ord = bs.sortBy(e => (e._3, e._1)).toSeq
        (h, ord.map(_._4).max, ord.map(_._4).min, ord.last._4)
      }.sortBy(_._1)
      val trs = bars.zipWithIndex.map { case ((h, hq, lq, cq), i) =>
        val tr = if (i == 0) hq - lq
        else {
          val pc = bars(i - 1)._4
          math.max(hq - lq, math.max(math.abs(hq - pc), math.abs(lq - pc)))
        }
        (h, tr)
      }
      trs.zipWithIndex.map { case ((h, tr), i) =>
        val lt = trs.slice(math.max(0, i - 15), i + 1).map(_._2.toDouble / 1e6)
        val a = lt.tail.foldLeft(lt.head)((acc, x) => (acc * 13.0 + x) / 14.0)
        (uid, h, tr.toDouble / 1e6, math.floor(a * 1e4) / 1e4)
      }
    }.sortBy(e => (e._1, e._2))
    val gotUs = SparkEntry.queries("win_atr")(spark, sf0001)
      .select(col("user_id"), unix_micros(col("h")).as("hus"), col("tr"), col("atr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(gotUs == expect)
    // the gap branch of true range is live: recompute each bar's plain
    // high-low range and require some tr to exceed it (a dead gap branch
    // would make tr == hq - lq everywhere)
    val ranges = events.groupBy(e => (e._2, e._3 - e._3 % 3600000000L)).map {
      case ((uid, h), bs) => (uid, h) -> (bs.map(_._4).max - bs.map(_._4).min)
    }
    assert(gotUs.exists { case (uid, h, tr, _) =>
      tr > ranges((uid, h)).toDouble / 1e6
    }, "no bar's true range exceeds its high-low range — gap branch dead")
  }

  test("agg_lorenz decile points match a driver-side exact recomputation and are a valid Lorenz curve") {
    val spend = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), floor(col("o_totalprice") * lit(100.0)).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val cust = Tables.customer(spark, sf0001).select("c_custkey").collect()
      .map(_.getLong(0)).map(k => (k, spend.getOrElse(k, 0L)))
      .sortBy(t => (t._2, t._1))
    val n = cust.size
    val tot = cust.map(_._2).sum
    def tile(g: Int): Int = {
      val q = n / 10; val m = n % 10
      if (g <= m * (q + 1)) (g - 1) / (q + 1) + 1
      else m + (g - m * (q + 1) - 1) / q + 1
    }
    val cums = cust.map(_._2).scanLeft(0L)(_ + _).tail
    val expect = cust.zipWithIndex.map { case ((_, sp), i) =>
      (tile(i + 1), sp, cums(i))
    }.groupBy(_._1).toSeq.map { case (dec, rows) =>
      (dec, rows.size.toLong, rows.map(_._2).sum,
        math.floor(rows.map(_._3).max.toDouble / tot.toDouble * 1e6) / 1e6)
    }.sortBy(_._1)
    val got = SparkEntry.queries("agg_lorenz")(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expect)
    // Lorenz validity: 10 tiles, shares nondecreasing, last tile reaches 1
    assert(got.map(_._1) == (1 to 10))
    assert(got.map(_._4) == got.map(_._4).sorted)
    assert(got.last._4 == 1.0)
  }

  test("llm_sample_systematic multiplicities match the exact pick-quotient walk and sum to N") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => length(t) > 0)).cast("long").as("wq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    val tw = docs.map(_._2).sum
    val cums = docs.map(_._2).scanLeft(0L)(_ + _).tail
    def jmax(c: Long): Long = (2000L * c + tw) / (2L * tw)
    val expect = docs.zipWithIndex.flatMap { case ((id, wq), i) =>
      val picks = jmax(cums(i)) - jmax(cums(i) - wq)
      if (picks >= 1) Some((id, wq, picks)) else None
    }.toSeq
    val got = SparkEntry.queries("llm_sample_systematic")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // systematic resampling is an exact partition of the 1000 picks,
    // and the importance axis is live (some doc drawn more than once)
    assert(got.map(_._3).sum == 1000L)
    assert(got.exists(_._3 > 1))
  }

  test("llm_pass_at_k matches the closed-form estimator and is monotone in k and c") {
    def md5hex16(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4), 16)
    }
    def passAtK(n: Int, c: Long, k: Int): Double = {
      val num = (0 until k).map(i => math.max(n - c - i, 0L)).product.toDouble
      val den = (0 until k).map(i => (n - i).toLong).product.toDouble
      math.floor((1.0 - num / den) * 1e6) / 1e6
    }
    val tasks = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 10 == 0).sorted
    val expect = tasks.map { t =>
      val thr = 16384L + md5hex16(s"$t|diff") % 32768L
      val c = (1 to 10).count(j => md5hex16(s"$t|s$j") < thr).toLong
      (t, c, passAtK(10, c, 1), passAtK(10, c, 5), passAtK(10, c, 10))
    }.toSeq
    val got = SparkEntry.queries("llm_pass_at_k")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == expect)
    // estimator sanity: pass@k nondecreasing in k; c spread is live
    got.foreach { case (_, _, p1, p5, p10) => assert(p1 <= p5 && p5 <= p10) }
    assert(got.map(_._2).distinct.size > 3, "difficulty spread collapsed")
  }

  test("llm_contamination_report is exactly the doc-grain screen rolled to source grain") {
    val sources = Tables.documents(spark, sf0001).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docGrain = SparkEntry.queries("llm_decontaminate")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = docGrain.groupBy(t => sources(t._1)).toSeq.map { case (src, rows) =>
      val nSh = rows.map(_._2).sum
      val nHits = rows.map(_._3).sum
      val nFlag = rows.count(_._3 > 0).toLong
      (src, rows.length.toLong, nFlag,
        math.floor(nFlag.toDouble / rows.length * 1e4) / 1e4,
        nSh, nHits, math.floor(nHits.toDouble / nSh * 1e4) / 1e4)
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_contamination_report")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got == expect)
    // the report discriminates: sources differ in flag rate on the fixture
    assert(got.map(_._4).distinct.size > 1)
  }

  test("llm_best_of_n picks the argmax reward with lowest-index ties and exact diagnostics") {
    def md5hex16(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(4), 16)
    }
    val tasks = Tables.documents(spark, sf0001).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 10 == 0).sorted
    val expect = tasks.map { t =>
      val rs = (1 to 8).map(j => (j.toLong, md5hex16(s"$t|r$j")))
      val sorted = rs.sortBy { case (j, r) => (-r, j) }
      val (bj, br) = sorted.head
      val sr = sorted(1)._2
      (t, bj, br, sr, br - sr, rs.map(_._2).sum.toDouble / 8.0)
    }.toSeq
    val got = SparkEntry.queries("llm_best_of_n")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
    // margins are spread (the diagnostic is live, not constant)
    assert(got.map(_._5).distinct.size > 3)
  }
}
