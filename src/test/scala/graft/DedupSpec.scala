package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** The multi-word mask path of the bitmask Jaccard dedup: the shared
  * testdata's vocabulary fits one word (31 tokens), so this suite builds a
  * synthetic corpus with >64 distinct tokens and checks the general path
  * against a driver-side brute-force Jaccard. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("multi-word mask path equals brute force on a 150-token vocabulary") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 150).map(i => f"tok$i%03d")
    // overlapping doc families so pairs above threshold actually exist
    val docs = (0 until 60).map { i =>
      val base = vocab.slice((i % 6) * 20, (i % 6) * 20 + 18)
      val noise = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, (rnd.shuffle(base ++ noise)).mkString(" "), if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")

    val got = Dedup.jaccardBitmask(spark, docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute force on the driver
    val sets = docs.collect().map(r => (r.getLong(0),
      r.getString(1).split(" ").filter(_.nonEmpty).toSet, r.getString(2)))
    val expected = (for {
      (ai, as_, al) <- sets; (bi, bs, bl) <- sets
      if al == bl && ai < bi
      j = jaccard(as_, bs) if j >= 0.5
    } yield (ai, bi) -> math.rint(j * 1e4) / 1e4).toMap

    assert(got.keySet == expected.keySet,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    expected.foreach { case (k, j) => assert(math.abs(got(k) - j) < 1e-9, s"$k: ${got(k)} vs $j") }
    assert(expected.nonEmpty, "test corpus must produce similar pairs")
  }

  test("RDD zipWithIndex id assignment equals the window route (large-vocab path)") {
    val toks = (0 until 500).map(i => f"w$i%04d")
    val distinctTok = new scala.util.Random(3).shuffle(toks).toDF("token")
      .repartition(7) // spread over partitions so zipWithIndex offsets matter
      .distinct()
    val viaWindow = Dedup.assignTokenIds(distinctTok, viaRdd = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaRdd = Dedup.assignTokenIds(distinctTok, viaRdd = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaWindow == viaRdd)
    // dense lexicographic bijection 0..V-1
    assert(viaRdd.values.toSeq.sorted == (0L until 500L))
    assert(toks.sorted.zipWithIndex.forall { case (t, i) => viaRdd(t) == i })
  }

  test("RDD id assignment matches the window route beyond the BMP (emoji tokens)") {
    // U+FFFD (BMP, UTF-8 EF BF BD) vs U+1F600 (surrogate pair D83D DE00,
    // UTF-8 F0 9F 98 80): UTF-16 code-unit order puts the emoji FIRST
    // (0xD83D < 0xFFFD) while UTF-8 binary order — what the window route's
    // ORDER BY uses — puts it LAST (0xF0 > 0xEF). A natural-String sortBy
    // would diverge here; the bytewise route must not.
    val toks = Seq("a", "😀", "�", "z", "😁", "é")
      .toDF("token").repartition(3).distinct()
    val viaWindow = Dedup.assignTokenIds(toks, viaRdd = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaRdd = Dedup.assignTokenIds(toks, viaRdd = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaRdd == viaWindow, s"rdd=$viaRdd window=$viaWindow")
  }

  test("connected components match driver-side union-find") {
    val pairs = graft.queries.Dedup.lshVerified(spark, Tables.documents(spark, sf0001), 0.5)
    val got = graft.queries.Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force union-find on the same pairs
    val edges = pairs.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    assert(got.keySet == expected.keySet)
    // same partition into components, with min-id canonical labels
    expected.foreach { case (id, root) => assert(got(id) == got(root), s"$id") }
    got.foreach { case (id, c) => assert(c <= id && got(c) == c, s"$id -> $c") }
    val gotComponents = got.groupBy(_._2).values.map(_.keySet).toSet
    val expComponents = expected.groupBy(_._2).values.map(_.keySet).toSet
    assert(gotComponents == expComponents)
  }

  test("pointer-jump components equal plain propagation on the real pair graph") {
    val pairs = graft.queries.Dedup.lshVerified(spark, Tables.documents(spark, sf0001), 0.5)
    val plain = graft.queries.Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jumped = graft.queries.Dedup.clustersPointerJump(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(jumped == plain)
  }

  test("pointer jumping converges on a 1024-node chain (diameter >> round cap)") {
    // plain propagation moves the min label one hop per round, so a chain
    // this long cannot converge inside the 50-round cap — pointer jumping
    // must (O(log n) rounds).
    val chain = (0L until 1023L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = graft.queries.Dedup.clustersPointerJump(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 1024)
    assert(labels.values.forall(_ == 0L), s"non-root labels: ${labels.filter(_._2 != 0L).take(5)}")
  }

  test("pointer jumping matches union-find on random graph topologies") {
    val rnd = new scala.util.Random(42)
    // three seeded random graphs: sparse, dense, and forest-of-stars
    val graphs = Seq(
      (0 until 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)),
      (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)),
      (0 until 50).map(i => ((i % 7).toLong * 100, (i + 10).toLong)))
    graphs.zipWithIndex.foreach { case (raw, gi) =>
      val edges = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val pairs = edges.toDF("a_id", "b_id")
      val got = graft.queries.Dedup.clustersPointerJump(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(k => k -> find(k)).toMap
      assert(got == expected, s"graph $gi: ${got.toSet.diff(expected.toSet).take(5)}")
    }
  }

  test("single-word fast path still serves the shared corpus") {
    // vocabulary 31 => single-long mask plan (no zip_with in the plan)
    val df = Dedup.jaccardBitmask(spark, Tables.documents(spark, sf0001), 0.5)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("zip_with"), "expected the single-word path")
    df.count() // executes
  }
}
