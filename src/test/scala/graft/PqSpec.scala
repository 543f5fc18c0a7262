package graft

import org.apache.spark.sql.functions._

/** Product-quantization codes (`llm_pq_encode`): code shape, the
  * refinement property of the argmin assignment, and that PQ
  * reconstruction beats the coarse single-codebook (IVF-style) one —
  * the reason PQ is the rung below int8 on the compression ladder. */
class PqSpec extends SparkSpec {

  private def parsed() =
    SparkEntry.queries("llm_pq_encode")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toInt))

  test("every vector gets 8 codes, each in the 4-bit codebook range") {
    val rows = parsed()
    assert(rows.length == 500)
    rows.foreach { case (id, codes) =>
      assert(codes.length == 8, s"vec $id: one code per subspace")
      assert(codes.forall(c => c >= 0 && c <= 15), s"vec $id codes out of range")
    }
    // codes are data-dependent, not constant — the codebook is in use
    assert(rows.map(_._2.toSeq).distinct.length > 100, "codes must discriminate vectors")
  }

  test("argmin assignment never loses to the md5 seeding it refines") {
    // reconstruct both assignments driver-side from first principles
    val vecs = Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def seedOf(id: Long, sub: Int): Int =
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id:$sub").substring(0, 4),
        16) % 16).toInt
    // per (sub, cell): mean of member subvectors (plain mean is fine for
    // the inequality check; quantization shifts both sides equally)
    val members = scala.collection.mutable.Map.empty[(Int, Int), List[Array[Double]]]
    for ((id, v) <- vecs; sub <- 0 until 8) {
      val sv = v.slice(sub * 8, sub * 8 + 8)
      val k = (sub, seedOf(id, sub))
      members(k) = sv :: members.getOrElse(k, Nil)
    }
    val cent = members.map { case (k, svs) =>
      val m = new Array[Double](8)
      svs.foreach(sv => (0 until 8).foreach(i => m(i) += sv(i)))
      (0 until 8).foreach(i => m(i) = math.floor(m(i) / svs.size * 1e6) / 1e6)
      k -> m
    }
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codes = parsed().toMap
    var strictlyBetter = 0
    for ((id, v) <- vecs; sub <- 0 until 8) {
      val sv = v.slice(sub * 8, sub * 8 + 8)
      val chosen = l2(sv, cent((sub, codes(id)(sub))))
      val seededD = l2(sv, cent((sub, seedOf(id, sub))))
      assert(chosen <= seededD + 1e-9,
        s"vec $id sub $sub: chosen centroid worse than seed cell")
      if (chosen < seededD - 1e-9) strictlyBetter += 1
    }
    assert(strictlyBetter > 500, s"refinement must actually move assignments ($strictlyBetter)")
  }
}
