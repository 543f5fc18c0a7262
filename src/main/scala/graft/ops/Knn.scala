package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Exact k-nearest-neighbor search over an embedding column.
  *
  * `topKCosine` is the dense-corpus fast path: the corpus is broadcast as
  * primitive arrays (ids, row-major float vectors, labels, precomputed L2
  * norms) and each partition of query vectors streams it with a bounded
  * (sim desc, id asc) insertion buffer — the same small-side-broadcast /
  * big-side-streamed shape as a BroadcastHashJoin, except the probe is a
  * dense dot-product block scan that Catalyst's join operators cannot
  * express without materializing every candidate pair row. Replacing the
  * pair join + aggregator formulation with this cut `llm_knn_label` from
  * ~6.7 s to well under 1 s at bench scale (4 M pairs).
  *
  * Scale stance: valid while the corpus side fits in a broadcast (the same
  * precondition as any broadcast join build side — O(100 MB)). Past that,
  * exact k-NN over all pairs is the wrong query; the IVF
  * (`llm_ivf_centroids`) and sign-bucket (`llm_ann_bucket`) keys are the
  * sub-linear ANN scale path, and the `TopKNeighbors` aggregator remains
  * the shuffle-reduced exact path when candidates are pre-blocked.
  *
  * Determinism: dot products accumulate in index order with per-element
  * widening to double — bit-identical to the codegen `VecDot` expression
  * and the DuckDB oracle's list fold, so downstream hash-compares hold.
  */
object Knn {

  /** One query→neighbor edge: query id/label, candidate id/label, cosine. */
  case class Edge(q_id: Long, true_label: Int, c_id: Long, c_label: Int, sim: Double)

  /** Exact top-k cosine neighbors of every vector against all others.
    * `vectors` must have columns (vec_id: long, embedding: array<float>,
    * label: int). Self-matches are excluded. Ties break by smaller c_id. */
  def topKCosine(vectors: DataFrame, k: Int): Dataset[Edge] = {
    require(k > 0)
    val s = vectors.sparkSession
    import s.implicits._
    val rows = vectors.select("vec_id", "embedding", "label").collect()
    val n = rows.length
    val ids = new Array[Long](n)
    val mats = new Array[Array[Float]](n)
    val labs = new Array[Int](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rows(i)
      ids(i) = r.getLong(0)
      mats(i) = r.getSeq[Float](1).toArray
      labs(i) = r.getInt(2)
      var s2 = 0.0
      var j = 0
      val v = mats(i)
      while (j < v.length) { s2 += v(j).toDouble * v(j).toDouble; j += 1 }
      norms(i) = math.sqrt(s2)
      i += 1
    }
    val bc = s.sparkContext.broadcast((ids, mats, labs, norms))

    vectors.select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)]
      .mapPartitions { iter =>
        val (cIds, cMats, cLabs, cNorms) = bc.value
        iter.flatMap { case (qid, qe, ql) =>
          var qn2 = 0.0
          var j = 0
          while (j < qe.length) { qn2 += qe(j).toDouble * qe(j).toDouble; j += 1 }
          val qn = math.sqrt(qn2)
          val topSim = new Array[Double](k)
          val topId = new Array[Long](k)
          val topLab = new Array[Int](k)
          var filled = 0
          var c = 0
          while (c < cIds.length) {
            if (cIds(c) != qid) {
              val ce = cMats(c)
              val m = math.min(qe.length, ce.length)
              var dp = 0.0
              var t = 0
              while (t < m) { dp += qe(t).toDouble * ce(t).toDouble; t += 1 }
              val sim = dp / (qn * cNorms(c))
              val cid = cIds(c)
              val admit = filled < k || sim > topSim(filled - 1) ||
                (sim == topSim(filled - 1) && cid < topId(filled - 1))
              if (admit) {
                var p = if (filled < k) filled else filled - 1
                while (p > 0 && (topSim(p - 1) < sim ||
                  (topSim(p - 1) == sim && topId(p - 1) > cid))) {
                  topSim(p) = topSim(p - 1); topId(p) = topId(p - 1); topLab(p) = topLab(p - 1)
                  p -= 1
                }
                topSim(p) = sim; topId(p) = cid; topLab(p) = cLabs(c)
                if (filled < k) filled += 1
              }
            }
            c += 1
          }
          (0 until filled).map(x => Edge(qid, ql, topId(x), topLab(x), topSim(x)))
        }
      }
  }
}
