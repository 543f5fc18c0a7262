package graft

import org.apache.spark.sql.functions._

/** Corpus-adaptive stop-shingle cap (ops.StopShingles): exact tie-safe
  * percentile threshold arithmetic, and a recall characterization on a
  * WIDE-vocabulary synthetic corpus — the 31-token bench fixture cannot
  * distinguish discriminative from ubiquitous shingles, so the trade the
  * cap makes (template-twin "dups" sacrificed for candidate volume) is
  * only measurable here. Findings are recorded in NOTES.md (r5 recall
  * table).
  */
class StopShinglesSpec extends SparkSpec {
  import spark.implicits._

  // ---- synthetic corpus: ~6000-word vocabulary, bimodal df profile ----
  // 200 base docs with DISJOINT 30-token bodies (every body shingle df=1,
  // dup-shared df=2), a shared 10-token boilerplate prefix on every doc
  // (8 pure-boilerplate shingles at df=286 — the pathology), a 5-token
  // promo phrase on 30 docs (3 shingles at df=30 — a mid-df whole group
  // for tie-safety), 80 planted near-dups (1 body token changed —
  // findable through body shingles alone), and 6 "template twins"
  // (2-token bodies: ≥0.8-contained ONLY through boilerplate shingles).
  private val boiler = (0 until 10).map(i => s"h$i")
  private val promo = (0 until 5).map(i => s"p$i")
  private lazy val corpus: Seq[(Long, String)] = {
    val bases = (0 until 200).map(i => (0 until 30).map(j => s"w${i}_$j").toVector)
    val baseDocs = bases.zipWithIndex.map { case (b, i) =>
      val tail = if (i >= 100 && i < 130) promo else Seq.empty
      (i.toLong, (boiler ++ b ++ tail).mkString(" "))
    }
    val dups = (0 until 80).map { i =>
      val mutated = bases(i).updated(15, s"zq$i")
      (1000L + i, (boiler ++ mutated).mkString(" "))
    }
    val twins = (0 until 6).map { i =>
      (2000L + i, (boiler ++ Seq(s"t${2 * i}", s"t${2 * i + 1}")).mkString(" "))
    }
    baseDocs ++ dups ++ twins
  }

  private def shingles = corpus.toDF("doc_id", "text")
    .withColumn("toks", split(col("text"), " "))
    .select(col("doc_id"), explode(array_distinct(
      transform(sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))).as("sh"))

  private def contPairs(maxDf: Option[Long], pct: Option[Double]): Set[(Long, Long)] =
    graft.queries.Llm.shinglePairStats(shingles, maxDf, pct)
      .withColumn("cont_a", col("n_inter").cast("double") / col("n_a"))
      .withColumn("cont_b", col("n_inter").cast("double") / col("n_b"))
      .where(col("cont_a") >= 0.8 || col("cont_b") >= 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

  private def candidateCount(maxDf: Option[Long], pct: Option[Double]): Long =
    graft.queries.Llm.shinglePairStats(shingles, maxDf, pct).count()

  test("percentileCap drops whole df-groups within budget, tie-safe") {
    val d = Seq.fill(8)(("a", 1)).zipWithIndex.map { case (_, i) => (s"top$i", 100L) } ++
      (0 until 20).map(i => (s"mid$i", 10L)) ++
      (0 until 972).map(i => (s"rare$i", 1L))
    val dfT = d.toDF("sh", "df")
    // V=1000. p=0.99 → budget 10: top group (8 shingles, df=100) fits,
    // mid group (20 at df=10) would blow it → cap = 99
    assert(graft.ops.StopShingles.percentileCap(dfT, 0.99) == 99L)
    // p=0.95 → budget 50: top 8 + mid 20 = 28 fit → cap = 9
    assert(graft.ops.StopShingles.percentileCap(dfT, 0.95) == 9L)
    // p=0.999 → budget 1: nothing fits → no-op cap
    assert(graft.ops.StopShingles.percentileCap(dfT, 0.999) == Long.MaxValue)
  }

  test("boilerplate corpus: planted dups survive both caps at full recall") {
    val truth = contPairs(None, None)
    val planted = (0 until 80).map(i => (i.toLong, 1000L + i)).toSet
    assert(planted.subsetOf(truth), "uncapped route must find every planted dup")
    val fixed = contPairs(Some(25L), None)
    val adaptive = contPairs(None, Some(0.995))
    assert(planted.subsetOf(fixed), "fixed cap lost real near-dups")
    assert(planted.subsetOf(adaptive), "adaptive cap lost real near-dups")
  }

  test("boilerplate-only template twins are exactly what the caps sacrifice") {
    val truth = contPairs(None, None)
    // twins reach >= 0.8 containment through the 8 boilerplate-only
    // shingles of their 10-shingle sets — spurious "dups" by construction
    val twinTruth = truth.filter { case (a, b) => a >= 2000L || b >= 2000L }
    assert(twinTruth.nonEmpty, "fixture broken: no boilerplate-induced pairs")
    val fixed = contPairs(Some(25L), None)
    val adaptive = contPairs(None, Some(0.995))
    assert(fixed.intersect(twinTruth).isEmpty, "fixed cap kept boilerplate pairs")
    assert(adaptive.intersect(twinTruth).isEmpty, "adaptive cap kept boilerplate pairs")
  }

  test("caps cut candidate volume by an order of magnitude on this corpus") {
    val un = candidateCount(None, None)
    val fx = candidateCount(Some(25L), None)
    val ad = candidateCount(None, Some(0.995))
    info(s"candidate pairs: uncapped=$un fixed25=$fx adaptive0.995=$ad")
    // boilerplate makes every doc pair a candidate uncapped (~286²/2)
    assert(un > 35000L, s"fixture lost its boilerplate pathology: $un")
    assert(fx < un / 10, s"fixed cap did not cut volume: $fx vs $un")
    assert(ad < un / 10, s"adaptive cap did not cut volume: $ad vs $un")
  }

  test("adaptive cap lands at the boilerplate/df boundary on this corpus") {
    val d = graft.ops.StopShingles.dfs(shingles)
    val cap = graft.ops.StopShingles.percentileCap(d, 0.995)
    // boilerplate-only shingles have df=286; body shingles are rare —
    // the 0.5% budget must fit the boilerplate groups and stop well below
    assert(cap < 286L, s"cap $cap did not exclude boilerplate (df=286)")
    assert(cap >= 25L, s"cap $cap implausibly tight for this vocab")
  }
}
