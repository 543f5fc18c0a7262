package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph / relationship operators (SURVEY.md §2 section L): iterative
  * PageRank and triangle counting over relationship tables derived from
  * the warehouse — the entity-importance and community-density signals a
  * directory-of-entities system (Minerva's entity/relation model) feeds
  * into downstream scoring.
  *
  * Both keys are deliberately join+aggregate shaped (no RDD graph
  * library): at 100 TB a rank table partitioned by node id and an edge
  * list pre-partitioned on src IS the scalable representation — each
  * PageRank iteration is one shuffle-on-node-id join + one map-side
  * combined aggregation, and triangle counting with degree orientation
  * bounds the wedge explosion at Σ out-deg² ≈ m^1.5 instead of Σ deg².
  *
  * Checkpoint hygiene (r6): every key here materializes its (small,
  * result-sized) output as its own `localCheckpoint` and then frees the
  * (edge-sized) intermediate checkpoints via [[graft.ops.Checkpoints]] —
  * the TrendStore.upsert discipline. Round 5's bench measured what
  * skipping this costs: un-freed edge blocks from the 5 graph keys taxed
  * every memory-pressure-sensitive query scheduled after them 3–6×.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct supplier↔part edges from lineitem, symmetrized (both
    * directions), node ids prefixed `s`/`p` into one id space. Every node
    * has out-degree ≥ 1 by construction, so PageRank needs no dangling-
    * mass correction. */
  private def supplierPartEdges(s: SparkSession, d: String): DataFrame = {
    val e0 = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    e0.select(concat(lit("s"), col("sk")).as("src"), concat(lit("p"), col("pk")).as("dst"))
      .unionByName(
        e0.select(concat(lit("p"), col("pk")).as("src"), concat(lit("s"), col("sk")).as("dst")))
  }

  /** Canonical (u < v) SUPPORTED co-purchase part edges: parts sharing
    * ≥ 2 distinct orders, baskets capped at ≤ 8 distinct parts (one
    * 10 k-item order would emit C(10k,2) pairs). The support threshold —
    * the same one `graph_cc` has carried since r5 — is both the
    * semantically better candidate graph (one shared basket is
    * coincidence, two is a signal) and the scale lever: on the random
    * co-purchase fixture it keeps ~3% of raw pair-edges (probed sf0.01:
    * 104 218 → 2 793), which collapses the downstream wedge volume that
    * made the r5 support-1 variants of triangles/common-neighbors the two
    * most expensive keys in the whole bench (36.9 s / 52.7 s at sf0.1).
    * [[copurchaseEdges]] returns it `localCheckpoint`ed — the CALLER must
    * free it (via [[finishFreeing]]) once its last consumer has
    * materialized; [[copurchaseEdgesPlan]] is the same derivation left
    * lazy, for plan audit ([[auditPlans]]). */
  private def copurchaseEdgesPlan(s: SparkSession, d: String): DataFrame = {
    // r13 (guide §2.4): one groupBy collapses lineitem to sorted distinct
    // part-set baskets and the (u < v) pairs are generated INSIDE each
    // ≤8-part basket — replacing the old distinct → count-join → basket
    // self-join chain (4 Exchanges + a matched-row-exploding join) with
    // ONE map-side-combined aggregation + a narrow pair explode + the
    // support groupBy. Identical edge set: collect_set = the old
    // (ok, pk) distinct, the size cap = the old np ≤ 8 gate, and the
    // ascending sort makes every in-basket combination satisfy u < v
    // exactly once, so the per-(u,v) count is the same order-support.
    // The pair HOF is interpreted but runs over ≤8-element arrays
    // (≤28 pairs/basket) — nothing like the per-token scans of guide §4.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("pks"))
      .where(size(col("pks")) <= 8)
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
          |  transform(slice(pks, i + 2, size(pks)), y ->
          |    named_struct('u', x, 'v', y))))""".stripMargin)).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .select("u", "v")
  }

  private def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    copurchaseEdgesPlan(s, d).localCheckpoint(true)

  /** Materialize `result` as its own checkpoint, then free every
    * checkpoint under each `spent` plan. Unlike the rest of the registry
    * (whose keys return LAZY DataFrames), the graph keys execute at
    * construction time and return a checkpointed result — the price of
    * deterministic intermediate reclamation: the edge-sized checkpoints
    * can only be freed once nothing lazy still references them, so the
    * result must be materialized first (`localCheckpoint(true)` truncates
    * the lineage, making the frees safe). Plan auditing therefore cannot
    * use the returned DataFrame — [[auditPlans]] carries the
    * pre-checkpoint compositions for that. The result checkpoint itself
    * is result-sized (top-100 / one row per part), three orders of
    * magnitude below the edge tables it replaces, and is reclaimed by the
    * context cleaner once the caller drops the DataFrame. */
  private def finishFreeing(result: DataFrame, spent: DataFrame*): DataFrame =
    graft.ops.Checkpoints.finishFreeing(result, spent: _*)

  /** The 5-iteration damped-PageRank composition over `edges`/`deg`.
    * With `checkpointIters` each iteration's NODE-sized rank table becomes
    * its own `localCheckpoint` and the superseded one is freed at once:
    * the executed plan is one stage deep per iteration instead of five
    * nested join/agg layers of unreused exchanges, and live blocks at any
    * moment are two node-sized tables rather than the whole unrolled
    * lineage. Lazy (`checkpointIters = false`) keeps the full composition
    * for plan audit. */
  private def pagerankBody(edges: DataFrame, deg: DataFrame, n: Long,
      checkpointIters: Boolean): DataFrame = {
    // The rank/degree tables are NODE-sized; the checkpointed ones carry
    // no stats (a LogicalRDD defaults to "huge"), so without the explicit
    // hint every iteration would shuffle the edge-sized side instead of
    // broadcasting the node-sized one. Same 5M gate as
    // Dedup.clustersPointerJump — past it, node tables genuinely are too
    // big to broadcast and the shuffle join is the honest plan.
    def maybeBc(df: DataFrame): DataFrame =
      if (n < 5000000L) broadcast(df) else df
    var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("rank"))
    for (i <- 1 to 5) {
      val next = edges.join(maybeBc(ranks), edges("src") === ranks("node"))
        .join(maybeBc(deg), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("m"))
        .select(col("dst").as("node"),
          (lit(0.15 / n) + lit(0.85) * col("m")).as("rank"))
      if (checkpointIters) {
        val ck = next.localCheckpoint(true)
        // i=1's predecessor is the init projection over deg — freeing it
        // would free deg's own checkpoint, still needed by later rounds.
        if (i > 1) graft.ops.Checkpoints.free(ranks)
        ranks = ck
      } else ranks = next
    }
    ranks.select(col("node"), round(col("rank"), 8).as("rank")).orderBy("node")
  }

  /** The 5-iteration PERSONALIZED PageRank composition over `edges`/`deg`
    * with the restart mass pinned on `seeds` (`nSeeds` rows): rank_i(v) =
    * 0.15·1(v∈S)/|S| + 0.85·Σ_{u→v} rank_{i-1}(u)/deg(u), init = the
    * restart vector. Unlike [[pagerankBody]]'s dense global vector, the
    * rank relation stays SPARSE — only reached nodes carry rows, so
    * iteration i touches the distance-i neighborhood of the seed set,
    * never the whole graph (the reason PPR serves per-entity "related
    * items" queries at 100 TB: work tracks the seed neighborhood). The
    * restart re-enters through a full-outer join against the seed table
    * (a seed keeps its restart mass even before any walk mass returns).
    * Same per-iteration checkpoint-and-free and node-table broadcast
    * gate as [[pagerankBody]]. */
  private def pprBody(edges: DataFrame, deg: DataFrame, seeds: DataFrame,
      nSeeds: Long, n: Long, checkpointIters: Boolean): DataFrame = {
    def maybeBc(df: DataFrame): DataFrame =
      if (n < 5000000L) broadcast(df) else df
    val restart = lit(0.15 / nSeeds.toDouble)
    var ranks = seeds.select(col("node"), lit(1.0 / nSeeds).as("rank"))
    for (i <- 1 to 5) {
      val m = edges.join(maybeBc(ranks), edges("src") === ranks("node"))
        .join(maybeBc(deg), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("m"))
        .select(col("dst").as("node"), col("m"))
      val next = m.join(maybeBc(seeds.select(col("node"), lit(1).as("is_seed"))),
          Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(lit(0.85) * col("m"), lit(0.0)) +
            when(col("is_seed").isNotNull, restart).otherwise(lit(0.0))).as("rank"))
      if (checkpointIters) {
        val ck = next.localCheckpoint(true)
        if (i > 1) graft.ops.Checkpoints.free(ranks)
        ranks = ck
      } else ranks = next
    }
    ranks.select(col("node"), round(col("rank"), 8).as("rank")).orderBy("node")
  }

  /** Per-node triangle counts over a canonical (u<v) edge list — see the
    * `graph_triangles` entry for the full design rationale. */
  private def trianglesBody(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x")).unionByName(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val oriented = edges
      .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
    val wedges = oriented.select(col("a"), col("b").as("n1"))
      .join(oriented.select(col("a").as("a2"), col("b").as("n2")),
        col("a") === col("a2") && col("n1") < col("n2"))
      .select(col("a"),
        least(col("n1"), col("n2")).as("u"), greatest(col("n1"), col("n2")).as("v"))
    val tris = wedges.join(edges, Seq("u", "v"))
    tris.select(col("a").as("part"))
      .unionByName(tris.select(col("u").as("part")))
      .unionByName(tris.select(col("v").as("part")))
      .groupBy("part").agg(count(lit(1)).as("n_triangles"))
      .orderBy("part")
  }

  /** Common-neighbor top-100 over a canonical (u<v) edge list — see the
    * `graph_common_neighbors` entry for the full design rationale. */
  private def commonNeighborsBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("w"), col("v").as("x"))
      .unionByName(edges.select(col("v").as("w"), col("u").as("x")))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("dg"))
    val centers = sym.join(deg.where(col("dg") <= 64).select("w"), "w")
    val wedges = centers.select(col("w"), col("x").as("u"))
      .join(centers.select(col("w").as("w2"), col("x").as("v")),
        col("w") === col("w2") && col("u") < col("v"))
    wedges.groupBy("u", "v").agg(count(lit(1)).as("common"))
      .join(edges, Seq("u", "v"), "left_anti")
      .orderBy(col("common").desc, col("u"), col("v")).limit(100)
  }

  /** Neighbor-set Jaccard top-100 over a canonical (u<v) edge list — see
    * the `graph_jaccard` entry for the full design rationale. */
  private def jaccardBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("w"), col("v").as("x"))
      .unionByName(edges.select(col("v").as("w"), col("u").as("x")))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("dg"))
    val centers = sym.join(deg.where(col("dg") <= 64).select("w"), "w")
    val wedges = centers.select(col("w"), col("x").as("u"))
      .join(centers.select(col("w").as("w2"), col("x").as("v")),
        col("w") === col("w2") && col("u") < col("v"))
    val cn = wedges.groupBy("u", "v").agg(count(lit(1)).as("common"))
    cn.join(deg.select(col("w").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("w").as("v"), col("dg").as("dv")), "v")
      .join(edges, Seq("u", "v"), "left_anti")
      .withColumn("n_union", col("du") + col("dv") - col("common"))
      .withColumn("jaccard_units",
        floor(lit(1e9) * col("common") / col("n_union")).cast("long"))
      .select("u", "v", "common", "n_union", "jaccard_units")
      .orderBy(col("jaccard_units").desc, col("u"), col("v")).limit(100)
  }

  /** Per-node local clustering coefficient over a canonical (u<v) edge
    * list — see the `graph_clustering_coeff` entry for the full design
    * rationale. */
  private def clusteringCoeffBody(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x")).unionByName(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val tri = trianglesBody(edges)
      .select(col("part").as("x"), col("n_triangles"))
    deg.where(col("dg") >= 2)
      .join(tri, Seq("x"), "left")
      .select(col("x").as("part"), col("dg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        (floor(lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double")
          / (col("dg").cast("double") * (col("dg") - lit(1L)).cast("double")) * 1e4) / 1e4)
          .as("coeff"))
      .orderBy("part")
  }

  /** Degree histogram + CCDF over a canonical (u<v) edge list — see the
    * `graph_degree_dist` entry for the full design rationale. */
  /** L16 — ego-network reach body (added r12): per node, degree, the
    * ≤2-hop ego size, and the 2-hop frontier — the "how far does this
    * entity's influence extend in two steps" readout (SNA's ego-net
    * size; ops: blast-radius sizing for an entity change). Wedge volume
    * is Σ deg² over the SUPPORT-THRESHOLDED graph (the same cap that
    * makes triangles/common_neighbors tractable); everything is exact
    * integer counting — no float anywhere. */
  private def egoStatsBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val two = sym.join(sym.select(col("a").as("b"), col("b").as("c")), "b")
      .where(col("c") =!= col("a"))
      .select(col("a"), col("c").as("x"))
    val ego = sym.select(col("a"), col("b").as("x")).unionByName(two)
      .distinct()
      .groupBy("a").agg(count(lit(1)).as("n_ego2"))
    deg.join(ego, "a")
      .select(col("a").as("node"), col("deg"), col("n_ego2"),
        (col("n_ego2") - col("deg")).as("n_frontier"))
      .orderBy("node")
  }

  private def degreeDistBody(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x")).unionByName(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val hist = deg.groupBy("dg").agg(count(lit(1)).as("n_nodes"))
    val tot = hist.agg(sum("n_nodes").as("n_total"))
    // degree-histogram grain (≤ #distinct degree values) — the global
    // window is summary-sized, never node-sized (PlanShapeSpec allowlist)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dg").desc).rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist.crossJoin(broadcast(tot))
      .withColumn("n_ge", sum(col("n_nodes")).over(w))
      .select(col("dg"), col("n_nodes"), col("n_ge"), col("n_total"),
        (floor(col("n_ge").cast("double") / col("n_total").cast("double") * 1e4) / 1e4)
          .as("ccdf"))
      .orderBy("dg")
  }

  /** 3-round synchronous label propagation over a canonical (u<v) edge
    * list — see the `graph_label_prop` entry for the full design
    * rationale. */
  private def labelPropBody(edges: DataFrame, allParts: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to 3) {
      val counted = sym.join(labels, sym("b") === labels("node"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("a").orderBy(col("c").desc, col("lbl").asc)
      labels = counted.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("a").as("node"), col("lbl"))
    }
    allParts
      .join(labels.withColumnRenamed("node", "part"), Seq("part"), "left")
      .select(col("part"), coalesce(col("lbl"), col("part")).as("community"))
      .orderBy("part")
  }

  /** 8-round BFS level table from the minimum node id — see the
    * `graph_bfs_levels` entry for the full design rationale. Each round's
    * node-sized distance table is checkpointed with its predecessor freed
    * (the pagerank discipline): the dist relation is referenced TWICE per
    * round (union + expand), so a lazy 8-round unroll would double the
    * plan per round (2^8 subtrees). */
  private def bfsLevelsBody(edges: DataFrame, allParts: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    // canonical u < v per edge ⇒ the global minimum node always appears
    // as some edge's u — one tiny driver scalar, like pagerank's N
    val src = edges.agg(min(col("u"))).head().getLong(0)
    var dist = sym.select(col("a").as("node")).where(col("node") === src)
      .distinct().withColumn("level", lit(0L)).localCheckpoint(true)
    for (i <- 1 to 8) {
      val next = sym.join(dist, sym("b") === dist("node"))
        .select(col("a").as("node"), (col("level") + 1).as("level"))
      val merged = dist.unionByName(next)
        .groupBy("node").agg(min("level").as("level"))
        .localCheckpoint(true)
      graft.ops.Checkpoints.free(dist)
      dist = merged
    }
    val out = allParts
      .join(dist.withColumnRenamed("node", "part"), Seq("part"), "left")
      .select(col("part"), coalesce(col("level"), lit(-1L)).as("level"))
      .orderBy("part")
    graft.ops.Checkpoints.finishFreeing(out, sym, dist)
  }

  /** Capped k-core peel (k = 3, 16 rounds) — see the `graph_kcore` entry
    * for the full design rationale. Each round drops every node whose
    * degree in the SURVIVING subgraph is < 3 and restricts the edge list
    * to the keepers; the edge list is checkpointed per round with its
    * predecessor freed (the bfs/pagerank discipline — the edge relation
    * is referenced three times per round, so a lazy unroll would triple
    * the plan per round). The loop exits early once a round removes
    * nothing: the remaining rounds are provable no-ops, so the early
    * exit is RESULT-identical to the oracle's full 16 unrolled rounds
    * whether or not the peel has truly converged by round 16. Members
    * are the endpoints of the final edge list (at fixpoint: exactly the
    * 3-core), reported with their within-core degree. */
  private def kcoreBody(edges: DataFrame, allParts: DataFrame): DataFrame = {
    var e = edges.select("u", "v").localCheckpoint(true)
    var m = e.count()
    var round = 0
    var converged = false
    while (round < 16 && !converged) {
      val sym = e.select(col("u").as("w")).unionByName(e.select(col("v").as("w")))
      val keep = sym.groupBy("w").agg(count(lit(1)).as("dg"))
        .where(col("dg") >= 3).select("w")
      val pruned = e.join(keep.withColumnRenamed("w", "u"), Seq("u"))
        .join(keep.withColumnRenamed("w", "v"), Seq("v"))
        .select("u", "v").localCheckpoint(true)
      val m2 = pruned.count()
      if (m2 == m) { graft.ops.Checkpoints.free(pruned); converged = true }
      else { graft.ops.Checkpoints.free(e); e = pruned; m = m2 }
      round += 1
    }
    val members = e.select(col("u").as("part")).unionByName(e.select(col("v").as("part")))
      .groupBy("part").agg(count(lit(1)).as("dg"))
    val out = allParts.join(members, Seq("part"), "left")
      .select(col("part"),
        col("dg").isNotNull.cast("int").as("in_core"),
        coalesce(col("dg"), lit(0L)).as("core_deg"))
      .orderBy("part")
    graft.ops.Checkpoints.finishFreeing(out, e)
  }

  /** Adamic–Adar top-100 over a canonical (u<v) edge list — see the
    * `graph_adamic_adar` entry for the full design rationale. */
  private def adamicAdarBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("w"), col("v").as("x"))
      .unionByName(edges.select(col("v").as("w"), col("u").as("x")))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("dg"))
    // dg >= 2 keeps ln(dg) > 0 out of the weight's divisor; a deg-1
    // center can't form a wedge anyway, so the output is unchanged —
    // the guard only stops 1e9/ln(1) = ∞ from ever being computed
    // (sparser supported graph ⇒ deg-1 nodes are common now).
    val centers = sym.join(deg.where(col("dg").between(2, 64)), "w")
      .withColumn("aa_units", floor(lit(1e9) / log(col("dg").cast("double"))).cast("long"))
    val wedges = centers.select(col("w"), col("x").as("u"), col("aa_units"))
      .join(centers.select(col("w").as("w2"), col("x").as("v")),
        col("w") === col("w2") && col("u") < col("v"))
    wedges.groupBy("u", "v").agg(sum("aa_units").as("aa_score_units"))
      .join(edges, Seq("u", "v"), "left_anti")
      .orderBy(col("aa_score_units").desc, col("u"), col("v")).limit(100)
  }

  /** `graph_assortativity` body: degree assortativity (Newman 2002) —
    * the Pearson correlation of endpoint degrees over the symmetrized
    * edge list. Entirely exact-integer moments (degrees are ints; Σd,
    * Σd², Σd_u·d_v in DECIMAL(38,0)/HUGEINT, order-free) with ONE fixed
    * IEEE readout r = (M·Sxy − Sx²)/(M·Sxx − Sx²), floor-1e-4 — on the
    * symmetrized list Sx = Sy and Sxx = Syy, so the general Pearson form
    * collapses to this. Two node-keyed joins to attach degrees + one
    * global aggregate: linear in |E|. */
  private def assortativityBody(edges: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("dg"))
    sym
      .join(deg.select(col("node").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("dg").as("db")), "b")
      .agg(count(lit(1)).as("m2"),
        sum(col("da").cast(dec)).as("sx"),
        sum(col("da").cast(dec) * col("da").cast(dec)).as("sxx"),
        sum(col("da").cast(dec) * col("db").cast(dec)).as("sxy"))
      .select((col("m2") / 2).cast("long").as("m_edges"),
        (floor((col("m2").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          / (col("m2").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
          * 1e4) / 1e4).as("assortativity"))
  }

  /** `graph_modularity` body: Newman–Girvan modularity of the
    * `graph_label_prop` communities — per community c the contribution
    * q_c = e_c/m − (d_c/2m)², from exact integers (e_c intra-community
    * canonical edges, d_c total member degree, m the in-plan one-row
    * edge count broadcast — never a driver scalar) through one fixed
    * IEEE expression, floor-1e-6. Σ q_c is the partition's modularity Q;
    * per-community rows keep the readout oracle-checkable at row grain
    * and show WHICH communities carry the structure. */
  private def modularityBody(edges: DataFrame, allParts: DataFrame): DataFrame = {
    val com = labelPropBody(edges, allParts)
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy(col("a").as("part")).agg(count(lit(1)).as("dg"))
    val m = edges.agg(count(lit(1)).cast("double").as("m"))
    val ec = edges
      .join(com.select(col("part").as("u"), col("community").as("cu")), "u")
      .join(com.select(col("part").as("v"), col("community").as("cv")), "v")
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e_intra"))
    com.join(deg, Seq("part"), "left")
      .groupBy("community")
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("dg"), lit(0L))).as("d_tot"))
      .join(ec, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_tot"),
        (floor((coalesce(col("e_intra"), lit(0L)).cast("double") / col("m")
            - (col("d_tot").cast("double") / (lit(2.0d) * col("m")))
              * (col("d_tot").cast("double") / (lit(2.0d) * col("m"))))
          * 1e6) / 1e6).as("q_part"))
      .orderBy("community")
  }

  val queries: Map[String, Q] = Map(
    // L1 — damped PageRank (d=0.85, 5 fixed iterations) over the
    // symmetrized supplier–part graph. The edge list and degree table are
    // localCheckpoint'd ONCE and reused by all iterations (the classic
    // cache-the-edges shape: without it the unrolled 5-iteration plan
    // re-scans and re-distincts lineitem ~15×). Each iteration is
    // rank⋈edges on src (shuffle on node id) → groupBy dst with map-side
    // partial sum — linear in |E| per iteration at any scale, and since
    // r7 each iteration's node-sized rank table is checkpointed with its
    // predecessor freed (see [[pagerankBody]]) so the final plan is flat.
    // N (node count) is a driver-side scalar (metadata, like the
    // partition day lists). Symmetrized graph ⇒ no dangling nodes ⇒ no
    // global dangling-mass term ⇒ the oracle is 5 unrolled join+groupBy
    // CTEs, exactly this plan. round(8): both engines sum the same
    // contribution multiset in different orders (~1e-15 relative drift
    // after 5 rounds).
    "graph_pagerank" -> ((s, d) => {
      val edges = supplierPartEdges(s, d).localCheckpoint()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val n = deg.count()
      val ranks = pagerankBody(edges, deg, n, checkpointIters = true)
      finishFreeing(ranks, edges, deg, ranks)
    }),

    // L1' — personalized PageRank (added r8): the seeded-restart variant
    // behind per-entity "related items" / trust-propagation serving —
    // restart mass pinned on a 5-node md5-sampled seed set (deterministic
    // budget, the serveTail discipline) instead of spread uniformly. The
    // rank relation stays SPARSE (seed neighborhood only, see
    // [[pprBody]]); total mass is conserved at 1 by construction (no
    // dangling nodes on the symmetrized graph), which GraphSpec pins
    // along with the per-seed restart floor. round(8) absorbs the float
    // contribution-sum order drift, the graph_pagerank precedent.
    "graph_ppr" -> ((s, d) => {
      val edges = supplierPartEdges(s, d).localCheckpoint()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val n = deg.count()
      val seeds = deg.select(col("src").as("node"))
        .withColumn("h", md5(concat(col("node"), lit("|ppr"))))
        .orderBy("h", "node").limit(5).select("node")
        .localCheckpoint(true)
      val ranks = pprBody(edges, deg, seeds, 5L, n, checkpointIters = true)
      finishFreeing(ranks, edges, deg, seeds, ranks)
    }),

    // L2 — per-node triangle counts over the SUPPORTED co-purchase graph
    // (parts sharing ≥ 2 distinct orders, baskets capped at ≤ 8 parts —
    // see [[copurchaseEdges]]; support ≥ 2 aligned with `graph_cc` in r6,
    // which is also what cut this key from 36.9 s to per-query-target
    // territory at sf0.1). Degree orientation: each undirected edge
    // points from the (deg, node)-smaller endpoint to the larger, so
    // every triangle is generated exactly once at its orientation-minimum
    // vertex and the wedge join is bounded by Σ out-deg² — the
    // arboricity-style bound that keeps the self-join sub-quadratic on
    // skewed degree distributions (the reason production triangle counts
    // survive power-law graphs). Wedges close via an equi-join back to
    // the canonical (u<v) edge set; counts are orientation-invariant, so
    // the oracle can count the naive a<b<c way.
    "graph_triangles" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(trianglesBody(edges), edges)
    }),

    // L2' — per-node local clustering coefficient (added r9): triangle
    // count normalized by the node's wedge capacity C(deg, 2) — the
    // community-density readout per entity ("how clique-like is this
    // part's co-purchase neighborhood"), the per-node form of the global
    // transitivity number. Reuses [[trianglesBody]]'s orientation-bounded
    // triangle counts verbatim (one chain, two keys — the nnDescentCtes
    // discipline); nodes with deg ≥ 2 but no triangles appear with
    // coeff 0 via a left join. One extra degree-keyed join over
    // summary-sized tables beyond the triangle chain itself.
    "graph_clustering_coeff" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(clusteringCoeffBody(edges), edges)
    }),

    // L2'' — degree distribution + CCDF (added r9): the structural-health
    // histogram every graph pipeline checks first (is this co-purchase
    // graph power-law? did an upstream bug flatten it?). Node degrees are
    // one groupBy; everything after runs at DEGREE-HISTOGRAM grain
    // (≤ #distinct degree values — summary-sized at any corpus), so the
    // reverse-cumulative CCDF window is a bounded-input global window
    // (allowlisted), and the total is a broadcast one-row aggregate.
    "graph_degree_dist" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(degreeDistBody(edges), edges)
    }),

    // L16 — ego-network reach (added r12): see [[egoStatsBody]].
    "graph_ego_stats" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(egoStatsBody(edges), edges)
    }),

    // L3 — common-neighbor link prediction (added r5): the 100 strongest
    // NOT-YET-ADJACENT part pairs by shared co-purchase neighbors — the
    // classic "customers who bought these also bought" candidate
    // generator. Since r6 the underlying graph is the SUPPORTED
    // co-purchase graph ([[copurchaseEdges]], support ≥ 2 — aligned with
    // `graph_cc`): a single shared basket is coincidence, and on the
    // random fixture the support-1 graph made this the single most
    // expensive key in the bench (52.7 s sf0.1) for pairs that were 97%
    // noise. Wedge centers are additionally capped at degree ≤ 64 before the
    // self-join: a hub center contributes deg² wedges while carrying
    // almost no signal per pair (every production link predictor prunes
    // or downweights hubs — Adamic-Adar's 1/log(deg) is the soft version;
    // the cap is the hard one, and it bounds wedge volume at
    // Σ min(deg,64)² instead of Σ deg² under power-law skew). Candidate
    // pairs anti-join the edge set (predict NEW links only); exact
    // integer counts, total-order tie-break, so the top-100 is
    // deterministic.
    "graph_common_neighbors" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(commonNeighborsBody(edges), edges)
    }),

    // L4 — Adamic–Adar link prediction (added r5): the soft-downweight
    // twin of `graph_common_neighbors` — each shared neighbor w
    // contributes 1/ln(deg(w)) instead of 1, so promiscuous hubs count
    // for little and rare co-purchases count for a lot (Adamic & Adar
    // 2003, the standard production link-prediction score). Runs over the
    // same SUPPORTED graph as its twin since r6 ([[copurchaseEdges]],
    // support ≥ 2) — degrees, and therefore the 1/ln(deg) weights, are
    // supported-graph degrees. Determinism
    // at hash-match strictness: the per-center weight is quantized ONCE
    // to integer nano-units ⌊1e9/ln(deg)⌋ and summed as exact longs —
    // a float Σ 1/ln(deg) would depend on partition reduce order, and
    // cross-engine ln() drift (≤1 ulp) is absorbed by the floor except
    // on exact integer boundaries (probability ~1e-9 per distinct
    // degree). Same deg ≤ 64 wedge cap (hard) on top of AA's soft one;
    // every wedge center has deg ≥ 2 so ln(deg) > 0.
    "graph_adamic_adar" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(adamicAdarBody(edges), edges)
    }),

    // L6 — neighbor-set Jaccard similarity (added r7): the top-100
    // NOT-YET-ADJACENT part pairs by |N(a)∩N(b)| / |N(a)∪N(b)| — the
    // normalized sibling of `graph_common_neighbors` (raw counts reward
    // high-degree pairs; Jaccard rewards pairs whose neighborhoods
    // actually coincide, the score production item-item recommenders
    // ship). Same SUPPORTED co-purchase graph, same deg ≤ 64 hub cap on
    // wedge CENTERS (hub-pruned intersection counts — the documented
    // family policy; union sizes use full supported-graph degrees), same
    // Σ min(deg,64)² wedge bound. Determinism at hash-match strictness:
    // intersection and union are exact longs; the score is quantized as
    // ⌊1e9·common/union⌋ — common ≤ 64 keeps 1e9·common exactly
    // representable, and an IEEE quotient that IS an integer is exact, so
    // the floor can't straddle cross-engine. Total-order tie-break makes
    // the top-100 deterministic.
    "graph_jaccard" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(jaccardBody(edges), edges)
    }),

    // L7 — community detection via synchronous label propagation
    // (Raghavan et al. 2007), 3 fixed rounds over the SUPPORTED
    // co-purchase graph: every node starts as its own label; each round
    // every node adopts the most frequent label among its neighbors,
    // ties broken (count DESC, label ASC) so each round — and therefore
    // the whole run — is fully DETERMINISTIC (classic LPA's random
    // tie-break is the reason it usually can't be oracle-checked; the
    // total-order pick is the standard determinization). Fixed rounds
    // rather than convergence detection keep the plan statically
    // unrollable — 3 rounds ≈ label information traveling 3 hops, the
    // label-entropy knee on graphs of this diameter (7, per the cc
    // probe) — and the oracle is 3 unrolled join+window CTEs, exactly
    // this plan. Each round is one node-keyed shuffle join + one
    // (node,label) groupBy + a node-partitioned window over ≤deg label
    // rows — linear in |E| per round at any scale, the pagerank cost
    // shape. Parts on no supported edge stay their own singleton
    // community via the left-join coalesce (the graph_cc policy).
    "graph_label_prop" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val parts = Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
      finishFreeing(labelPropBody(edges, parts), edges)
    }),

    // L10 — degree assortativity (added r8): one number answering "do
    // hubs connect to hubs?" — the structural health readout for any
    // relationship graph (positive: social/co-purchase core-periphery;
    // negative: hub-and-spoke). Exact-integer moments over the
    // symmetrized supported graph, one IEEE readout, floor-1e-4; linear
    // in |E| (two degree joins + one global aggregate).
    "graph_assortativity" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      finishFreeing(assortativityBody(edges), edges)
    }),

    // L11 — modularity of the label-propagation partition (added r8):
    // the quality score that makes `graph_label_prop` actionable — did
    // propagation find real structure (Q markedly > 0) or noise? Per
    // community: member count, intra-edges, total degree, and the exact
    // Newman–Girvan contribution e/m − (d/2m)² (floor-1e-6, from exact
    // ints + the in-plan broadcast edge count). The oracle re-runs the
    // same 3 unrolled propagation rounds and the same integer readout.
    "graph_modularity" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val parts = Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
      finishFreeing(modularityBody(edges, parts), edges)
    }),

    // L12 — HITS hubs & authorities (added r10): see [[hitsBody]].
    "graph_hits" -> ((s, d) => hitsBody(s, d)),

    // L15 — truncated Katz centrality (added r11): the walk-counting
    // centrality between degree (k=1) and eigenvector/PageRank (k→∞) —
    // score = Σ_k α^k · (#walks of length k ending here), truncated at
    // k=3 with α = 1/8. The truncation is what makes it EXACT: with
    // z_t := 8^t·x_t the recurrence x_{t+1} = 1 + α·A·x_t becomes
    // z_{t+1}(i) = 8^(t+1) + Σ_{j~i} z_t(j) — pure integer sums, no
    // division until the single IEEE readout z_3/512 (floor-1e-6). Each
    // round is one edge join + node groupBy — the pagerank cost shape,
    // linear in |E| per round; parts on no supported edge stay at the
    // β-floor 1.0 via the left-join coalesce (the graph_cc policy).
    "graph_katz" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val parts = Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
      val out = katzBody(edges, parts)
      graft.ops.Checkpoints.free(edges)
      out
    }),

    // L14 — sampled-source closeness centrality (added r10): exact
    // closeness (reached−1)/Σdist + eccentricity for 4 md5-chosen seeds
    // over the supported co-purchase graph — the "how central is this
    // entity" readout at per-query cost (all-pairs closeness is O(n·E);
    // sampling sources is how production serves it). One BFS relation
    // keyed (seed, node) relaxed 8 rounds (the measured diameter-7
    // horizon, the bfs_levels bound) — each round one edge join + one
    // min groupBy, per-round node-sized checkpoints (the dist relation
    // is referenced twice per round; a lazy unroll would double the plan
    // per round — PlanScan skips it like graph_bfs_levels, GraphSpec
    // pins the per-round shape). Exact integer distances into one IEEE
    // divide, floor-1e-4.
    "graph_closeness" -> ((s, d) => closenessBody(copurchaseEdges(s, d))),

    // L14 — sampled betweenness centrality (added r9): see
    // [[betweennessBody]] — 4-seed horizon-bounded Brandes, exact-long
    // path counts forward, ordered-fold dependency accumulation backward.
    "graph_betweenness" -> ((s, d) => betweennessBody(copurchaseEdges(s, d))),

    // L13 — deterministic random walks (added r10): see [[randomWalkBody]].
    "graph_random_walk" -> ((s, d) => randomWalkBody(s, d)),

    // L8 — single-source shortest-path levels (added r7): BFS distance
    // from the minimum node id over the SUPPORTED co-purchase graph, 8
    // fixed relaxation rounds (the cc probe put the real graph's diameter
    // at 7) — the hop-distance readout a directory system uses for
    // "within N relations of X" queries. Each round is one node-keyed
    // shuffle join + a min groupBy — linear in |E| per round; per-round
    // node-sized checkpoints keep the doubly-referenced dist relation
    // from exponentially unrolling the plan (see [[bfsLevelsBody]]).
    // min-level merge makes the round count purely an upper bound: any
    // node within 8 hops carries its true distance, everything else −1
    // (unreached at this horizon), which the capped-recursion oracle
    // mirrors exactly. Deterministic by construction (min over exact
    // ints).
    "graph_bfs_levels" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val parts = Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
      val out = bfsLevelsBody(edges, parts)
      graft.ops.Checkpoints.free(edges)
      out
    }),

    // L9 — k-core membership (added r8): the 3-core of the SUPPORTED
    // co-purchase graph — the standard dense-subgraph screen (Seidman
    // 1983; the "remove the long tail before community/embedding work"
    // pass every production graph pipeline runs, and the complement of
    // graph_label_prop's communities: LPA labels everything, the k-core
    // says which labels sit on load-bearing structure). Iterative peel:
    // each round drops nodes with surviving-degree < 3 — one node-keyed
    // groupBy + two semi-join restrictions per round, linear in |E| at
    // any scale, O(peel depth) rounds CAPPED at 16 (the bfs_levels
    // horizon policy: the cap makes the oracle statically unrollable —
    // 16 join+filter CTE rounds, exactly this plan — and the early-exit
    // loop is result-identical to the capped unroll whether or not the
    // peel converged). Members reported with their within-core degree;
    // everything is exact-integer, no rounding edge anywhere.
    "graph_kcore" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val parts = Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
      val out = kcoreBody(edges, parts)
      graft.ops.Checkpoints.free(edges)
      out
    }),

    // L5 — connected components (added r5): component label (= minimum
    // member part id) for every part in the warehouse, over the SUPPORTED
    // co-purchase graph — an edge requires ≥ 2 distinct shared orders, so
    // one coincidental basket doesn't merge two product families (support
    // thresholding is also what keeps the random-basket giant component
    // from swallowing the graph; the support-1 graph at any real scale is
    // one blob, and a component label over a blob is signal-free). Labels
    // via `Dedup.clustersPointerJump` — the SAME O(log diameter)
    // pointer-doubling primitive the dedup-cluster family runs, reused
    // across domains (checkpoint-per-round + immediate reclamation, gated
    // broadcast under 5M nodes). Parts outside every supported edge are
    // their own singleton component via the left-join coalesce.
    "graph_cc" -> ((s, d) => {
      val edges = copurchaseEdges(s, d)
      val labels = Dedup.clustersPointerJump(
        edges.select(col("u").as("a_id"), col("v").as("b_id")))
      // clustersPointerJump has materialized its own internal checkpoints
      // and returned a (node-sized) label checkpoint — the edge list has
      // no remaining consumer.
      graft.ops.Checkpoints.free(edges)
      finishFreeing(
        Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct()
          .join(labels.withColumnRenamed("id", "part"), Seq("part"), "left")
          .select(col("part"),
            coalesce(col("cluster_id"), col("part")).as("component"))
          .orderBy("part"),
        labels)
    }))

  /** Pre-checkpoint LAZY compositions of the graph keys, for plan audit
    * (graft.tools.PlanScan): identical operator structure to [[queries]]
    * minus the localCheckpoint materialization, so exchange counts and
    * join strategies are inspectable WITHOUT executing the query — the
    * [[queries]] route executes eagerly and returns a bare LogicalRDD
    * whose plan shows nothing. Planning pagerank's audit form executes
    * one node-count aggregate (N is a driver-side scalar by design);
    * nothing else runs. `graph_cc` has no lazy form — its pointer-jump
    * loop is data-dependently iterative (a round count can't be planned
    * ahead); its per-round join shape is the one inside
    * [[Dedup.clustersPointerJump]], exercised by GraphSpec/DedupSpec. */
  val auditPlans: Map[String, Q] = Map(
    "graph_pagerank" -> ((s, d) => {
      val edges = supplierPartEdges(s, d)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      pagerankBody(edges, deg, deg.count(), checkpointIters = false)
    }),
    "graph_ppr" -> ((s, d) => {
      val edges = supplierPartEdges(s, d)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val seeds = deg.select(col("src").as("node"))
        .withColumn("h", md5(concat(col("node"), lit("|ppr"))))
        .orderBy("h", "node").limit(5).select("node")
      pprBody(edges, deg, seeds, 5L, deg.count(), checkpointIters = false)
    }),
    "graph_triangles" -> ((s, d) => trianglesBody(copurchaseEdgesPlan(s, d))),
    "graph_clustering_coeff" ->
      ((s, d) => clusteringCoeffBody(copurchaseEdgesPlan(s, d))),
    "graph_degree_dist" -> ((s, d) => degreeDistBody(copurchaseEdgesPlan(s, d))),
    "graph_ego_stats" -> ((s, d) => egoStatsBody(copurchaseEdgesPlan(s, d))),
    "graph_common_neighbors" ->
      ((s, d) => commonNeighborsBody(copurchaseEdgesPlan(s, d))),
    "graph_adamic_adar" -> ((s, d) => adamicAdarBody(copurchaseEdgesPlan(s, d))),
    "graph_jaccard" -> ((s, d) => jaccardBody(copurchaseEdgesPlan(s, d))),
    "graph_hits" -> ((s, d) => hitsBody(s, d, checkpointed = false)),
    "graph_random_walk" ->
      ((s, d) => randomWalkBody(s, d, checkpointed = false)),
    "graph_label_prop" -> ((s, d) => labelPropBody(copurchaseEdgesPlan(s, d),
      Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct())),
    "graph_assortativity" -> ((s, d) => assortativityBody(copurchaseEdgesPlan(s, d))),
    "graph_modularity" -> ((s, d) => modularityBody(copurchaseEdgesPlan(s, d),
      Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct())),
    "graph_katz" -> ((s, d) => katzBody(copurchaseEdgesPlan(s, d),
      Tables.lineitem(s, d).select(col("l_partkey").as("part")).distinct(),
      checkpointed = false)))

  /** L15 — exact truncated-Katz body: 3 rounds of
    * z_{t+1}(i) = 8^(t+1) + Σ_{j~i} z_t(j) over the symmetrized supported
    * edges, all exact longs; readout = z_3 / 8^3, floor-1e-6. Per-round
    * node-sized checkpoints (the pagerank discipline) unless `checkpointed`
    * is false (lazy plan-audit twin). */
  private def katzBody(edges: DataFrame, allParts: DataFrame,
                       checkpointed: Boolean = true): DataFrame = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
    var z = allParts.select(col("part"), lit(1L).as("z"))
    if (checkpointed) z = z.localCheckpoint(true)
    for (t <- 1 to 3) {
      val nbSum = sym.join(z.withColumnRenamed("part", "dst"), "dst")
        .groupBy("src").agg(sum("z").as("nsum"))
        .withColumnRenamed("src", "part")
      var next = allParts.join(nbSum, Seq("part"), "left")
        .select(col("part"),
          (lit(1L << (3 * t)) + coalesce(col("nsum"), lit(0L))).as("z"))
      if (checkpointed) {
        next = next.localCheckpoint(true)
        graft.ops.Checkpoints.free(z)
      }
      z = next
    }
    val out = z.select(col("part"), col("z").as("z3"),
        (floor(col("z").cast("double") / lit(512.0) * 1e6) / 1e6).as("katz"))
      .orderBy("part")
    if (checkpointed) graft.ops.Checkpoints.finishFreeing(out, z) else out
  }

  /** L12 — HITS hubs & authorities (added r10): 2 power iterations over
    * the DIRECTED supplier→part bipartite edges (hubs = suppliers who
    * buy broadly-demanded parts; authorities = parts demanded by strong
    * hubs — the mutual-reinforcement ranking PageRank's single vector
    * can't express on a bipartite graph). Determinism is EXACT, one step
    * stronger than pagerank's round-8-on-unordered-float-sums: after
    * every iteration the max-normalized score is quantized to 1e-9-unit
    * longs, so every Σ across edges is an exact integer sum (order-free,
    * map-side partial) and the only floats are single IEEE divides of
    * exact ints. Each iteration = one edge join + node-grain agg — the
    * pagerank shuffle shape; node tables broadcast under the same 5M
    * gate. Scores in [0,1] with the per-side max pinned at exactly 1.0. */
  private def hitsBody(s: SparkSession, d: String,
      checkpointed: Boolean = true): DataFrame = {
    val Q = 1000000000L
    val e0 = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk")).distinct()
    val e = if (checkpointed) e0.localCheckpoint(true) else e0
    def maybeBc(df: DataFrame, n: Long): DataFrame =
      if (n < 5000000L) broadcast(df) else df
    val nNodes = e.select(col("sk")).distinct().count() +
      e.select(col("pk")).distinct().count()
    def norm(df: DataFrame, key: String): DataFrame = {
      val mx = df.agg(max(col("v")).as("mx"))
      df.crossJoin(broadcast(mx))
        .select(col(key),
          floor(col("v").cast("double") / col("mx").cast("double") * Q)
            .cast("long").as("nq"))
    }
    val a1 = norm(e.groupBy("pk").agg((count(lit(1)) * Q).as("v")), "pk")
    val h1 = norm(e.join(maybeBc(a1, nNodes), "pk").groupBy("sk").agg(sum("nq").as("v")), "sk")
    val a2 = norm(e.join(maybeBc(h1, nNodes), "sk").groupBy("pk").agg(sum("nq").as("v")), "pk")
    val h2 = norm(e.join(maybeBc(a2, nNodes), "pk").groupBy("sk").agg(sum("nq").as("v")), "sk")
    val out = h2.select(lit("hub").as("kind"), concat(lit("s"), col("sk")).as("node"),
        (col("nq").cast("double") / Q).as("score"))
      .unionByName(a2.select(lit("authority").as("kind"),
        concat(lit("p"), col("pk")).as("node"),
        (col("nq").cast("double") / Q).as("score")))
      .orderBy("kind", "node")
    if (checkpointed) finishFreeing(out, e) else out
  }

  /** L14 — multi-seed BFS closeness (added r10): see the registry entry.
    * `edges` must be the canonical (u<v) co-purchase list; the caller's
    * checkpoint is freed here once the readout materializes. */
  /** L14 — horizon-bounded sampled betweenness (Brandes 2001; added r9):
    * the load-bearing-node centrality the family was missing — which
    * parts sit ON the shortest paths between others (closeness says who
    * is near everything; betweenness says who everything routes
    * through). Exact Brandes is O(n·E); production serves the standard
    * sampled form — here 4 md5-chosen seeds — and the 8-round horizon
    * (diameter probed at 7) makes both the loop and the oracle
    * statically unrollable, the bfs_levels policy: paths longer than the
    * horizon are excluded ON BOTH ENGINES, so parity is unconditional
    * and the semantic is the documented k-bounded betweenness.
    *
    * Forward = level-synchronous BFS with PATH COUNTS: σ(v) = Σ σ(u)
    * over level-(r−1) neighbors — exact longs (sums of longs, order-
    * free). Backward = dependency accumulation δ(v) = Σ_w σv/σw·(1+δw)
    * over level-(L+1) successors, processed strictly downward so every
    * δw is finalized before use; each per-node sum folds its successor
    * terms in w order (array_sort + sequential aggregate ↔ DuckDB
    * `list(… ORDER BY)` + list_aggregate — the chi_square idiom), so
    * both engines fold identical IEEE sequences. Per round: one edge
    * join + one (seed,node) aggregation, linear in |E| — 8 forward + 8
    * backward node-sized checkpoints (the closeness discipline; the
    * doubly-referenced dist relation is why PlanScan skips this key).
    * Final betweenness = per-node fold of its ≤4 seed deltas in seed
    * order, floor-1e-4. */
  private def betweennessBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    val seeds = sym.select(col("a").as("node")).distinct()
      .withColumn("h", md5(concat(col("node").cast("string"), lit("|btw"))))
      .orderBy("h", "node").limit(4).select(col("node").as("seed"))
      .localCheckpoint(true)
    var ds = seeds.select(col("seed"), col("seed").as("node"),
      lit(0).as("level"), lit(1L).as("sigma")).localCheckpoint(true)
    for (r <- 1 to 8) {
      val frontier = ds.where(col("level") === r - 1)
      val cand = sym.join(frontier, sym("b") === frontier("node"))
        .groupBy(col("seed"), col("a").as("node"))
        .agg(sum("sigma").as("sigma"))
      val fresh = cand.join(ds.select("seed", "node"), Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"), lit(r).as("level"), col("sigma"))
      val merged = ds.unionByName(fresh).localCheckpoint(true)
      graft.ops.Checkpoints.free(ds)
      ds = merged
    }
    // horizon rim: level-8 nodes have no finalized successors — δ = 0
    var finalized = ds.where(col("level") === 8)
      .withColumn("delta", lit(0.0)).localCheckpoint(true)
    for (lvl <- 7 to 0 by -1) {
      val upper = finalized.where(col("level") === lvl + 1)
        .select(col("seed"), col("node").as("w"),
          col("sigma").as("sw"), col("delta").as("dw"))
      val lower = ds.where(col("level") === lvl)
      val folded = sym.join(upper, sym("b") === col("w"))
        .select(col("seed"), col("a").as("node"), col("w"), col("sw"), col("dw"))
        .join(lower.select(col("seed"), col("node"), col("sigma").as("sv")),
          Seq("seed", "node"))
        .select(col("seed"), col("node"), col("w"),
          (col("sv").cast("double") / col("sw").cast("double")
            * (lit(1.0) + col("dw"))).as("c"))
        .groupBy("seed", "node")
        .agg(expr("aggregate(array_sort(collect_list(named_struct('w', w, 'x', c))), " +
          "CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.x)").as("delta"))
      val lvlDone = lower
        .join(folded, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("level"), col("sigma"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
      val merged = finalized.unionByName(lvlDone).localCheckpoint(true)
      graft.ops.Checkpoints.free(finalized)
      finalized = merged
    }
    val out = finalized.where(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_seeds"),
        expr("aggregate(array_sort(collect_list(named_struct('s', seed, 'x', delta))), " +
          "CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.x)").as("bc"))
      .select(col("node"), col("n_seeds"),
        (floor(col("bc") * 1e4) / 1e4).as("betweenness"))
      .orderBy("node")
    graft.ops.Checkpoints.finishFreeing(out, edges, sym, seeds, ds, finalized)
  }

  private def closenessBody(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(true)
    val seeds = sym.select(col("a").as("node")).distinct()
      .withColumn("h", md5(concat(col("node").cast("string"), lit("|close"))))
      .orderBy("h", "node").limit(4).select(col("node").as("seed"))
      .localCheckpoint(true)
    var dist = seeds.select(col("seed"), col("seed").as("node"), lit(0L).as("level"))
      .localCheckpoint(true)
    for (_ <- 1 to 8) {
      val next = sym.join(dist, sym("b") === dist("node"))
        .select(col("seed"), col("a").as("node"), (col("level") + 1).as("level"))
      val merged = dist.unionByName(next)
        .groupBy("seed", "node").agg(min("level").as("level"))
        .localCheckpoint(true)
      graft.ops.Checkpoints.free(dist)
      dist = merged
    }
    val out = dist.groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum("level").as("sum_dist"),
        max("level").as("eccentricity"))
      .select(col("seed"), col("n_reached"), col("eccentricity"),
        when(col("sum_dist") > 0,
          floor((col("n_reached") - 1).cast("double")
            / col("sum_dist").cast("double") * 1e4) / 1e4).as("closeness"))
      .orderBy("seed")
    graft.ops.Checkpoints.finishFreeing(out, edges, sym, seeds, dist)
  }

  /** L13 — deterministic random walks (added r10): one 4-hop walk from
    * every supplier node over the symmetrized supplier↔part graph — the
    * DeepWalk/node2vec corpus-generation primitive, made replayable: the
    * next hop is the neighbor minimizing md5(walk:step:neighbor) (a
    * per-step pseudo-random draw that is a pure function of the walk id,
    * so walks are identical across engines, retries and partitionings —
    * the property a sampling pipeline must have to be debuggable). Each
    * hop is ONE join of the walk-frontier against the edge list + a
    * struct-min argmin — frontier stays start-set-sized at every hop
    * (walks never fork), broadcast under the pagerank 5M gate. */
  private def randomWalkBody(s: SparkSession, d: String,
      checkpointed: Boolean = true): DataFrame = {
    val e = if (checkpointed) supplierPartEdges(s, d).localCheckpoint(true)
            else supplierPartEdges(s, d)
    def maybeBc(df: DataFrame, n: Long): DataFrame =
      if (n < 5000000L) broadcast(df) else df
    val starts0 = e.select(col("src")).where(col("src").startsWith("s"))
      .distinct().select(col("src").as("walk"), col("src").as("cur"))
    val starts = if (checkpointed) starts0.localCheckpoint(true) else starts0
    val nStarts = starts.count()
    var pos = starts
    // hop tables are start-set-sized checkpoints; all four feed the final
    // join, so none is freed mid-loop — finishFreeing reclaims the lot
    // once the result has materialized
    val hops = (1 to 4).map { i =>
      val nxt0 = maybeBc(pos, nStarts).join(e, pos("cur") === e("src"))
        .withColumn("h", md5(concat(col("walk"), lit(s":$i:"), col("dst"))))
        .groupBy("walk").agg(min(struct(col("h"), col("dst"))).as("b"))
        .select(col("walk"), col("b.dst").as("cur"))
      val nxt = if (checkpointed) nxt0.localCheckpoint(true) else nxt0
      pos = nxt
      nxt.select(col("walk"), col("cur").as(s"hop$i"))
    }
    val out = hops.foldLeft(starts.select("walk"))((acc, h) => acc.join(h, "walk"))
      .orderBy("walk")
    if (checkpointed) finishFreeing(out, (Seq(e, starts) ++ hops): _*) else out
  }

  val oracles: Map[String, String] = {
    // shared CTE prefix for pagerank: symmetrized edges + degrees + N
    val prBase =
      """WITH e0 AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
        |edges AS (
        |  SELECT concat('s', sk) AS src, concat('p', pk) AS dst FROM e0
        |  UNION ALL SELECT concat('p', pk), concat('s', sk) FROM e0
        |),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        |r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM deg)""".stripMargin
    val prIter = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         0.15 / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg) AS rank
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst
         |)""".stripMargin
    }.mkString(",\n")
    val pprIter = (1 to 5).map { i =>
      s"""p$i AS (
         |  SELECT coalesce(m.node, s.node) AS node,
         |         coalesce(0.85 * m.m, 0.0)
         |           + CASE WHEN s.node IS NOT NULL THEN CAST(0.15 AS DOUBLE) / 5
         |                  ELSE 0.0 END AS rank
         |  FROM (SELECT e.dst AS node, sum(r.rank / d.deg) AS m
         |        FROM edges e JOIN p${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |        GROUP BY e.dst) m
         |  FULL JOIN seeds s ON m.node = s.node
         |)""".stripMargin
    }.mkString(",\n")
    Map(
      "graph_pagerank" ->
        s"""$prBase,
           |$prIter
           |SELECT node, round(rank, 8) AS rank FROM r5 ORDER BY node""".stripMargin,
      "graph_ppr" ->
        s"""$prBase,
           |seeds AS MATERIALIZED (
           |  SELECT src AS node FROM deg ORDER BY md5(src || '|ppr'), src LIMIT 5
           |),
           |p0 AS (SELECT node, 1.0 / 5 AS rank FROM seeds),
           |$pprIter
           |SELECT node, round(rank, 8) AS rank FROM p5 ORDER BY node""".stripMargin,
      "graph_triangles" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |t AS (
          |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
          |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
          |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
          |),
          |nodes AS (
          |  SELECT a AS part FROM t
          |  UNION ALL SELECT b FROM t
          |  UNION ALL SELECT c FROM t
          |)
          |SELECT part, count(*) AS n_triangles FROM nodes GROUP BY part ORDER BY part""".stripMargin,
      "graph_clustering_coeff" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT w, count(*) AS dg FROM sym GROUP BY w),
          |t AS (
          |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
          |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
          |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
          |),
          |nodes AS (
          |  SELECT a AS part FROM t
          |  UNION ALL SELECT b FROM t
          |  UNION ALL SELECT c FROM t
          |),
          |tc AS (SELECT part, count(*) AS n_triangles FROM nodes GROUP BY part)
          |SELECT d.w AS part, d.dg, coalesce(tc.n_triangles, 0) AS n_triangles,
          |       floor(2.0 * CAST(coalesce(tc.n_triangles, 0) AS DOUBLE)
          |             / (CAST(d.dg AS DOUBLE) * CAST(d.dg - 1 AS DOUBLE)) * 1e4) / 1e4 AS coeff
          |FROM deg d LEFT JOIN tc ON d.w = tc.part
          |WHERE d.dg >= 2 ORDER BY part""".stripMargin,
      "graph_degree_dist" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT w, count(*) AS dg FROM sym GROUP BY w),
          |hist AS (SELECT dg, count(*) AS n_nodes FROM deg GROUP BY dg),
          |tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM hist)
          |SELECT h.dg, h.n_nodes,
          |       CAST(sum(h.n_nodes) OVER (ORDER BY h.dg DESC
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_ge,
          |       tot.n_total,
          |       floor(CAST(sum(h.n_nodes) OVER (ORDER BY h.dg DESC
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |             / CAST(tot.n_total AS DOUBLE) * 1e4) / 1e4 AS ccdf
          |FROM hist h CROSS JOIN tot ORDER BY h.dg""".stripMargin,
      "graph_ego_stats" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a),
          |ego AS (
          |  SELECT a, count(DISTINCT x) AS n_ego2 FROM (
          |    SELECT a, b AS x FROM sym
          |    UNION ALL
          |    SELECT s1.a, s2.b AS x
          |    FROM sym s1 JOIN sym s2 ON s1.b = s2.a
          |    WHERE s2.b <> s1.a
          |  ) GROUP BY a
          |)
          |SELECT deg.a AS node, deg.deg, ego.n_ego2,
          |       ego.n_ego2 - deg.deg AS n_frontier
          |FROM deg JOIN ego USING (a) ORDER BY node""".stripMargin,
      "graph_common_neighbors" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT w, count(*) AS dg FROM sym GROUP BY w),
          |c AS (SELECT s.w, s.x FROM sym s JOIN deg d ON s.w = d.w AND d.dg <= 64),
          |wedge AS (
          |  SELECT a.w, a.x AS u, b.x AS v FROM c a JOIN c b ON a.w = b.w AND a.x < b.x
          |),
          |cn AS (SELECT u, v, count(*) AS common FROM wedge GROUP BY u, v)
          |SELECT cn.u, cn.v, cn.common
          |FROM cn LEFT JOIN e ON cn.u = e.u AND cn.v = e.v
          |WHERE e.u IS NULL
          |ORDER BY common DESC, cn.u, cn.v LIMIT 100""".stripMargin,
      "graph_adamic_adar" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT w, count(*) AS dg FROM sym GROUP BY w),
          |c AS (
          |  SELECT s.w, s.x, CAST(floor(1e9 / ln(CAST(d.dg AS DOUBLE))) AS BIGINT) AS aa_units
          |  FROM sym s JOIN deg d ON s.w = d.w AND d.dg BETWEEN 2 AND 64
          |),
          |wedge AS (
          |  SELECT a.w, a.x AS u, b.x AS v, a.aa_units
          |  FROM c a JOIN c b ON a.w = b.w AND a.x < b.x
          |),
          |aa AS (SELECT u, v, CAST(sum(aa_units) AS BIGINT) AS aa_score_units
          |       FROM wedge GROUP BY u, v)
          |SELECT aa.u, aa.v, aa.aa_score_units
          |FROM aa LEFT JOIN e ON aa.u = e.u AND aa.v = e.v
          |WHERE e.u IS NULL
          |ORDER BY aa_score_units DESC, aa.u, aa.v LIMIT 100""".stripMargin,
      "graph_jaccard" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT w, count(*) AS dg FROM sym GROUP BY w),
          |c AS (SELECT s.w, s.x FROM sym s JOIN deg d ON s.w = d.w AND d.dg <= 64),
          |wedge AS (
          |  SELECT a.w, a.x AS u, b.x AS v FROM c a JOIN c b ON a.w = b.w AND a.x < b.x
          |),
          |cn AS (SELECT u, v, count(*) AS common FROM wedge GROUP BY u, v),
          |j AS (
          |  SELECT cn.u, cn.v, cn.common, du.dg + dv.dg - cn.common AS n_union
          |  FROM cn JOIN deg du ON cn.u = du.w JOIN deg dv ON cn.v = dv.w
          |)
          |SELECT j.u, j.v, j.common, j.n_union,
          |       CAST(floor(1e9 * j.common / j.n_union) AS BIGINT) AS jaccard_units
          |FROM j LEFT JOIN e ON j.u = e.u AND j.v = e.v
          |WHERE e.u IS NULL
          |ORDER BY jaccard_units DESC, j.u, j.v LIMIT 100""".stripMargin,
      "graph_label_prop" -> {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (
             |  SELECT node, lbl FROM (
             |    SELECT s.a AS node, l.lbl, count(*) AS c,
             |           row_number() OVER (PARTITION BY s.a
             |                              ORDER BY count(*) DESC, l.lbl ASC) AS rn
             |    FROM sym s JOIN r${i - 1} l ON s.b = l.node
             |    GROUP BY s.a, l.lbl
             |  ) t WHERE rn = 1
             |)""".stripMargin
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
           |e AS (
           |  SELECT a.pk AS u, b.pk AS v
           |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           |  JOIN ok8 ON a.ok = ok8.ok
           |  GROUP BY 1, 2 HAVING count(*) >= 2
           |),
           |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
           |r0 AS (SELECT DISTINCT a AS node, a AS lbl FROM sym),
           |$rounds,
           |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem)
           |SELECT p.part, coalesce(r.lbl, p.part) AS community
           |FROM parts p LEFT JOIN r3 r ON r.node = p.part
           |ORDER BY p.part""".stripMargin
      },
      "graph_assortativity" ->
        """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
          |deg AS (SELECT a AS node, count(*) AS dg FROM sym GROUP BY a),
          |dd AS (
          |  SELECT da.dg AS da, db.dg AS db
          |  FROM sym s JOIN deg da ON s.a = da.node JOIN deg db ON s.b = db.node
          |),
          |ag AS (
          |  SELECT count(*) AS m2,
          |         sum(CAST(da AS HUGEINT)) AS sx,
          |         sum(CAST(da AS HUGEINT) * CAST(da AS HUGEINT)) AS sxx,
          |         sum(CAST(da AS HUGEINT) * CAST(db AS HUGEINT)) AS sxy
          |  FROM dd
          |)
          |SELECT CAST(m2 // 2 AS BIGINT) AS m_edges,
          |       floor((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
          |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |         / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
          |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |         * 1e4) / 1e4 AS assortativity
          |FROM ag""".stripMargin,
      "graph_modularity" -> {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (
             |  SELECT node, lbl FROM (
             |    SELECT s.a AS node, l.lbl, count(*) AS c,
             |           row_number() OVER (PARTITION BY s.a
             |                              ORDER BY count(*) DESC, l.lbl ASC) AS rn
             |    FROM sym s JOIN r${i - 1} l ON s.b = l.node
             |    GROUP BY s.a, l.lbl
             |  ) t WHERE rn = 1
             |)""".stripMargin
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
           |e AS (
           |  SELECT a.pk AS u, b.pk AS v
           |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           |  JOIN ok8 ON a.ok = ok8.ok
           |  GROUP BY 1, 2 HAVING count(*) >= 2
           |),
           |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
           |r0 AS (SELECT DISTINCT a AS node, a AS lbl FROM sym),
           |$rounds,
           |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
           |com AS (
           |  SELECT p.part, coalesce(r.lbl, p.part) AS community
           |  FROM parts p LEFT JOIN r3 r ON r.node = p.part
           |),
           |deg AS (SELECT a AS part, count(*) AS dg FROM sym GROUP BY a),
           |mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
           |ec AS (
           |  SELECT cu.community, count(*) AS e_intra
           |  FROM e JOIN com cu ON e.u = cu.part JOIN com cv ON e.v = cv.part
           |  WHERE cu.community = cv.community
           |  GROUP BY cu.community
           |),
           |dc AS (
           |  SELECT c.community, count(*) AS n_nodes, sum(coalesce(d.dg, 0)) AS d_tot
           |  FROM com c LEFT JOIN deg d ON c.part = d.part
           |  GROUP BY c.community
           |)
           |SELECT dc.community, dc.n_nodes, coalesce(ec.e_intra, 0) AS e_intra,
           |       CAST(dc.d_tot AS BIGINT) AS d_tot,
           |       floor((CAST(coalesce(ec.e_intra, 0) AS DOUBLE) / (SELECT m FROM mm)
           |           - (CAST(dc.d_tot AS DOUBLE) / (2.0 * (SELECT m FROM mm)))
           |             * (CAST(dc.d_tot AS DOUBLE) / (2.0 * (SELECT m FROM mm))))
           |         * 1e6) / 1e6 AS q_part
           |FROM dc LEFT JOIN ec ON dc.community = ec.community
           |ORDER BY dc.community""".stripMargin
      },
      "graph_bfs_levels" ->
        """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
          |src AS (SELECT min(u) AS s FROM e),
          |walk AS (
          |  SELECT s AS node, 0 AS lvl FROM src
          |  UNION
          |  SELECT e2.b, w.lvl + 1 FROM walk w JOIN sym e2 ON e2.a = w.node
          |  WHERE w.lvl < 8
          |),
          |lv AS (SELECT node, CAST(min(lvl) AS BIGINT) AS level FROM walk GROUP BY 1),
          |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem)
          |SELECT p.part, coalesce(l.level, -1) AS level
          |FROM parts p LEFT JOIN lv l ON l.node = p.part
          |ORDER BY p.part""".stripMargin,
      "graph_kcore" -> {
        // 16 statically-unrolled peel rounds — the exact capped-recursion
        // mirror of kcoreBody's early-exit loop (extra rounds past the
        // fixpoint are no-ops, so the two are result-identical)
        val rounds = (1 to 16).map { i =>
          s"""k$i AS MATERIALIZED (
             |  SELECT w FROM (SELECT u AS w FROM e${i - 1}
             |                 UNION ALL SELECT v FROM e${i - 1}) s
             |  GROUP BY w HAVING count(*) >= 3
             |),
             |e$i AS MATERIALIZED (
             |  SELECT e.u, e.v FROM e${i - 1} e
             |  JOIN k$i a ON e.u = a.w JOIN k$i b ON e.v = b.w
             |)""".stripMargin
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
           |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
           |e0 AS MATERIALIZED (
           |  SELECT a.pk AS u, b.pk AS v
           |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           |  JOIN ok8 ON a.ok = ok8.ok
           |  GROUP BY 1, 2 HAVING count(*) >= 2
           |),
           |$rounds,
           |mem AS (
           |  SELECT w AS part, count(*) AS dg
           |  FROM (SELECT u AS w FROM e16 UNION ALL SELECT v FROM e16) s
           |  GROUP BY w
           |),
           |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem)
           |SELECT p.part,
           |       CAST(CASE WHEN m.dg IS NULL THEN 0 ELSE 1 END AS INTEGER) AS in_core,
           |       CAST(coalesce(m.dg, 0) AS BIGINT) AS core_deg
           |FROM parts p LEFT JOIN mem m ON m.part = p.part
           |ORDER BY p.part""".stripMargin
      },
      "graph_cc" ->
        """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |sup AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |edges AS (SELECT u, v FROM sup UNION SELECT v, u FROM sup),
          |reach AS (
          |  SELECT u AS id, u AS r FROM edges
          |  UNION
          |  SELECT rc.id, e.v FROM reach rc JOIN edges e ON e.u = rc.r
          |),
          |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
          |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem)
          |SELECT p.part, coalesce(c.component, p.part) AS component
          |FROM parts p LEFT JOIN comp c ON c.id = p.part
          |ORDER BY p.part""".stripMargin,
      "graph_closeness" ->
        """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
          |seeds AS (
          |  SELECT node AS seed FROM (SELECT DISTINCT a AS node FROM sym)
          |  ORDER BY md5(concat(CAST(node AS VARCHAR), '|close')), node LIMIT 4
          |),
          |walk AS (
          |  SELECT seed, seed AS node, 0 AS lvl FROM seeds
          |  UNION
          |  SELECT w.seed, e2.b, w.lvl + 1 FROM walk w JOIN sym e2 ON e2.a = w.node
          |  WHERE w.lvl < 8
          |),
          |lv AS (SELECT seed, node, CAST(min(lvl) AS BIGINT) AS level
          |       FROM walk GROUP BY 1, 2)
          |SELECT seed, count(*) AS n_reached,
          |       CAST(max(level) AS BIGINT) AS eccentricity,
          |       CASE WHEN CAST(sum(level) AS BIGINT) > 0
          |            THEN floor(CAST(count(*) - 1 AS DOUBLE)
          |                       / CAST(sum(level) AS DOUBLE) * 1e4) / 1e4
          |       END AS closeness
          |FROM lv GROUP BY seed ORDER BY seed""".stripMargin,
      // horizon-bounded Brandes, statically unrolled: 8 forward
      // level/σ CTEs (NOT EXISTS = the left-anti settle check), then 8
      // backward dependency CTEs folding successor terms in w order via
      // list(… ORDER BY) + list_aggregate — the exact plan the Spark body
      // runs, level for level.
      "graph_betweenness" -> {
        // every CTE is MATERIALIZED: DuckDB inlines multiply-referenced
        // CTEs, and with ~30 of them referencing sym/s8 the inlined tree
        // re-opened the lineitem parquet past the fd limit (measured:
        // "Too many open files"); materialization caps it at one scan.
        val head =
          """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |ok8 AS MATERIALIZED (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
            |e AS MATERIALIZED (
            |  SELECT a.pk AS u, b.pk AS v
            |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            |  JOIN ok8 ON a.ok = ok8.ok
            |  GROUP BY 1, 2 HAVING count(*) >= 2
            |),
            |sym AS MATERIALIZED (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
            |seeds AS MATERIALIZED (
            |  SELECT node AS seed FROM (SELECT DISTINCT a AS node FROM sym)
            |  ORDER BY md5(concat(CAST(node AS VARCHAR), '|btw')), node LIMIT 4
            |),
            |l0 AS MATERIALIZED (SELECT seed, seed AS node, 0 AS level, CAST(1 AS BIGINT) AS sigma FROM seeds),
            |s0 AS MATERIALIZED (SELECT * FROM l0)""".stripMargin
        val fwd = (1 to 8).map { r =>
          s"""l$r AS MATERIALIZED (
             |  SELECT p.seed, e2.a AS node, $r AS level, CAST(sum(p.sigma) AS BIGINT) AS sigma
             |  FROM sym e2 JOIN l${r - 1} p ON e2.b = p.node
             |  WHERE NOT EXISTS (SELECT 1 FROM s${r - 1} x
             |                    WHERE x.seed = p.seed AND x.node = e2.a)
             |  GROUP BY 1, 2
             |),
             |s$r AS MATERIALIZED (SELECT * FROM s${r - 1} UNION ALL SELECT * FROM l$r)""".stripMargin
        }.mkString(",\n")
        val rim = "d8 AS MATERIALIZED (SELECT seed, node, level, sigma, 0.0 AS delta FROM s8 WHERE level = 8)"
        val back = (7 to 0 by -1).map { l =>
          s"""c$l AS MATERIALIZED (
             |  SELECT lo.seed, lo.node,
             |         list_aggregate(list(CAST(lo.sigma AS DOUBLE) / CAST(hi.sigma AS DOUBLE)
             |           * (1.0 + hi.delta) ORDER BY hi.node), 'sum') AS delta
             |  FROM sym e2
             |  JOIN d${l + 1} hi ON e2.b = hi.node
             |  JOIN (SELECT * FROM s8 WHERE level = $l) lo
             |    ON lo.node = e2.a AND lo.seed = hi.seed
             |  GROUP BY 1, 2
             |),
             |d$l AS MATERIALIZED (
             |  SELECT l2.seed, l2.node, l2.level, l2.sigma, coalesce(c2.delta, 0.0) AS delta
             |  FROM (SELECT * FROM s8 WHERE level = $l) l2
             |  LEFT JOIN c$l c2 ON c2.seed = l2.seed AND c2.node = l2.node
             |)""".stripMargin
        }.mkString(",\n")
        val alld = (0 to 8).map(l => s"SELECT * FROM d$l").mkString(" UNION ALL ")
        s"""$head,
           |$fwd,
           |$rim,
           |$back,
           |alld AS MATERIALIZED ($alld)
           |SELECT node, count(*) AS n_seeds,
           |       floor(list_aggregate(list(delta ORDER BY seed), 'sum') * 1e4) / 1e4 AS betweenness
           |FROM alld WHERE node <> seed GROUP BY node ORDER BY node""".stripMargin
      },
      "graph_hits" -> {
        // 1e-9-quantized max normalization — mirrors hitsBody exactly
        def norm(src: String, key: String): String =
          s"""SELECT $key, CAST(floor(CAST(v AS DOUBLE)
             |  / CAST((SELECT max(v) FROM $src) AS DOUBLE) * 1000000000) AS BIGINT) AS nq
             |FROM $src""".stripMargin
        s"""WITH e AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
           |a1r AS (SELECT pk, count(*) * 1000000000 AS v FROM e GROUP BY 1),
           |a1 AS (${norm("a1r", "pk")}),
           |h1r AS (SELECT sk, CAST(sum(nq) AS BIGINT) AS v FROM e JOIN a1 USING (pk) GROUP BY 1),
           |h1 AS (${norm("h1r", "sk")}),
           |a2r AS (SELECT pk, CAST(sum(nq) AS BIGINT) AS v FROM e JOIN h1 USING (sk) GROUP BY 1),
           |a2 AS (${norm("a2r", "pk")}),
           |h2r AS (SELECT sk, CAST(sum(nq) AS BIGINT) AS v FROM e JOIN a2 USING (pk) GROUP BY 1),
           |h2 AS (${norm("h2r", "sk")})
           |SELECT kind, node, score FROM (
           |  SELECT 'hub' AS kind, concat('s', sk) AS node,
           |         CAST(nq AS DOUBLE) / 1000000000 AS score FROM h2
           |  UNION ALL
           |  SELECT 'authority', concat('p', pk), CAST(nq AS DOUBLE) / 1000000000 FROM a2
           |) ORDER BY kind, node""".stripMargin
      },
      "graph_katz" -> {
        // z_{t+1} = 8^(t+1) + A·z_t, exact BIGINTs; one IEEE readout
        val rounds = (1 to 3).map { t =>
          s"""z$t AS MATERIALIZED (
             |  SELECT p.part, CAST(${1L << (3 * t)} + COALESCE(s.nsum, 0) AS BIGINT) AS z
             |  FROM parts p LEFT JOIN (
             |    SELECT sym.src AS part, CAST(sum(z.z) AS BIGINT) AS nsum
             |    FROM sym JOIN z${t - 1} z ON z.part = sym.dst GROUP BY 1
             |  ) s ON s.part = p.part
             |)""".stripMargin
        }.mkString(",\n")
        s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
          |ok8 AS (SELECT ok FROM li GROUP BY ok HAVING count(*) <= 8),
          |e AS (
          |  SELECT a.pk AS u, b.pk AS v
          |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
          |  JOIN ok8 ON a.ok = ok8.ok
          |  GROUP BY 1, 2 HAVING count(*) >= 2
          |),
          |sym AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
          |parts AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
          |z0 AS (SELECT part, CAST(1 AS BIGINT) AS z FROM parts),
          |$rounds
          |SELECT part, z AS z3,
          |       floor(CAST(z AS DOUBLE) / 512.0 * 1e6) / 1e6 AS katz
          |FROM z3 ORDER BY part""".stripMargin
      },
      "graph_random_walk" -> {
        val steps = (1 to 4).map { i =>
          val prev = if (i == 1) "w0" else s"s${i - 1}"
          s"""s$i AS (SELECT walk, cur FROM (
             |  SELECT w.walk, e.dst AS cur,
             |         row_number() OVER (PARTITION BY w.walk
             |           ORDER BY md5(concat(w.walk, ':$i:', e.dst)), e.dst) AS rn
             |  FROM $prev w JOIN edges e ON w.cur = e.src) WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH e0 AS (SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem),
           |edges AS (SELECT concat('s', sk) AS src, concat('p', pk) AS dst FROM e0
           |          UNION ALL SELECT concat('p', pk), concat('s', sk) FROM e0),
           |w0 AS (SELECT DISTINCT src AS walk, src AS cur FROM edges WHERE src LIKE 's%'),
           |$steps
           |SELECT w0.walk, s1.cur AS hop1, s2.cur AS hop2, s3.cur AS hop3, s4.cur AS hop4
           |FROM w0 JOIN s1 USING (walk) JOIN s2 USING (walk)
           |        JOIN s3 USING (walk) JOIN s4 USING (walk)
           |ORDER BY walk""".stripMargin
      })
  }
}
