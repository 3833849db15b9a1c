package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over the near-duplicate pair graph — PageRank (Page
  * et al. 1999) as the centrality complement to the component
  * resolution in [[graft.dedup.Dedup]]: components say WHICH docs
  * form a duplication family, rank says which docs sit at the CENTER
  * of duplication mass (template sources, boilerplate hubs) — a
  * standard corpus-forensics signal for "this page is the template
  * the other 400 were stamped from".
  *
  * Fixed-point integer power iteration (the repo-wide determinism
  * discipline): ranks live in millionths (r₀ = 1,000,000), each round
  * is
  *
  *   r'(v) = 150000 + (85 · Σ_{u∈N(v)} (r(u) div deg(u))) div 100
  *
  * — the damping-0.85 update with every operation an exact integer
  * (truncating div; operands nonnegative, so Spark's `div` and
  * DuckDB's `//` agree) and the contribution sum a long sum —
  * order-independent, partitioning-proof, SQL-replayable by unrolled
  * CTE rounds. A float PageRank would drift in the last ulps across
  * shuffle layouts; this one is bit-stable forever.
  *
  * Scale shape: each round is ONE edge-keyed broadcast/shuffle join
  * (edges ⋈ ranks on src) and ONE dst-keyed sum — the textbook
  * distributed PageRank round, map-side combinable, state O(nodes).
  * Rounds unroll into the plan (a handful of rounds is the use case;
  * convergence-to-epsilon belongs to an iterative driver like the
  * [[graft.dedup.Dedup]] component fold if ever needed). Nodes are
  * the pair graph's endpoints — every node has deg ≥ 1 and (the
  * graph being undirected) at least one in-edge, so no dangling-mass
  * term exists by construction. */
object LinkAnalysis {

  /** PageRank over an undirected (aCol, bCol) pair frame — (id,
    * rank_fixed) in millionths after `rounds` damped updates. */
  def pageRankFixed(pairs: DataFrame, rounds: Int = 3,
                    aCol: String = "id_a",
                    bCol: String = "id_b"): DataFrame = {
    require(rounds >= 1, s"pageRankFixed: rounds must be >= 1, got $rounds")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("src").as("id"), lit(1000000L).as("r"))
    (1 to rounds).foreach { _ =>
      val contrib = edges
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("r div deg").as("c"))
      ranks = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("id"),
          expr("150000 + (85 * s) div 100").as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_fixed"))
  }

  /** Synchronous label-propagation communities over an undirected
    * (aCol, bCol) pair frame — (id, label) after `rounds` updates
    * (Raghavan et al. 2007's near-linear community detection, in its
    * deterministic synchronous form). Communities are the graph
    * signal BETWEEN connected components and triangles: a component
    * tells you what's transitively linked at all, LPA splits a big
    * weakly-bridged component into its dense cores — the template
    * family vs the two content clusters it accidentally chains
    * together.
    *
    * Every node starts as its own label (its id); each round every
    * node adopts the most frequent label among its NEIGHBORS, ties
    * broken by smallest label — a total order, so the fixed round
    * count yields one deterministic answer (the classic random-order
    * asynchronous variant does not replay). The vote is
    * `min(struct(-cnt, label))` — a k=1 heap that map-side combines,
    * so the exchange carries one candidate per (node, label), never
    * the neighbor list.
    *
    * Cost per round: one join of the edge list against the |V|-row
    * label frame (both hash-partitioned on the id — the shuffle is
    * the label frame's, the edge list reuses its partitioning across
    * rounds under AQE) and two map-side-combined aggregates. Rounds
    * are a fixed small constant (3 here, like [[pageRankFixed]]) —
    * at corpus scale LPA converges in a handful of sweeps and the
    * fixed count is what the SQL replay pins.
    *
    * Each round's label frame goes through `pin`. Default IDENTITY:
    * at the declared fixed rounds (3) the per-round growth is one
    * join + one aggregate — bounded lineage, and an eager
    * localCheckpoint default measured a 2.3× slowdown on the q196
    * sibling for nothing. Raising `rounds` ≫ 3 on a cluster is when
    * the hook earns its keep: pass `_.localCheckpoint(true)`
    * ([[graft.ops.Eval.kendallBySegmentScalable]]'s default, whose
    * ~4×-per-round plan growth DOES need it) or a parquet-catalog
    * write-read for executor-loss tolerance; output is
    * pin-independent (LinkAnalysisSpec's catalog-pin test). */
  def labelPropagation(pairs: DataFrame, rounds: Int = 3,
                       aCol: String = "id_a", bCol: String = "id_b",
                       pin: DataFrame => DataFrame = identity): DataFrame = {
    require(rounds >= 1, s"labelPropagation: rounds must be >= 1, got $rounds")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    (1 to rounds).foreach { _ =>
      val votes = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labels = pin(votes.groupBy(col("src"))
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("src").as("id"), col("m.l").as("label")))
    }
    labels
  }

  /** Degree assortativity of an undirected (aCol, bCol) pair frame —
    * the Pearson correlation of endpoint degrees over all (mirrored)
    * edges (Newman 2002), in [[graft.ops.Robust.pearsonFixed]]'s
    * exact-integer fixed point. The one-number topology screen for a
    * dup graph: genuine near-dup families are assortative (dense
    * cores link dense cores, code > 0); a template/boilerplate HUB
    * pattern is disassortative (one high-degree page linking many
    * degree-1 pages, code < 0) — the same verdict [[triangles]]
    * gives per cluster, at whole-graph cost: one degree aggregate
    * and two id-keyed joins. A regular graph (zero degree variance)
    * reads code 0. */
  def assortativityFixed(pairs: DataFrame, aCol: String = "id_a",
                         bCol: String = "id_b",
                         scale: Int = 16384): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val endp = edges
      .join(deg.select(col("u"), col("deg").as("x")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("y")), Seq("v"))
      .select(lit("graph").as("g"), col("x"), col("y"))
    Robust.pearsonFixed(endp, "g", "x", "y", scale)
      .select(col("n").as("n_endpoints"), col("corr_code"))
  }

  /** Personalized PageRank over an undirected (aCol, bCol) pair frame
    * — [[pageRankFixed]] with the teleport mass restricted to a SEED
    * set (Jeh & Widom 2003): rank becomes "proximity to the trusted
    * docs through the dup/similarity graph", the seed-expansion
    * signal quality-bootstrapping pipelines use to grow a curated set
    * from a small vetted one (the web-graph quality idea behind
    * Harmonic/TrustRank applied to the corpus graph). Same integer
    * fixed point as q123 — seeds start at 10⁶ and re-teleport 15%
    * each round, non-seeds start at 0 and only receive diffused
    * mass — so `rank_fixed = 0` means "unreached from any seed in
    * `rounds` hops", itself a useful verdict.
    *
    * Cost: identical to [[pageRankFixed]] (per round: one edge⋈deg⋈
    * rank join chain + one map-side-combined sum) plus one broadcast
    * semi-join for the seed flag. `seeds` is an id frame; ids absent
    * from the graph contribute nothing (they have no edges). Each
    * round's rank frame goes through `pin` (default identity — see
    * [[labelPropagation]]; pass `_.localCheckpoint(true)` or a
    * catalog write-read at rounds ≫ 3, output is pin-independent). */
  def personalizedPageRank(pairs: DataFrame, seeds: DataFrame,
                           rounds: Int = 3, aCol: String = "id_a",
                           bCol: String = "id_b",
                           pin: DataFrame => DataFrame = identity): DataFrame = {
    require(rounds >= 1,
      s"personalizedPageRank: rounds must be >= 1, got $rounds")
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val seedFlag = broadcast(
      seeds.select(seeds.columns.head).toDF("sid").distinct())
    def teleport = when(col("sid").isNotNull, lit(1L)).otherwise(0L)
    var ranks = deg.select(col("src").as("id"))
      .join(seedFlag, col("id") === col("sid"), "left")
      .select(col("id"), (teleport * 1000000L).as("r"))
    (1 to rounds).foreach { _ =>
      val contrib = edges
        .join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("r div deg").as("c"))
      ranks = pin(contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .join(seedFlag, col("dst") === col("sid"), "left")
        .select(col("dst").as("id"),
          (teleport * 150000L + expr("(85 * s) div 100")).as("r")))
    }
    ranks.select(col("id"), col("r").as("rank_fixed"))
  }

  /** Fixed-round k-core peel of an undirected (aCol, bCol) pair frame
    * — (id, deg) for nodes surviving `rounds` rounds of "drop every
    * node with degree < k, then drop its edges" (Seidman 1983's
    * k-core, the standard dup-graph denoiser: a pendant edge is one
    * accidental 5-gram collision, a 2-core member is corroborated by
    * a CYCLE of near-dup relations). `deg` is the node's degree in
    * the surviving subgraph.
    *
    * Fixed `rounds` (not loop-to-fixpoint) for the same reason as
    * [[labelPropagation]]/[[pageRankFixed]]: the SQL replay pins an
    * exact round count, and peeling converges geometrically on real
    * dup graphs — a long pendant CHAIN peels one node per round, so
    * callers wanting the true core on adversarial topology raise
    * `rounds`; a surviving node with deg < k is the tell that
    * convergence wasn't reached. Cost per round: one map-side
    * degree aggregate + one semi-join of the edge list against the
    * surviving-node frame, both keyed on the id the edge list is
    * already partitioned by. Each round's surviving edge list goes
    * through `pin` (default identity — see [[labelPropagation]]; pass
    * `_.localCheckpoint(true)` or a catalog write-read at rounds ≫ 3,
    * output is pin-independent). */
  def kCore(pairs: DataFrame, k: Int, rounds: Int = 3,
            aCol: String = "id_a", bCol: String = "id_b",
            pin: DataFrame => DataFrame = identity): DataFrame = {
    require(k >= 1 && rounds >= 1,
      s"kCore: k and rounds must be >= 1, got k=$k rounds=$rounds")
    var e = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    (1 to rounds).foreach { _ =>
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      e = pin(e.join(keep, Seq("src"))
        .join(keep.select(col("src").as("dst")), Seq("dst")))
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Newman modularity of a node partition over an undirected (aCol,
    * bCol) pair frame — the quality audit for [[labelPropagation]]'s
    * communities (Newman & Girvan 2004): per community c,
    *
    *   Q_c = e_c/m − (d_c/2m)²,   Q = Σ_c Q_c
    *
    * with e_c the within-community edge count, d_c the degree sum, m
    * the total edge count. Emitted EXACTLY: each row carries
    * `q_num = 4m·e_c − d_c²`, so Q = Σ q_num / (4m²) with no division
    * or float anywhere — a community whose q_num is negative is a
    * worse-than-random grouping (collapse it before acting on it);
    * `labels` covering a near-clique reads q_num ≈ 4m·e_c. Exactness
    * envelope: 4m² must fit int64 → m ≤ 1.5·10⁹ edges per graph
    * (the [[graft.text.Vocab.collocations]] discipline — shard or
    * sample the graph past that).
    *
    * Cost: two label-keyed joins of the edge list (the same keying
    * [[labelPropagation]] already shuffles on), two map-side-combined
    * aggregates at community cardinality, and one broadcast scalar
    * attachment for m. `labels` must assign every edge endpoint
    * (inner joins drop unlabeled nodes loudly via the q_num sum
    * changing — pass the propagation output over the same graph). */
  def modularity(pairs: DataFrame, labels: DataFrame,
                 aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    val tagged = e
      .join(labels.select(col("id").as("a"), col("label").as("la")), Seq("a"))
      .join(labels.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
    val mDf = e.agg(count(lit(1)).as("m"))
    val ein = tagged.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
    val deg = e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    deg.join(labels, Seq("id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
      .join(ein, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"))
      .crossJoin(broadcast(mDf))
      .withColumn("q_num", expr("4 * m * e_in - deg_sum * deg_sum"))
      .drop("m")
  }

  /** Triangle enumeration over an undirected (aCol, bCol) pair frame —
    * one row per triangle as the id-sorted triple (id_a < id_b < id_c).
    * Triangles are the cohesion signal PageRank can't give: a dup
    * family whose pair graph is triangle-dense is a genuine mutual
    * cluster (every member near-dups every other — safe to collapse
    * to one survivor), while a triangle-free star of the same size is
    * a hub pattern (one template touching many unrelated pages —
    * collapsing it would merge distinct content).
    *
    * Algorithm: DEGREE ORIENTATION (the standard distributed-triangle
    * trick — Suri & Vassilvitskii WWW 2011's MapReduce form): orient
    * every edge from its lower-(degree, id) endpoint to the higher,
    * making the orientation acyclic with max out-degree O(√m); wedges
    * are the self-join of oriented edges on their source, and a wedge
    * (v, w) closes iff the oriented edge v→w exists. Every triangle
    * is found exactly once (at its lowest-degree corner), and the
    * wedge mass is Σ outdeg² ≤ O(m^1.5) REGARDLESS of skew — the
    * naive id-ordered join explodes quadratically on one hub node,
    * which at 100 TB is the difference between finishing and not.
    * Cost: one degree aggregate + two equi-joins, all integer. */
  def triangles(pairs: DataFrame, aCol: String = "id_a",
                bCol: String = "id_b"): DataFrame = {
    val und = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val edges = und.union(und.select(col("v"), col("u")))
    val deg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lower endpoint → higher; carry the dst
    // key so the wedge's closing edge is known without re-ranking
    val withDeg = und
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv")
          || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("d"),
          col("dv").as("dd"), col("v").as("did")))
        .otherwise(struct(col("v").as("s"), col("u").as("d"),
          col("du").as("dd"), col("u").as("did"))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"),
        col("e.dd").as("dd"), col("e.did").as("did"))
    // wedges at the lowest corner: two out-edges of one source,
    // ordered by the same (deg, id) key so the closing edge is v→w
    val wedges = oriented.as("e1")
      .join(oriented.select(col("s"), col("d").as("d2"),
          col("dd").as("dd2"), col("did").as("did2")).as("e2"),
        col("e1.s") === col("e2.s")
          && (col("e1.dd") < col("dd2")
            || (col("e1.dd") === col("dd2") && col("e1.did") < col("did2"))))
      .select(col("e1.s").as("corner"), col("e1.d").as("v"),
        col("d2").as("w"))
    wedges.join(oriented.select(col("s").as("v"), col("d").as("w")),
        Seq("v", "w"))
      .select(array_sort(array(col("corner"), col("v"), col("w"))).as("t"))
      .select(col("t")(0).as("id_a"), col("t")(1).as("id_b"),
        col("t")(2).as("id_c"))
  }
}
