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
}
