package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Page, Brin, Motwani & Winograd 1999) on a
  * directed edge list — graph centrality as a corpus-curation signal
  * (page importance is the classic web-scale quality prior for training
  * data, and on the near-dup pair graph centrality picks cluster
  * representatives; [[DedupClusters]] covers reachability, this covers
  * importance).
  *
  * Semantics: `rank_0 = 1/N`; each iteration routes `rank/outdeg` along
  * every edge, redistributes DANGLING mass (nodes with no out-edges)
  * uniformly, and damps: `rank' = (1-d)/N + d·(Σ_in contrib + m_d/N)`.
  * Total mass is exactly 1 after every iteration — the spec asserts it —
  * so fixed-iteration results are well-defined, engine-independent
  * numbers rather than "whatever leaked".
  *
  * Scale posture: one iteration = an equi-join of the |V|-row rank frame
  * with the |E|-row edge list on src (AQE picks broadcast when ranks are
  * small, SMJ/hash otherwise), one hash aggregate by dst, one 1-row
  * dangling-mass aggregate broadcast back, and a left join to re-attach
  * isolated-in-degree nodes — all linear in |E| per iteration, the same
  * shape GraphX/Pregel lowers to. The logical plan is truncated each
  * round with `localCheckpoint` (an UN-truncated iterative plan grows
  * exponentially and hangs Catalyst — DESIGN.md; the verify guide's
  * iterative-algorithm rule).
  */
object PageRank {

  /** Ranks after `iters` iterations: (id string, rank double, Σ rank = 1).
    *
    * @param undirected treat each edge as bidirectional (adds the
    *                   reversed edge list before degree counting)
    */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      damping: Double = 0.85,
      undirected: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1, 100], got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1), got $damping")
    val fwd = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val e = (if (undirected) fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
             else fwd).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty edge list")
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    // out-share per edge source, fixed across iterations: rank joins on a
    // frame already keyed by id, so each round is ONE join + one aggregate
    val outDeg = nodes.join(deg, "id", "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outDeg, "id")
      // dangling nodes hold mass but route it nowhere — redistribute it
      // uniformly (the standard stochastic-matrix completion), else mass
      // leaks and fixed-iteration values depend on leak accounting.
      // On an UNDIRECTED graph every node has an out-edge by construction
      // (nodes = endpoints of the symmetrized edge list), so m_d ≡ 0
      // exactly — skip the aggregate. Honest measurement (same warm shell,
      // both paths, sf0.1, 3 iterations): skip 3.8-4.0 s vs general
      // 3.8-4.1 s — the empty per-iteration aggregate job costs ~nothing
      // in wall time here; the skip's value is one fewer job per iteration
      // (scheduler pressure at high iteration counts / many concurrent
      // queries), and results are bit-identical (the removed term added
      // literal 0.0)
      val contrib = e
        .join(withDeg.filter(col("outdeg") > 0)
          .select(col("id").as("src"), (col("rank") / col("outdeg")).as("share")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("contrib"))
      val base = nodes.join(contrib, "id", "left")
      val withDangling =
        if (undirected)
          base.select(col("id"),
            (lit((1.0 - damping) / n) + lit(damping) *
              coalesce(col("contrib"), lit(0.0))).as("rank"))
        else {
          val dangling = withDeg.filter(col("outdeg") === 0)
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("m_d"))
          base.crossJoin(broadcast(dangling))
            .select(col("id"),
              (lit((1.0 - damping) / n) + lit(damping) *
                (coalesce(col("contrib"), lit(0.0)) + col("m_d") / n)).as("rank"))
        }
      // LAZY checkpoint (round-9 measurement): localCheckpoint(false)
      // wraps the same LogicalRDD — the LOGICAL plan is truncated either
      // way, which is all the iterative-plan rule needs — but defers
      // materialization to the final action, collapsing one blocking
      // driver job PER ITERATION into one end-to-end job DAG. ranks is
      // referenced at most twice per iteration (contrib + dangling), and
      // the checkpointed RDD materializes once on first use and is
      // reused, so no work duplicates. Measured at sf0.1 (3 undirected
      // iterations, warm): 4.3-4.6 s eager -> see BASELINE round-9 row.
      ranks = withDangling.localCheckpoint(false)
    }
    ranks
  }
}
