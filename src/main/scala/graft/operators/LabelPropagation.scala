package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan, Albert & Kumara 2007) —
  * community detection as a declarative iteration, the clustering
  * counterpart to [[PageRank]] on the graph side of the curation stack
  * (communities over co-purchase / co-click / near-dup graphs are a
  * standard grouping signal where connected components are too coarse:
  * CC merges everything touching, LPA splits by local majority).
  *
  * Semantics (deterministic, oracle-replayable — q140): labels start as
  * each node's own id; every round, each node adopts the MAJORITY label
  * among its neighbors' previous-round labels, ties broken by the
  * SMALLEST label string; nodes with no in-neighbors keep their label.
  * Synchronous (all nodes update from the same snapshot — the only
  * engine-independent schedule; asynchronous LPA's result depends on
  * visit order, which no cross-engine contract can pin).
  *
  * Shape per iteration: one |E|-row equi-join on dst (labels attach to
  * edge targets), one hash aggregate to (node, label) counts — at most
  * deg(v) rows per node — and the per-node argmax as a rank-1 window
  * (partitionBy node, orderBy count desc/label asc). The window is
  * scale-safe: Spark 4 plans WindowGroupLimit PARTIAL below the
  * exchange (the round-9 finding, BASELINE part 3), so each map task
  * ships at most one candidate row per (node, partition), not the full
  * count table. `localCheckpoint` truncates the iterative plan per the
  * repo rule. Total: iters × (|E| join + |E| aggregate) — the same
  * 100 TB family as PageRank.
  */
object LabelPropagation {

  /** @param undirected mirror every edge so propagation flows both ways
    * @return (id, lbl) — each node's community label after `iters`
    *   synchronous rounds.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      undirected: Boolean = true): DataFrame = {
    require(iters >= 0 && iters <= 64, s"iters in [0, 64], got $iters")
    val base = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val e = (if (undirected)
        base.union(base.select(col("dst").as("src"), col("src").as("dst")))
      else base)
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    // per-round checkpoints are LAZY: the logical plan is truncated either
    // way, and deferring materialization removes one blocking driver job
    // per round (the round-9 PageRank finding — same rule in runLong)
    var lab = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(false)
    var t = 0
    while (t < iters) {
      // a label flows ALONG an edge: the src's previous label reaches the
      // dst, so labels attach on src and the majority is taken per dst
      val cnts = e.join(lab.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("c").desc, col("lbl"))
      val winners = cnts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("id"), col("lbl").as("new_lbl"))
      lab = lab.join(winners, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      t += 1
    }
    lab
  }

  /** Long-id labels occupy the low 24 bits of the packed argmax. */
  val LabelBits = 24
  val MaxLongLabel: Long = 1L << LabelBits

  /** The numeric-id fast path: same synchronous semantics as [[run]]
    * (ties to the SMALLEST label — numeric order here, string order
    * there; identical whenever ids are single-digit or equal-width), but
    * the per-node argmax is a packed-long `max()` — count in the high
    * bits, bit-inverted label in the low [[LabelBits]] — so both the
    * count and the argmax plan as HashAggregates: no per-round sort, no
    * window exchange, partial aggregation collapses map-side (the
    * SemDeDup packed-argmin pattern, on the max side). Checkpoints are
    * LAZY (`localCheckpoint(false)`): the logical plan is truncated
    * either way, and deferring materialization removes one blocking
    * driver job per round (the round-9 PageRank finding). Measured
    * (BASELINE round-9 part 3): 4 rounds on the 1M-node/10M-edge
    * power-law graph — string+window path 313 s, this path is the
    * production form.
    *
    * Node ids must be in [0, 2^24); the guard raises in-plan. Counts are
    * bounded by in-degree < 2^39 (the pack would need ids past 550 B
    * edges per node to overflow — raise_error guards that too).
    */
  def runLong(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      undirected: Boolean = true): DataFrame = {
    require(iters >= 0 && iters <= 64, s"iters in [0, 64], got $iters")
    val base = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = (if (undirected)
        base.union(base.select(col("dst").as("src"), col("src").as("dst")))
      else base)
      .distinct().localCheckpoint(true)
    val guard = (c: org.apache.spark.sql.Column) =>
      when(c >= 0 && c < MaxLongLabel, c).otherwise(raise_error(concat(
        lit(s"lpa: node id out of [0, $MaxLongLabel): "), c)))
    // guard BOTH branches: with undirected=false a dst-only node never
    // appears as src, so an unguarded dst branch would let an
    // out-of-range id through in violation of the documented contract
    val nodes = e.select(guard(col("src")).as("id"))
      .union(e.select(guard(col("dst")).as("id")))
      .distinct().localCheckpoint(true)
    var lab = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(false)
    val inv = lit(MaxLongLabel - 1L)
    var t = 0
    while (t < iters) {
      val cnts = e.join(lab.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
      val cGuard = when(col("c") < (1L << 39), col("c"))
        .otherwise(raise_error(lit("lpa: in-degree too large to pack")))
      val packed = shiftleft(cGuard, LabelBits) + (inv - col("lbl"))
      val winners = cnts
        .groupBy(col("dst")).agg(max(packed).as("p"))
        .select(col("dst").as("id"),
          (inv - pmod(col("p"), lit(MaxLongLabel))).as("new_lbl"))
      lab = lab.join(winners, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      t += 1
    }
    lab
  }
}
