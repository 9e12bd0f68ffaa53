package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster formation: connected components over a near-dup pair
  * list — the final stage of a corpus dedup pipeline (pairs → clusters →
  * one canonical representative per cluster).
  *
  * Algorithm: alternating min-label hook + two pointer-doubling compress
  * steps per round (the MapReduce hash-min family). Each round:
  *   - hook:     label(v) := min(label(v), min over neighbors' labels)
  *   - compress: label(v) := label(label(v)), twice
  * Hooking alone needs O(diameter) rounds on path-shaped components; the
  * doubling compresses label chains so `rounds` R converges far beyond
  * diameter R (property-tested on a 64-node path at the default R = 6).
  *
  * Scale posture: every step is a key-equality shuffle on node id. Each
  * round is materialized with an EAGER localCheckpoint — iterative graph
  * algorithms must truncate lineage every round, because each round
  * references its predecessor several times and the composed LOGICAL plan
  * (not just the physical recompute) grows exponentially with the round
  * count; plain persist() does not help, since the analyzed tree keeps the
  * full lineage. This is the same checkpoint-per-iteration discipline
  * GraphX uses. Early exit when a round changes no labels.
  *
  * Storage lifecycle: each round's checkpoint blocks are released by
  * Spark's ContextCleaner as soon as the round's frame becomes
  * unreachable; the returned frame's blocks live until the caller drops
  * the reference (or the session ends). Nothing needs manual unpersist.
  *
  * Components are identified by their MINIMUM member id — deterministic, so
  * the result is oracle-checkable against a DuckDB recursive CTE (q55).
  */
object DedupClusters {

  /** (id, label) for every node appearing in `pairs`; label = component id
    * (the component's minimum node id once converged). `pairs` must have
    * two columns (id_a, id_b); nodes not in any pair are absent (callers
    * left-join and coalesce to give singletons their own id).
    *
    * Size-adaptive: the pair list after LSH candidate generation is orders
    * of magnitude smaller than the corpus (only near-duplicates appear),
    * so when it fits comfortably on the driver (`driverMaxPairs`) the
    * components are solved with a single union-find pass — exact and
    * converged by construction, no iteration jobs at all. Larger pair sets
    * fall through to the distributed hook/compress loop, whose per-round
    * cost only pays off at that scale.
    *
    * `rounds` is a SAFETY CEILING for the distributed loop, not the
    * expected iteration count: the loop exits as soon as a round changes no
    * labels, and with hook + double compress per round the default ceiling
    * covers diameters far beyond any real duplicate cluster. If the ceiling
    * is ever hit while labels are still moving the result would be silently
    * under-merged, so that case throws instead.
    */
  def connectedComponents(
      pairs: DataFrame,
      rounds: Int = 16,
      driverMaxPairs: Long = 5000000L): DataFrame = {
    val spark = pairs.sparkSession
    // ONE evaluation decides the path AND feeds it (round 17): the old
    // size probe ran the whole upstream pair pipeline (LSH candidates +
    // verify, for the dedup callers) once for the count and AGAIN for the
    // collect — limit(max+1).collect() answers both at the same cost as
    // the probe alone. Oversized pair sets pay one truncated collect
    // before falling through to the distributed loop, a fraction of one
    // of its rounds.
    val edgeList0: Array[org.apache.spark.sql.Row] =
      if (driverMaxPairs > 0)
        pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
          .limit((driverMaxPairs + 1).toInt).collect()
      else null
    if (edgeList0 != null && edgeList0.length <= driverMaxPairs) {
      import spark.implicits._
      val edgeList = edgeList0.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find with path compression: a recursive form would
      // overflow the stack on a multi-million-edge chain
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
        var cur = x
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return parent.keys.toSeq.map(k => (k, find(k))).toDF("id", "label")
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var r = 0
    var converged = labels.isEmpty
    while (r < rounds && !converged) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nmin"))
      val hooked = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val next = compress(compress(hooked)).localCheckpoint(true) // eager
      // round 1 always changes labels when edges exist — skip its probe job
      val changed =
        if (r == 0) 1L
        else next.join(labels.withColumnRenamed("label", "prev"), "id")
          .filter(col("label") =!= col("prev")).limit(1).count()
      labels = next
      converged = changed == 0L
      r += 1
    }
    require(converged,
      s"connected components did not converge within $rounds rounds — " +
        "raise `rounds`; returning partial labels would silently under-merge clusters")
    labels
  }

  /** label(v) := label(label(v)) — every label value is itself a node id,
    * so the lookup join is total.
    */
  private def compress(labels: DataFrame): DataFrame =
    labels.as("a")
      .join(labels.select(col("id").as("lid"), col("label").as("llabel")).as("b"),
        col("a.label") === col("b.lid"))
      .select(col("a.id").as("id"), col("b.llabel").as("label"))

  /** Assign every row of `df` its duplicate-cluster id and size: rows whose
    * `idCol` appears in `pairs` get their component's min id; singletons
    * keep their own id with size 1. The canonical "keep one per cluster"
    * step is then `filter(col(idCol) === col("cluster_id"))`.
    */
  def clusterAssignments(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      rounds: Int = 16,
      driverMaxPairs: Long = 5000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs, rounds, driverMaxPairs)
    df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
  }
}
