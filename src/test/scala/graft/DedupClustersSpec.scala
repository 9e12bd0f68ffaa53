package graft

import graft.operators.DedupClusters
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find oracle: min id per component. */
  private def ufOracle(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** driverMaxPairs = 0 forces the DISTRIBUTED hook/compress path; the
    * default exercises the driver union-find path.
    */
  private def ccOf(
      pairs: Seq[(Long, Long)],
      rounds: Int = 6,
      driverMaxPairs: Long = 5000000L): Map[Long, Long] =
    DedupClusters.connectedComponents(pairs.toDF("id_a", "id_b"), rounds, driverMaxPairs)
      .as[(Long, Long)].collect().toMap

  test("cliques, chains, and singleton separation match union-find (both paths)") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L), (11L, 12L),       // chain {10,11,12}
      (20L, 21L))                   // pair {20,21}
    assert(ccOf(pairs) == ufOracle(pairs))
    assert(ccOf(pairs, driverMaxPairs = 0L) == ufOracle(pairs)) // distributed
    val cc = ccOf(pairs)
    assert(cc(3L) == 1L && cc(12L) == 10L && cc(21L) == 20L)
  }

  test("64-node path converges on the distributed path") {
    // worst-case diameter shape for min-label propagation; the doubling
    // compress must carry the min across 63 hops within the round ceiling
    val pairs = (1L until 64L).map(i => (i, i + 1))
    val cc = ccOf(pairs, rounds = 16, driverMaxPairs = 0L)
    assert(cc == ufOracle(pairs))
    assert(cc.values.toSet == Set(1L))
  }

  test("random graph matches union-find (both paths)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    assert(ccOf(pairs) == ufOracle(pairs))
    assert(ccOf(pairs, rounds = 16, driverMaxPairs = 0L) == ufOracle(pairs))
  }

  test("empty pair set yields empty components") {
    assert(ccOf(Seq.empty).isEmpty)
  }

  test("clusterAssignments gives singletons their own id and size 1") {
    val docs = (1L to 8L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DedupClusters.clusterAssignments(docs, "doc_id", pairs)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 1L),
      (5L, 5L, 2L), (6L, 5L, 2L), (7L, 7L, 1L), (8L, 8L, 1L)))
  }

  test("keep-one-per-cluster representative filter") {
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = DedupClusters.clusterAssignments(docs, "doc_id", pairs)
      .filter(col("doc_id") === col("cluster_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 6L))
  }

  test("q56's banded chain equals q55's all-pairs chain on the same corpus") {
    // the full-corpus scale path (banded SimHash pairs -> CC -> cluster
    // assignment, q56's chain) must produce the SAME clusters as the
    // oracle-checked all-pairs chain (q55's shape) when run over one
    // corpus. This is the equality that pins q56's correctness: a driver
    // oracle restricted to a doc_id bound would be UNSOUND instead, because
    // full-corpus clusters can cross the bound and change ids/sizes.
    // maxBucket stays 0 (uncapped) here: the cap is a DELIBERATE recall
    // sacrifice for degenerate mega-buckets — on this corpus's giant
    // artifact cluster it drops real pairs, so capped != all-pairs by
    // design (the cap's own behavior is covered in DedupSpec).
    import graft.operators.SimHash
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 150)
    val banded = SimHash.candidatePairs(docs, "doc_id", "text",
        bands = 4, maxHamming = 2, maxBucket = 0)
      .select("id_a", "id_b")
    val sh = docs.select(col("doc_id"), SimHash.simhashOfText(col("text")).as("h"))
    val allPairs = sh.select(col("doc_id").as("id_a"), col("h").as("h_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("h").as("h_b")),
        col("id_a") < col("id_b"))
      .filter(SimHash.hamming(col("h_a"), col("h_b")) <= 2)
      .select("id_a", "id_b")
    def chain(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      DedupClusters.clusterAssignments(docs, "doc_id", pairs)
        .as[(Long, Long, Long)].collect().toSet
    val (b, a) = (chain(banded), chain(allPairs))
    assert(b == a, s"banded chain diverges: only-banded=${b -- a} only-allpairs=${a -- b}")
    assert(a.exists(_._3 > 1), "fixture has no multi-member cluster — test is vacuous")
  }

  test("declared q56 (Scratch artifact path) equals the inline chain, value for value") {
    // q56 lands its pair+CC result in a detect-once Scratch parquet (the
    // q113/q167 shape); the artifact must be value-identical to running
    // the chain inline — integer-only output, so exact set equality.
    import graft.operators.SimHash
    val d = sf()
    val declared = graft.queries.Catalog.queries("q56_dedup_clusters_full")(spark, d)
      .as[(Long, Long, Long)].collect().toSet
    val docs = Tables.documents(spark, d)
    val pairs = SimHash.candidatePairs(docs, "doc_id", "text",
        bands = 4, maxHamming = 2, maxBucket = 50)
      .select("id_a", "id_b")
    val inline = DedupClusters.clusterAssignments(docs, "doc_id", pairs)
      .filter(col("cluster_size") > 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(declared == inline,
      s"artifact diverges: only-artifact=${declared -- inline} only-inline=${inline -- declared}")
    assert(inline.nonEmpty, "corpus has no multi-member cluster — test is vacuous")
  }

  test("plan stays bounded: the result is a checkpointed leaf, not a composed tree") {
    // the operator must truncate lineage each round — a composed plan over
    // R rounds is exponential in R and hangs Catalyst long before R = 6
    val pairs = (1L until 32L).map(i => (i, i + 1))
    val cc = DedupClusters.connectedComponents(pairs.toDF("id_a", "id_b"),
      driverMaxPairs = 0L)
    assert(cc.queryExecution.analyzed.collectLeaves().size == 1)
    assert(cc.queryExecution.analyzed.toString.linesIterator.size < 10)
  }
}
