package graft

import graft.queries.Catalog
import org.apache.spark.sql.functions._

/** q131 vs q125: the leakage audit and its fix. Hashing DOCUMENTS into
  * splits lets near-dup pairs straddle the train/eval boundary (q125
  * finds them); hashing CLUSTERS co-locates every pair by construction
  * (q131), and the same audit on the fixed splits must return nothing.
  */
class SplitIntegritySpec extends SparkSpec {

  test("doc-hash splits leak; cluster-hash splits don't — same pair set") {
    val leaks = Catalog.queries("q125_split_leakage")(spark, sf("sf0.01"))
    assert(leaks.count() > 0,
      "fixture degenerate: no cross-split near-dup pairs to fix")

    val fixed = Catalog.queries("q131_leakage_free_splits")(spark, sf("sf0.01"))
    // replay the q125 audit over the FIXED assignment: join each leaking
    // pair's two docs to their new splits — none may differ
    val sp = fixed.select(col("doc_id"), col("split"))
    val still = leaks
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("fixed_a")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("fixed_b")), "doc_b")
      .filter(col("fixed_a") =!= col("fixed_b"))
    assert(still.count() == 0,
      "cluster-keyed splits must co-locate every near-dup pair")
    // and the split mix stays a real 3-way partition of all 120 docs
    val sizes = fixed.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 120)
    assert(sizes.getOrElse("train", 0L) > sizes.getOrElse("val", 0L))
  }
}
