package graft

import graft.queries.{Catalog, Curation}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("writeSplits lays out (split, lang) partitions and pruning hits them") {
    val docs = Tables.documents(spark, sf())
    val out = java.nio.file.Files.createTempDirectory("graft_splits").toString
    Curation.writeSplits(docs, out)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("split=train", "split=val", "split=test"))
    // the (split, lang) predicate must land in PartitionFilters (directory
    // pruning), not PushedFilters (row-group skipping)
    val scan = back.filter(col("split") === "train" && col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(split"), scan)
    // and the on-disk split agrees with the oracle-checked q64 assignment
    val q64 = Catalog.queries("q64_hash_split")(spark, sf())
    val disagree = back.select(col("doc_id"), col("split").as("s_disk"))
      .join(q64, "doc_id").filter(col("split") =!= col("s_disk")).count()
    assert(disagree == 0)
  }

  test("imperative extension installs are idempotent") {
    import graft.plans.{AsOf, AsOfJoinStrategy, GraftFunctions, RewriteDotProduct}
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    AsOf.install(spark); AsOf.install(spark)
    assert(exp.extraStrategies.count(_ == AsOfJoinStrategy) == 1)
    GraftFunctions.installPlanRewrites(spark)
    GraftFunctions.installPlanRewrites(spark)
    assert(exp.extraOptimizations.count(_ == RewriteDotProduct) == 1)
    // leave the shared session as we found it (DotProductSpec compares the
    // HOF and native forms, which must stay distinct plans there)
    GraftFunctions.removePlanRewrites(spark)
    assert(!exp.extraOptimizations.contains(RewriteDotProduct))
  }
}
