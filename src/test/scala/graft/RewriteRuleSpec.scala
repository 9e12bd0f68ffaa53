package graft

import graft.functions.VectorMath
import graft.functions.expr.DotProductF
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** The RewriteDotProduct optimizer rule: the declarative HOF dot-product
  * collapses to the native vec_dot expression, with identical results.
  * Installs the rule for this suite only and removes it afterAll — the
  * session is shared across suites and DotProductSpec compares the two
  * forms, which must stay distinct there.
  *
  * Test data is parquet-/range-backed: literal Seq data becomes a
  * LocalRelation that ConvertToLocalRelation fully evaluates before
  * user-provided rules run, so there would be nothing left to rewrite.
  */
class RewriteRuleSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.installPlanRewrites(spark)
  }

  override def afterAll(): Unit = {
    GraftFunctions.removePlanRewrites(spark)
    super.afterAll()
  }

  private def hasNativeDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[DotProductF])))

  test("HOF dot-product pattern is rewritten to native vec_dot") {
    val df = Tables.embeddings(spark, sf())
      .select(VectorMath.dot($"embedding", $"embedding").as("d"))
    assert(hasNativeDot(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().forall(!_.isNullAt(0)))
  }

  test("rewritten plan matches the unrewritten result bit-for-bit") {
    val e = Tables.embeddings(spark, sf()).limit(50)
      .select($"vec_id", $"embedding")
    def scores = e.crossJoin(
        e.select($"vec_id".as("v2"), $"embedding".as("e2")).limit(10))
      .select($"vec_id", $"v2", VectorMath.dot($"embedding", $"e2").as("d"))
      .orderBy($"vec_id", $"v2")
    val rewritten = scores.collect()
    assert(hasNativeDot(scores))
    GraftFunctions.removePlanRewrites(spark)
    val plain = scores.collect()
    assert(!hasNativeDot(scores))
    GraftFunctions.installPlanRewrites(spark)
    assert(rewritten.length == plain.length && rewritten.nonEmpty)
    rewritten.zip(plain).foreach { case (r, p) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(p.getDouble(2)))
    }
  }

  test("rewrite preserves NULL semantics (null element, length mismatch)") {
    // range-backed so the projection survives to the optimizer:
    // id=0 -> equal-length arrays, id=1 -> null element, id=2 -> length mismatch
    val df = spark.range(3)
      .select($"id",
        when($"id" === 1, array(lit(1f), lit(null).cast("float")))
          .otherwise(array(lit(1f), lit(2f))).as("a"),
        when($"id" === 2, array(lit(10f)))
          .otherwise(array(lit(3f), lit(4f))).as("b"))
      .select($"id", VectorMath.dot($"a", $"b").as("d"))
      .orderBy($"id")
    assert(hasNativeDot(df), df.queryExecution.optimizedPlan.toString)
    val out = df.collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(1))
  }

  test("non-dot HOF aggregates are left alone") {
    // same shape but integer sum-of-products over array<int> — must NOT match
    val df = spark.range(2)
      .select(array($"id".cast("int"), lit(2)).as("a"), array(lit(3), lit(4)).as("b"))
      .select(aggregate(
        zip_with($"a", $"b", (x, y) => x * y), lit(0), (acc, v) => acc + v).as("d"))
    assert(!hasNativeDot(df))
    assert(df.collect().map(_.getInt(0)).sorted.sameElements(Array(8, 11)))
  }
}
