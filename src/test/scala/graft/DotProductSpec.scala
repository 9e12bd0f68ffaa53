package graft

import graft.functions.VectorMath
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native vec_dot is bit-identical to the higher-order-function form") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf()).select($"vec_id", $"embedding")
    val both = e.crossJoin(
        e.select($"vec_id".as("v2"), $"embedding".as("e2")).limit(20))
      .select(
        VectorMath.dot($"embedding", $"e2").as("hof"),
        GraftFunctions.vecDot($"embedding", $"e2").as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // bit-identical: same upcasts, same sequential accumulate order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("nulls and length mismatches yield NULL, matching the HOF form") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f))),
      (None, Some(Seq(1f))),
      (Some(Seq(2f, 3f)), Some(Seq(10f)))).toDF("a", "b")
    val out = df.select(GraftFunctions.vecDot($"a", $"b"),
      VectorMath.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 32.0 && out(0).getDouble(1) == 32.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    // dimension mismatch: both forms surface NULL, not a partial score
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("double and mixed float/double arrays dot exactly (trained-parameter path)") {
    GraftFunctions.register(spark)
    // snapped trained values — NOT float-representable; the double path
    // must not round-trip them through a float cast
    val c = Seq(0.1234, -2.7182, 3.0001, 0.0007)
    val f = Seq(1.5f, -0.25f, 2.0f, 8.0f)
    val expected = c.zip(f).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x * y.toDouble } // left fold, same order as the expression
    val df = Seq((f, c)).toDF("vf", "vd")
    val out = df.select(
      GraftFunctions.vecDot($"vd", $"vd").as("dd"),
      GraftFunctions.vecDot($"vf", $"vd").as("fd"),
      GraftFunctions.vecDot($"vd", $"vf").as("df")).collect()(0)
    val ddExpected = c.foldLeft(0.0)((acc, x) => acc + x * x)
    assert(java.lang.Double.doubleToLongBits(out.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(ddExpected))
    assert(java.lang.Double.doubleToLongBits(out.getDouble(1)) ==
      java.lang.Double.doubleToLongBits(expected))
    assert(java.lang.Double.doubleToLongBits(out.getDouble(2)) ==
      java.lang.Double.doubleToLongBits(expected))
  }

  test("double-array vec_dot stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // parquet-backed, not a local Seq: a LocalTableScan constant-folds the
    // projection away and there is no codegen stage left to inspect
    val e = Tables.embeddings(spark, sf())
      .select($"embedding".cast("array<double>").as("d"))
    val plan = e.select(GraftFunctions.vecDot($"d", $"d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(plan.toLowerCase.contains("vec_dot"), plan)
  }

  test("vec_dot runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf())
    val plan = e.select(GraftFunctions.vecDot($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(plan.contains("*("), plan)
    assert(plan.toLowerCase.contains("vec_dot"), plan)
  }

  test("microbench: native dot at least as fast as HOF dot (informational)") {
    GraftFunctions.register(spark)
    // 200k rows of dim-64 vectors, built once
    val vecs = spark.range(200000)
      .select($"id", transform(sequence(lit(1), lit(64)),
        i => (i * ($"id" % 97 + 1) % 1000).cast("float")).as("v"))
      .cache()
    vecs.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      vecs.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then measure
    time(VectorMath.dot($"v", $"v")); time(GraftFunctions.vecDot($"v", $"v"))
    val hof = time(VectorMath.dot($"v", $"v"))
    val native = time(GraftFunctions.vecDot($"v", $"v"))
    info(f"HOF dot: $hof%.3fs, native vec_dot: $native%.3fs (${hof / native}%.1fx)")
    assert(native <= hof * 1.5, f"native $native%.3fs slower than HOF $hof%.3fs")
    vecs.unpersist()
  }

  test("wrong arity raises a positioned AnalysisException, not a raw IAE") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0F)) AS d").collect()
    }
    assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", e.getMessage)
    assert(e.getMessage.contains("`vec_dot`") &&
      e.getMessage.contains("2 parameters"), e.getMessage)
  }
}
