package graft

import org.apache.spark.sql.SparkSession

/** The cluster-deployment path: `spark.sql.extensions=graft.plans.
  * GraftExtensions` must register everything — scalar functions, the
  * asof_join table function, the dot-product optimizer rule, and the as-of
  * planner strategy — on a session that NEVER calls the imperative
  * `GraftFunctions.register`/`AsOf.install`. A fresh SparkSession is built
  * over the shared SparkContext (active/default cleared first, restored
  * after, so the other specs' session is untouched).
  */
class ExtensionsSpec extends SparkSpec {

  test("config-driven GraftExtensions wires functions, TVF, rule, strategy") {
    val base = spark // force shared session init before we swap actives
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a STATIC conf — with the suite's
    // SparkContext already running it cannot take effect, so apply the
    // same class through the builder hook (identical code path inside
    // the session: applyExtensions invokes GraftExtensions.apply)
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions().apply(_))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne base)
      // scalar function via SQL, no imperative registration
      val d = s2.sql(
        "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
        .head.getDouble(0)
      assert(d == 11.0)
      // native expressions registered alongside (simhash32 takes tokens)
      val expectedSim = graft.functions.expr.SimHash32F(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Seq("ab", "cd"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .eval(null).asInstanceOf[Long]
      assert(s2.sql("SELECT simhash32(array('ab', 'cd')) AS h")
        .head.getLong(0) == expectedSim)
      // table function + planner strategy: end-to-end as-of join in SQL
      import s2.implicits._
      Seq((1L, 10L, "a"), (1L, 5L, "b")).toDF("k", "t", "ltag")
        .createOrReplaceTempView("ext_l")
      Seq((1L, 6L, "r1"), (1L, 9L, "r2")).toDF("k2", "rt", "rtag")
        .createOrReplaceTempView("ext_r")
      val out = s2.sql(
        "SELECT ltag, rtag FROM asof_join('ext_l', 'ext_r', 'k', 'k2', 't', 'rt')")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == Set(("a", "r2")))
      // the injected as-of rules fire too: a left-side filter sinks below
      // the join, where ConvertToLocalRelation folds it INTO the Seq-backed
      // relation (2 rows -> 1) — the pushdown provably ran on this
      // extensions-only session
      val filtered = s2.sql(
        "SELECT ltag FROM asof_join('ext_l', 'ext_r', 'k', 'k2', 't', 'rt') " +
          "WHERE ltag = 'a'")
      val asof = filtered.queryExecution.optimizedPlan
        .collect { case j: graft.plans.AsOfJoinPlan => j }.head
      val leftRows = asof.left.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l.data.size
      }.sum
      assert(leftRows == 1, filtered.queryExecution.optimizedPlan.toString)
      // optimizer rule: HOF dot-product rewritten to the native expression
      // (range-backed, non-foldable arrays — Seq-backed frames collapse to
      // LocalRelation before injected rules run)
      val e = s2.range(2)
        .select($"id",
          org.apache.spark.sql.functions.array(
            $"id".cast("float"), org.apache.spark.sql.functions.lit(2f)).as("a"),
          org.apache.spark.sql.functions.array(
            org.apache.spark.sql.functions.lit(3f), $"id".cast("float")).as("b"))
        .select(graft.functions.VectorMath.dot($"a", $"b").as("d"))
      val plan = e.queryExecution.optimizedPlan
      assert(plan.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.expr.DotProductF]))),
        plan.toString)
    } finally {
      s2.catalog.dropTempView("ext_l")
      s2.catalog.dropTempView("ext_r")
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
