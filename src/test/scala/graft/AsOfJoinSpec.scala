package graft

import graft.plans.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native as-of join operator (custom LogicalPlan + Strategy +
  * sort-merge SparkPlan). Semantics oracle: the composed range-join +
  * max_by form (q09), plus hand-checked synthetic cases for the edges the
  * testdata cannot produce (unmatched keys, ties, nulls, outer).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lDf: DataFrame = Seq(
    (Option(1L), 10L, "l-a"),
    (Option(1L), 5L, "l-b"),
    (Option(2L), 7L, "l-c"),
    (Option.empty[Long], 9L, "l-null"))
    .toDF("k", "t", "ltag")

  private def rDf: DataFrame = Seq(
    (Option(1L), 6L, "r-old"),
    (Option(1L), 10L, "r-new"),
    (Option(3L), 1L, "r-other"),
    (Option.empty[Long], 1L, "r-null"))
    .toDF("k2", "rt", "rtag")

  test("native as-of == composed range-join + max_by on real tables") {
    val dir = sf("sf0.01")
    val composed = queries.Catalog.queries("q09_asof_latest_order")(spark, dir)
    val native = queries.Catalog.queries("q71_asof_native")(spark, dir)
    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("inner: latest right row at or before each left time, per key") {
    val out = AsOf.join(lDf, rDf, Seq("k"), Seq("k2"), "t", "rt")
      .select($"ltag", $"rtag").as[(String, String)].collect().toSet
    // (1,10) matches r-new (rt=10<=10); (1,5) has no right row at/before 5;
    // (2,7) has no key-2 right rows; null keys never match
    assert(out == Set(("l-a", "r-new")))
  }

  test("left outer keeps unmatched and null-key left rows with null right") {
    val out = AsOf.join(lDf, rDf, Seq("k"), Seq("k2"), "t", "rt",
        joinType = "left")
      .select($"ltag", $"rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(
      ("l-a", Some("r-new")), ("l-b", None), ("l-c", None), ("l-null", None)))
  }

  test("tie-break picks the greatest tie-break column among equal times") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 3L, "three"), (1L, 10L, 9L, "nine"), (1L, 10L, 5L, "five"))
      .toDF("k2", "rt", "seq", "rtag")
    val out = AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt",
        tieBreak = Seq("seq"))
      .select($"rtag").as[String].collect().toSeq
    assert(out == Seq("nine"))
  }

  test("forward direction matches the earliest right row at/after the left time") {
    val out = AsOf.join(lDf, rDf, Seq("k"), Seq("k2"), "t", "rt",
        direction = "forward", joinType = "left")
      .select($"ltag", $"rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // (1,10) -> rt=10; (1,5) -> rt=6 (earliest at/after 5); (2,7) -> none
    assert(out == Set(
      ("l-a", Some("r-new")), ("l-b", Some("r-old")), ("l-c", None), ("l-null", None)))
  }

  test("tolerance bounds the time gap in both directions") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 6L, "past"), (1L, 14L, "future")).toDF("k2", "rt", "rtag")
    def run(dir: String, tol: Option[Long]) =
      AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt",
          joinType = "left", direction = dir, tolerance = tol)
        .select($"rtag").collect().map(r => Option(r.getString(0))).toSeq
    assert(run("backward", Some(3L)) == Seq(None))        // gap 4 > 3
    assert(run("backward", Some(4L)) == Seq(Some("past")))
    assert(run("forward", Some(3L)) == Seq(None))         // gap 4 > 3
    assert(run("forward", Some(4L)) == Seq(Some("future")))
  }

  private def withThreshold[A](v: String)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def realTableJoin = {
    val dir = sf("sf0.01")
    val e = Tables.events(spark, dir).select($"event_id", $"user_id", $"ts_us")
    val o = Tables.orders(spark, dir).select($"o_custkey", $"o_orderkey",
      unix_micros($"o_orderdate".cast("timestamp")).as("od_us"))
    AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts_us", "od_us",
      tieBreak = Seq("o_orderkey"))
  }

  test("plan shape, merge path: one exchange + one sort per side, no expansion") {
    withThreshold("-1") {
      val df = realTableJoin
      df.collect()
      // AQE's toString prints final AND initial plans — count the final only
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("AsOfJoin"), plan)
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
      // the merge's output ordering comes for free from the child sorts
      assert("Sort \\[".r.findAllIn(plan).size == 2, plan)
    }
  }

  test("plan shape, broadcast path: dim-sized right broadcasts, left untouched") {
    val df = realTableJoin
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoinBroadcast"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 0, plan)
    assert(plan.contains("BroadcastExchange"), plan)
    assert("Sort \\[".r.findAllIn(plan).size == 0, plan)
  }

  test("broadcast and merge paths return identical results") {
    val viaBroadcast = realTableJoin.orderBy($"event_id").collect().toSeq
    val viaMerge = withThreshold("-1") {
      realTableJoin.orderBy($"event_id").collect().toSeq
    }
    assert(viaBroadcast == viaMerge)
    assert(viaBroadcast.nonEmpty)
  }

  test("randomized equivalence vs composed max_by form (200 x 300 rows, seeded)") {
    // adversarial shape: few keys (collisions), few distinct times (ties),
    // duplicate (key, time) pairs on both sides
    val rnd = new scala.util.Random(42)
    val l = (1 to 200).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(20).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = (1 to 300).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(20).toLong, i.toLong))
      .toDF("k2", "rt", "rid")
    def native = AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt",
        tieBreak = Seq("rid"))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val composed = l.join(r, $"k" === $"k2" && $"rt" <= $"t")
      .groupBy($"lid")
      .agg(max_by($"rid", struct($"rt", $"rid")).as("rid"))
      .as[(Long, Long)].collect().toSet
    assert(native == composed)                    // broadcast path (small right)
    assert(withThreshold("-1")(native) == composed) // shuffle-merge path
    assert(native.nonEmpty)
    // and the left-outer row count is exactly the left side
    val outer = AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt",
      tieBreak = Seq("rid"), joinType = "left")
    assert(outer.count() == 200)
    // forward with tolerance vs the composed min_by form
    val tol = 5L
    val nativeFwd = AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt",
        tieBreak = Seq("rid"), direction = "forward", tolerance = Some(tol))
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val composedFwd = l.join(r, $"k" === $"k2" && $"rt" >= $"t" && $"rt" <= $"t" + tol)
      .groupBy($"lid")
      .agg(min_by($"rid", struct($"rt", $"rid")).as("rid"))
      .as[(Long, Long)].collect().toSet
    assert(nativeFwd == composedFwd)
    assert(nativeFwd.nonEmpty)
  }

  test("left outer pads NON-NULLABLE right columns with real NULLs, not zeros") {
    // regression: resultProj built from the raw (non-nullable) right attrs
    // codegen'd without null checks and read the null pad row as 0s
    val l = Seq((1L, 10L, "la"), (2L, 7L, "lb")).toDF("k", "t", "ltag")
    val r = Seq((1L, 6L, 55L)).toDF("k2", "rt", "rv") // all non-nullable
    def run(threshold: String) = withThreshold(threshold) {
      AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt", joinType = "left")
        .orderBy($"k").collect()
    }
    for (rows <- Seq(run("10MB"), run("-1"))) {
      assert(rows(0).getLong(5) == 55L)
      assert(rows(1).isNullAt(3) && rows(1).isNullAt(4) && rows(1).isNullAt(5),
        rows.mkString("; "))
    }
  }

  test("mismatched key types are rejected eagerly, not silently empty") {
    // regression: Int-vs-Long keys compared as raw UnsafeRow bytes never
    // matched; now the API demands an explicit cast
    val l = Seq((1, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k2", "rt")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt")
    }
    assert(err.getMessage.contains("key types must match"), err.getMessage)
    // and the documented fix works
    val ok = AsOf.join(l.select($"k".cast("long").as("k"), $"t"),
      r, Seq("k"), Seq("k2"), "t", "rt")
    assert(ok.count() == 1)
  }

  test("column resolution is case-insensitive like the rest of the session") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k2", "rt")
    val df = AsOf.join(l, r, Seq("K"), Seq("K2"), "T", "RT")
    assert(df.count() == 1)
  }

  test("time columns must be LongType — timestamps are rejected eagerly") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "t")
    val r = Seq((1L, 5L)).toDF("k2", "rt")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), Seq("k2"), "t", "rt")
    }
    assert(err.getMessage.contains("LongType"))
  }

  test("SQL table function asof_join matches the Scala API on all variants") {
    graft.plans.GraftFunctions.register(spark)
    lDf.createOrReplaceTempView("asof_l")
    rDf.createOrReplaceTempView("asof_r")
    def viaSql(extra: String) = spark.sql(
      s"SELECT ltag, rtag FROM asof_join('asof_l', 'asof_r', 'k', 'k2', 't', 'rt'$extra)")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    def viaApi(jt: String, dir: String, tol: Option[Long]) =
      AsOf.join(lDf, rDf, Seq("k"), Seq("k2"), "t", "rt",
          joinType = jt, direction = dir, tolerance = tol)
        .select($"ltag", $"rtag").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(viaSql("") == viaApi("inner", "backward", None))
    assert(viaSql(", 'left'") == viaApi("left", "backward", None))
    assert(viaSql(", 'left', 'forward'") == viaApi("left", "forward", None))
    assert(viaSql(", 'inner', 'backward', 2") == viaApi("inner", "backward", Some(2L)))
  }

  test("SQL asof_join rejects bad arity, types, and self-joins with analysis errors") {
    import org.apache.spark.sql.AnalysisException
    graft.plans.GraftFunctions.register(spark)
    lDf.createOrReplaceTempView("asof_l")
    rDf.createOrReplaceTempView("asof_r")
    val arity = intercept[AnalysisException] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r')").collect()
    }
    assert(arity.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", arity.getMessage)
    val badTime = intercept[AnalysisException] {
      spark.sql(
        "SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 'k2', 't', 'rtag')")
        .collect()
    }
    assert(badTime.getMessage.contains("BIGINT epoch micros"), badTime.getMessage)
    // same view on both sides shares attribute instances — the analyzer's
    // ambiguity check or the strategy's overlap guard must reject, never
    // silently mirror columns
    val self = intercept[AnalysisException] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_l', 'k', 'k', 't', 't')")
        .collect()
    }
    assert(self.getMessage.contains("ambiguous") ||
      self.getMessage.contains("alias one side"), self.getMessage)
    // a name that only exists on the OTHER side resolves (the analyzer
    // searches both children) but must die at planning, not in
    // BindReferences mid-task
    val wrongSide = intercept[AnalysisException] {
      spark.sql(
        "SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 'k2', 'rt', 'rt')")
        .collect()
    }
    assert(wrongSide.getMessage.contains("does not come from the left side"),
      wrongSide.getMessage)
    // compound lists are for keys only; a multi-name time arg must not be
    // silently truncated to its first column
    val multiTime = intercept[AnalysisException] {
      spark.sql(
        "SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 'k2', 't,rt', 'rt')")
        .collect()
    }
    assert(multiTime.getMessage.contains("exactly ONE"), multiTime.getMessage)
  }

  test("left-side filters push through the as-of join into the scan; right-side stay") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val dir = sf("sf0.01")
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"ts_us")
    val od = graft.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("od_us"))
    val joined = AsOf.join(ev, od, Seq("user_id"), Seq("o_custkey"),
      "ts_us", "od_us", joinType = "left")
    // left-referencing predicate: must sink below the join (and from
    // there Catalyst carries it into the parquet scan's PushedFilters)
    val lf = joined.filter($"event_type" === "click")
    val asofL = lf.queryExecution.optimizedPlan
      .collect { case j: graft.plans.AsOfJoinPlan => j }.head
    assert(asofL.left.exists(_.isInstanceOf[LFilter]),
      lf.queryExecution.optimizedPlan.toString)
    lf.collect()
    val scans = lf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(scans.contains("EqualTo(event_type,click)"), scans)
    // pushing must not change results
    val prefiltered = AsOf.join(ev.filter($"event_type" === "click"), od,
      Seq("user_id"), Seq("o_custkey"), "ts_us", "od_us", joinType = "left")
    assert(lf.exceptAll(prefiltered).isEmpty && prefiltered.exceptAll(lf).isEmpty)
    // right-referencing predicate: filtering right history would CHANGE
    // which row is latest — it must stay above the join
    val rf = joined.filter($"o_orderkey" > 100)
    val asofR = rf.queryExecution.optimizedPlan
      .collect { case j: graft.plans.AsOfJoinPlan => j }.head
    assert(!asofR.left.exists(_.isInstanceOf[LFilter]) &&
      !asofR.right.exists(_.isInstanceOf[LFilter]),
      rf.queryExecution.optimizedPlan.toString)
  }

  test("projection prunes unused columns below the as-of join into ReadSchema") {
    val dir = sf("sf0.01")
    val ev = graft.Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"props", $"value", $"ts_us")
    val od = graft.Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority", $"o_totalprice",
        unix_micros($"o_orderdate".cast("timestamp")).as("od_us"))
    val narrow = AsOf.join(ev, od, Seq("user_id"), Seq("o_custkey"),
        "ts_us", "od_us")
      .select($"event_id", $"o_orderkey")
    val j = narrow.queryExecution.optimizedPlan
      .collect { case j: graft.plans.AsOfJoinPlan => j }.head
    // children carry only (projected + key + time) columns
    val lNames = j.left.output.map(_.name).toSet
    val rNames = j.right.output.map(_.name).toSet
    assert(lNames == Set("event_id", "user_id", "ts_us"), lNames)
    assert(rNames == Set("o_orderkey", "o_custkey", "od_us"), rNames)
    // and the pruning reaches the scans: props/value/o_totalprice unread
    narrow.collect()
    val scans = narrow.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!scans.contains("props") && !scans.contains("o_totalprice"), scans)
    // results unchanged vs the unpruned wide form
    val wide = AsOf.join(ev, od, Seq("user_id"), Seq("o_custkey"),
      "ts_us", "od_us")
    assert(narrow.count() == wide.count())
  }

  test("self-join-shaped right (shared exprIds) joins real values, not mirrors") {
    // both sides derive from the SAME DataFrame, so without the right-side
    // re-alias the analyzed plans share attribute exprIds and the output
    // projection would silently mirror left values into the right columns
    val base = Seq((1L, 10L, 100.0), (1L, 5L, 50.0), (1L, 2L, 20.0))
      .toDF("k", "t", "v")
    val expected = Set(
      (10L, 100.0, 5L, 50.0),  // latest right with t<10 at/before 10 is (5, 50)
      (5L, 50.0, 5L, 50.0),
      (2L, 20.0, 2L, 20.0))
    def run = AsOf.join(base, base.filter($"t" < 10L),
        Seq("k"), Seq("k"), "t", "t")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(4), r.getDouble(5)))
      .toSet
    assert(run == expected)                      // broadcast path
    assert(withThreshold("-1")(run) == expected) // shuffle-merge path
  }
}
