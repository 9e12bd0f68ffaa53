package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-relational declared queries (SURVEY.md §2C q01–q19, q25).
  *
  * Every query is pure DataFrame API: Catalyst handles pushdown, pruning,
  * join selection (broadcast for the small dims), and whole-stage codegen.
  * Scale posture per query is noted inline — no collect(), no driver loops;
  * the only intentional single-partition windows are over already-aggregated
  * tiny frames (monthly counts).
  */
object Relational {

  /** B1,B2,B3 — scan + filter + project with a computed column.
    * The year predicate is written as a sargable timestamp RANGE (not
    * `year(col) === 1995`, which wraps the column in a function and blocks
    * parquet predicate pushdown) so both bounds reach the scan as
    * PushedFilters and row groups outside 1995 are skipped by footer stats.
    */
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q01Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
      |  ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
      |FROM lineitem
      |WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** B11,B27 — TPC-H Q1-alike pricing summary: hash aggregate with partial
    * (map-side) aggregation for free; 6 aggregates over 2 group keys.
    */
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q02Sql =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 4) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B4,B5 — star join with explicitly broadcast dimensions (nation/region
    * are tiny at any scale factor; customer⋈orders shuffles on the fact key).
    */
  private def q03(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))

  private val q03Sql =
    """SELECT r_name, ROUND(SUM(o_totalprice), 4) AS revenue, COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** B4 — 3-way fact join, top revenue orders (deterministic: rounded
    * revenue DESC then unique o_orderkey).
    *
    * Round-17 shape: the revenue group key (o_orderkey, c_name) is
    * FUNCTIONALLY determined by l_orderkey, so the sum is pushed below the
    * joins — lineitem pre-aggregates per l_orderkey (map-side partials on a
    * long key), and the joins then carry |orders| pre-summed rows instead
    * of |lineitem| raw ones with a c_name string in the group key. Same
    * multiset summed per key, same round(…, 4), so rows are identical
    * (driver-checked oracle hash); guide §2.3 "aggregate before you
    * shuffle".
    */
  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        col("c_custkey") === col("o_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(100)

  private val q04Sql =
    """SELECT o_orderkey, c_name,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM orders
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |GROUP BY o_orderkey, c_name
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** B6 — left outer join keeping order-less customers (COUNT(col) skips
    * nulls on both engines).
    */
  private def q05(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  private val q05Sql =
    """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      |FROM customer
      |LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  /** B7 — left semi (EXISTS) and left anti (NOT EXISTS), tagged and unioned. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("tag"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("tag"))
    semi.unionByName(anti).orderBy(col("c_custkey"), col("tag"))
  }

  private val q06Sql =
    """SELECT c_custkey, 'has_orders' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey, 'no_orders' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey, tag""".stripMargin

  /** B8 — theta (non-equi) join, aggregated. Round-17 shape: the broadcast
    * nested-loop join materialized |part| × |supplier| pairs (20M at sf0.1
    * — 1.5 s of pure pair counting) only for the aggregate to collapse
    * them per brand. The count of suppliers with `s_acctbal >
    * p_retailprice` is an ORDER STATISTIC: union both columns into one
    * sorted stream (suppliers before parts at equal value, so ties are
    * excluded from the strict >), take a running supplier count, and each
    * part row reads its answer as (total suppliers − suppliers ≤ price) —
    * O((P+S) log(P+S)) instead of O(P×S), and the same trick at any scale
    * replaces the quadratic BNLJ with a sort. A brand appears in the inner
    * join's output iff it has ≥1 pair, hence the n_pairs > 0 filter.
    * Result rows are identical (driver-checked oracle hash).
    */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    // NULL contract (round-18, ADVICE r17): the BNLJ this form replaced
    // drops NULL comparisons, so NULL-acctbal suppliers must not count
    // anywhere (n_sup counts s_acctbal, not rows) and NULL-price parts
    // must vanish — both arms filter v IS NOT NULL. TPC-H data carries no
    // NULLs, so declared output is unchanged; the filters pin the
    // replaced join's semantics for any input.
    val sup = Tables.supplier(s, dir)
      .select(lit(null).cast("string").as("p_brand"),
        col("s_acctbal").cast("double").as("v"), lit(0).as("is_part"))
      .filter(col("v").isNotNull)
    val prt = Tables.part(s, dir)
      .select(col("p_brand"), col("p_retailprice").cast("double").as("v"),
        lit(1).as("is_part"))
      .filter(col("v").isNotNull)
    // Round-18 (VERDICT r17 item 4): the running supplier count was a
    // single-partition window at ANY size (Window.orderBy with no
    // partitionBy — every part∪supplier row through ONE task, the classic
    // single-reducer bottleneck at scale). Size-gated like the Ann/Bpe
    // trainers: above the gate (combined scan estimate > 64 MB — sf0.1 is
    // ~3 MB, a 100 TB run is far past it) the count runs as a DISTRIBUTED
    // two-pass prefix sum; below it the single window stays, because both
    // distributed forms MEASURED slower on the 21k-row bench input where
    // scheduler round-trips dominate (single window 0.38 s; fixed-width
    // bins 0.94 s, +3 stage-jobs; repartitionByRange + pid + checkpoint
    // 0.72 s). ThetaJoinSpec pins count-identical output on both paths,
    // ties and brand duplicates included.
    // gate metric from the FILES, not plan stats: running the optimizer
    // twice per construction just to read sizeInBytes measured +0.2 s per
    // bench run (driver-side analysis is not free at this query's scale)
    val scanBytes = Tables.fileBytes(s, dir, "supplier") +
      Tables.fileBytes(s, dir, "part")
    val nSup = Tables.supplier(s, dir).agg(count(col("s_acctbal")).as("n_sup"))
    cumSupCounts(sup.unionByName(prt), distributed = scanBytes > (64L << 20))
      .filter(col("is_part") === 1)
      .crossJoin(broadcast(nSup))
      .groupBy(col("p_brand"))
      .agg(sum(col("n_sup") - col("cum_sup")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy(col("p_brand"))
  }

  /** The q07 running supplier count over the (p_brand, v, is_part) union:
    * cum_sup(row) = #suppliers with sort key ≤ (v, is_part) — suppliers
    * sort before parts at equal v, so a part row reads "suppliers with
    * acctbal ≤ my price" and the strict `>` excludes ties. Two shapes,
    * output-identical (ThetaJoinSpec):
    *
    *   - `distributed = false`: one global running-sum window — a single
    *     reducer task, optimal below the scheduler-overhead floor.
    *   - `distributed = true`: two-pass prefix sum partitioned by a
    *     DETERMINISTIC fixed-width value bin (the q50 binned-percentile
    *     trick — a monotone function of the sort key needs no range
    *     sampling, so no materialization is needed for the two readers to
    *     agree): per-bin running counts in parallel, plus broadcast
    *     per-bin supplier offsets (one row per occupied bin; their own
    *     cumulative window is over that tiny frame). off(bin) + local ≡
    *     the global running count exactly — equal keys share a bin and
    *     the bin is monotone in v.
    */
  private[graft] def cumSupCounts(u: DataFrame,
      distributed: Boolean): DataFrame = {
    val supRow = lit(1L) - col("is_part")
    if (!distributed) {
      val w = Window.orderBy(col("v"), col("is_part"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("cum_sup", sum(supRow).over(w))
    } else {
      val binned = u.withColumn("bin", floor(col("v") / lit(16.0)).cast("long"))
      val wOff = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = binned.groupBy(col("bin"))
        .agg(sum(supRow).as("ns"))
        .withColumn("off", coalesce(sum(col("ns")).over(wOff), lit(0L)))
        .select(col("bin"), col("off"))
      val wLoc = Window.partitionBy(col("bin"))
        .orderBy(col("v"), col("is_part"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      binned
        .withColumn("cum_loc", sum(supRow).over(wLoc))
        .join(broadcast(offsets), "bin")
        .withColumn("cum_sup", col("off") + col("cum_loc"))
        .drop("bin", "cum_loc", "off")
    }
  }

  private val q07Sql =
    """SELECT p_brand, COUNT(*) AS n_pairs
      |FROM part
      |JOIN supplier ON s_acctbal > p_retailprice
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** B9 — time-range self-join on events: pairs of events of the same user
    * at most 5 minutes apart. Scale design: instead of the naive
    * equi-join-on-user + filter (quadratic per user), each left row is
    * exploded into its own and the next 5-minute bucket, and the join runs
    * on (user_id, bucket) — each qualifying pair is found exactly once in
    * the right row's home bucket, and per-bucket match lists stay O(1) at
    * any scale factor.
    */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val bucketUs = 300000000L // 5 minutes in microseconds
    val e = Tables.events(s, dir)
    val a = e.select(
        col("user_id"), col("event_id").as("a_id"), col("ts_us").as("a_ts"),
        explode(array(
          expr(s"ts_us div $bucketUs"),
          expr(s"ts_us div $bucketUs") + lit(1L))).as("bucket"))
    val b = e.select(
        col("user_id"), col("event_id").as("b_id"), col("ts_us").as("b_ts"),
        expr(s"ts_us div $bucketUs").as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("b_ts") > col("a_ts") && col("b_ts") <= col("a_ts") + lit(bucketUs))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  private val q08Sql =
    """SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM events a
      |JOIN events b ON b.user_id = a.user_id
      |  AND epoch_us(b.ts) > epoch_us(a.ts)
      |  AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** B10 — as-of join: for each event, the latest order of that user with
    * o_orderdate <= event time. Composed as range join + per-event max_by
    * aggregate: a hash aggregate with map-side partials, so the
    * (events⋈orders) expansion is reduced before it shuffles — strictly
    * cheaper than the round-1 row_number form, which sorted the whole
    * expansion. Tie-break on (od_us, o_orderkey) DESC via the struct key
    * (o_orderkey makes the key unique, so max_by is deterministic).
    */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    // Round-17 shape: the range join expanded every event against EVERY
    // past order of its user (|events/user| × |orders/user| rows through
    // the join) before max_by collapsed the expansion. The as-of lookup is
    // a MERGE: union orders and events on one per-user timeline (orders
    // sort before events at equal time, so od_us <= ts_us stays inclusive)
    // and carry a running max of struct(od_us, o_orderkey) — the same key
    // max_by used, so ties break identically. One shuffle of |events| +
    // |orders| rows, zero expansion, at any scale. Events with no prior
    // order have a NULL running max — exactly the rows the inner join
    // dropped. Rows identical (driver-checked oracle hash).
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts_us"))
    val o = Tables.orders(s, dir)
      // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
      // is value-preserving and matches DuckDB's epoch_us(o_orderdate).
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val merged = o
      .select(col("o_custkey").as("user_id"), col("od_us").as("t"),
        lit(0).as("kind"), struct(col("od_us"), col("o_orderkey")).as("ok"),
        lit(null).cast("bigint").as("event_id"))
      .unionByName(e.select(col("user_id"), col("ts_us").as("t"),
        lit(1).as("kind"),
        lit(null).cast("struct<od_us:bigint,o_orderkey:bigint>").as("ok"),
        col("event_id")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("latest", max(col("ok")).over(w))
      .filter(col("kind") === 1 && col("latest").isNotNull)
      .select(col("event_id"),
        col("latest").getField("o_orderkey").as("latest_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q09Sql =
    """SELECT event_id, o_orderkey AS latest_orderkey
      |FROM (
      |  SELECT e.event_id, o.o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |      ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  JOIN orders o ON o.o_custkey = e.user_id
      |    AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
      |) t
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** B10 via the NATIVE as-of join operator (plans.AsOf: custom
    * LogicalPlan → Strategy → sort-merge SparkPlan) — same task and same
    * oracle as q09, but the plan never materializes the
    * (events x order-history) expansion: one shuffle per side, one merge
    * pass, O(1) state per key. The two declared forms keep each other
    * honest: q09 pins the semantics in pure DataFrame algebra, q71 proves
    * the custom operator implements exactly those semantics.
    */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts_us"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    graft.plans.AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"),
        "ts_us", "od_us", tieBreak = Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey").as("latest_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q71Sql = // identical semantics to q09 — intentionally
    """SELECT event_id, o_orderkey AS latest_orderkey
      |FROM (
      |  SELECT e.event_id, o.o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY e.event_id
      |      ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
      |  FROM events e
      |  JOIN orders o ON o.o_custkey = e.user_id
      |    AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
      |) t
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** B10 — FORWARD as-of with tolerance via the native operator: each
    * click's next purchase by the same user within one hour (left outer —
    * clicks without a purchase keep NULLs). The funnel twin of the
    * stream-stream join q62, here as one merge pass instead of a range
    * join; forward ties resolve to the least event_id.
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_ts_us"))
    graft.plans.AsOf.join(c, p, Seq("user_id"), Seq("p_user"),
        "ts_us", "p_ts_us", tieBreak = Seq("p_event_id"),
        joinType = "left", direction = "forward",
        tolerance = Some(3600000000L))
      .select(col("event_id"), col("p_event_id").as("next_purchase_id"),
        (col("p_ts_us") - col("ts_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  private val q72Sql =
    """SELECT event_id, next_purchase_id, gap_us
      |FROM (
      |  SELECT c.event_id, p.event_id AS next_purchase_id,
      |    epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
      |    ROW_NUMBER() OVER (PARTITION BY c.event_id
      |      ORDER BY epoch_us(p.ts) ASC, p.event_id ASC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'click') c
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |    ON p.user_id = c.user_id
      |    AND epoch_us(p.ts) >= epoch_us(c.ts)
      |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
      |) t
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** B4 + skew salting — the salted equi-join operator, oracle-checked by
    * construction: salting only changes the shuffle layout, so the result
    * must equal the PLAIN join (which is exactly what the oracle SQL runs).
    * events.user_id is the skew-shaped key in the testdata.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("value"))
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.SkewJoin.saltedInnerJoin(e, c, "user_id", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  private val q60Sql =
    """SELECT c.c_mktsegment, COUNT(*) AS n,
      |  ROUND(SUM(e.value), 4) AS sum_value
      |FROM events e
      |JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY 1
      |ORDER BY c_mktsegment""".stripMargin

  private def revenueByGeo(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))

  /** B12 — ROLLUP over (region, nation) with GROUPING() tags. */
  private def q10(s: SparkSession, dir: String): DataFrame =
    revenueByGeo(s, dir)
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"),
        round(sum(col("o_totalprice")), 4).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(col("g_r"), col("g_n"), col("r_name"), col("n_name"), col("revenue"), col("n_orders"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  private val q10Sql =
    """SELECT CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
      |  r_name, n_name,
      |  ROUND(SUM(o_totalprice), 4) AS revenue, COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** B12 — CUBE over (o_orderstatus, o_orderpriority). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_s"),
        grouping(col("o_orderpriority")).cast("int").as("g_p"),
        count(lit(1)).as("n_orders"))
      .select(col("g_s"), col("g_p"), col("o_orderstatus"), col("o_orderpriority"), col("n_orders"))
      .orderBy(col("g_s"), col("g_p"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q11Sql =
    """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
      |  o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g_s, g_p, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** B14 — ranking window: top-3 orders per customer by totalprice. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q12Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** B15 — lag/lead analytics over per-user event streams (microsecond
    * BIGINT time axis, see Tables.events).
    */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("value"),
        round(col("value") - lag(col("value"), 1).over(w), 4).as("delta_prev"),
        round(lead(col("value"), 1).over(w) - col("value"), 4).as("delta_next"))
      .orderBy(col("event_id"))
  }

  private val q13Sql =
    """SELECT event_id, user_id, value,
      |  ROUND(value - LAG(value) OVER w, 4) AS delta_prev,
      |  ROUND(LEAD(value) OVER w - value, 4) AS delta_next
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |ORDER BY event_id""".stripMargin

  /** B16 — running-total rows-frame window per customer over order dates. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 4).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q14Sql =
    """SELECT o_custkey, o_orderkey,
      |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** B17 — global top-K: planner turns orderBy+limit into
    * TakeOrderedAndProject (no full sort at scale).
    */
  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  private val q15Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 20""".stripMargin

  /** B18 — INTERSECT and EXCEPT (set semantics), tagged and unioned.
    *
    * One pass, not two (r18): Catalyst rewrites INTERSECT/EXCEPT to a
    * distinct aggregate + semi/anti join EACH — two full lineitem
    * aggregations feeding two joins, for partitions of the SAME distinct
    * key set. The union of the two branches is exactly every distinct
    * l_suppkey tagged by whether it appears in supplier, so one distinct +
    * one left join (null-safe, matching set-op NULL-equality; supplier is
    * deduped first so the join cannot fan out) computes both branches in a
    * single pass. The planner broadcasts the supplier side from its own
    * size estimate — no explicit hint on the corpus-proportional table.
    */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_suppkey").as("suppkey"))
    val su = Tables.supplier(s, dir).select(col("s_suppkey").as("su_key"))
      .distinct().withColumn("in_su", lit(true))
    li.distinct()
      .join(su, col("suppkey") <=> col("su_key"), "left")
      .select(col("suppkey"),
        when(col("in_su").isNotNull, lit("in_both"))
          .otherwise(lit("li_only")).as("tag"))
      .orderBy(col("suppkey"), col("tag"))
  }

  private val q16Sql =
    """SELECT suppkey, 'in_both' AS tag FROM
      |  (SELECT l_suppkey AS suppkey FROM lineitem
      |   INTERSECT
      |   SELECT s_suppkey AS suppkey FROM supplier)
      |UNION ALL
      |SELECT suppkey, 'li_only' AS tag FROM
      |  (SELECT l_suppkey AS suppkey FROM lineitem
      |   EXCEPT
      |   SELECT s_suppkey AS suppkey FROM supplier)
      |ORDER BY suppkey, tag""".stripMargin

  /** B19 — exact deduplication (dropDuplicates == DISTINCT). */
  private def q17(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates()
      .orderBy(col("user_id"), col("event_type"))

  private val q17Sql =
    """SELECT DISTINCT user_id, event_type
      |FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** B25 — string function battery over part. */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(regexp_extract(col("p_name"), "^(\\w+)", 1)).as("adj"),
        length(col("p_name")).cast("int").as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name5"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"))
      .orderBy(col("p_partkey"))

  private val q18Sql =
    """SELECT p_partkey,
      |  UPPER(regexp_extract(p_name, '^(\w+)', 1)) AS adj,
      |  CAST(LENGTH(p_name) AS INT) AS name_len,
      |  CONCAT(p_brand, '/', p_type) AS brand_type,
      |  SUBSTRING(p_name, 1, 5) AS name5,
      |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  REPLACE(p_name, ' ', '_') AS name_us
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** B26 — date functions: monthly order counts + month-over-month delta.
    * The unpartitioned lag window runs over ~tens of pre-aggregated rows —
    * safe at any scale factor.
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("mom_delta", col("n_orders") - lag(col("n_orders"), 1).over(w))
      .orderBy(col("month"))
  }

  private val q19Sql =
    """SELECT month, n_orders, n_orders - LAG(n_orders) OVER (ORDER BY month) AS mom_delta
      |FROM (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |    COUNT(*) AS n_orders
      |  FROM orders
      |  GROUP BY 1
      |) t
      |ORDER BY month""".stripMargin

  /** B31 — pivot: per-user event-type counts as columns. Spark's
    * groupBy().pivot() with an explicit value list (single-shuffle plan);
    * oracle uses the equivalent CASE aggregation.
    */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "purchase", "error", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
    types.foldLeft(pivoted)((df, t) => df.withColumnRenamed(t, s"n_$t"))
      .orderBy(col("user_id"))
  }

  private val q25Sql =
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** B14 — ntile quartiles of customers by balance within market segment
    * (deterministic: c_custkey tie-break inside the window order).
    */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 4).as("min_bal"),
        round(max(col("c_acctbal")), 4).as("max_bal"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  private val q49Sql =
    """SELECT c_mktsegment, quartile, COUNT(*) AS n,
      |  ROUND(MIN(c_acctbal), 4) AS min_bal, ROUND(MAX(c_acctbal), 4) AS max_bal
      |FROM (
      |  SELECT c_mktsegment, c_acctbal,
      |    CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
      |  FROM customer
      |) t
      |GROUP BY c_mktsegment, quartile
      |ORDER BY c_mktsegment, quartile""".stripMargin

  /** B11/B34 family — exact interpolated percentiles per group (Spark
    * `percentile` == DuckDB `quantile_cont`, verified same interpolation).
    * The three l_quantity quantiles share ONE percentile buffer via the
    * array form — each scalar percentile() call would otherwise collect
    * its own copy of every value per group (4 buffers → 2).
    *
    * Scale caveat: exact percentile buffers EVERY value per group
    * (O(group-size) memory), acceptable only while groups fit an executor.
    * The 100 TB path is `approx_percentile` — bounded GK summary with rank
    * error <= n/accuracy, guarantee verified in ApproxSpec ("approx_
    * percentile rank error"); this exact form stays as the oracle anchor.
    */
  /** Exact-percentile replay of Spark's `Percentile` aggregate as a
    * codegen-friendly histogram + interpolation plan — the round-17
    * replacement for the TypedImperativeAggregate path, which builds a
    * per-group OpenHashMap through interpreted per-row updates (no
    * whole-stage codegen, boxing per row) and disables codegen for every
    * sibling aggregate in the same agg list.
    *
    * Shape: groupBy(group, value).count → per-group cumulative counts over
    * the value order (one window sort) → for each requested fraction p,
    * pick the two bracketing order statistics and interpolate. The math is
    * Percentile.getPercentile's, term for term:
    *
    *   position = p * (n - 1)            // n = group row count
    *   lower = floor(position); higher = ceil(position)
    *   v[k]  = first histogram value whose cumulative count > k
    *   result = v[lower]                            if lower == higher
    *          = v[lower]                            if v[lower] == v[higher]
    *          = (higher-position)*v[lower] + (position-lower)*v[higher]
    *
    * including both no-interpolation special cases (the second matters:
    * a*v + b*v with a+b == 1 is NOT always v in IEEE doubles), so results
    * are bit-equal to the aggregate it replaces — q50/q76's oracle hashes
    * are unchanged (driver-checked both rounds). Scale posture: the
    * shuffle carries (group, value) pairs once; for low-cardinality values
    * the histogram collapses map-side, and the window sort replaces the
    * single-reducer per-group hash map with a codegen sort.
    */
  private[queries] def exactPercentiles(
      df: DataFrame,
      groupCol: String,
      value: org.apache.spark.sql.Column,
      ps: Seq[Double],
      outNames: Seq[String]): DataFrame = {
    require(ps.length == outNames.length, "one output name per fraction")
    val hist = df
      .groupBy(col(groupCol), value.cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(groupCol).orderBy(col("v"))
    val wAll = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("nn", sum(col("c")).over(wAll))
    def pos(p: Double) = lit(p) * (col("nn") - lit(1L)).cast("double")
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        min(when(col("cum") > floor(pos(p)), col("v"))).as(s"graft_lo_$i"),
        min(when(col("cum") > ceil(pos(p)), col("v"))).as(s"graft_hi_$i"))
    }
    val g = cum.groupBy(col(groupCol))
      .agg(max(col("nn")).as("nn"), aggs: _*)
    val out = ps.zipWithIndex.map { case (p, i) =>
      val h = pos(p)
      val lo = col(s"graft_lo_$i")
      val hi = col(s"graft_hi_$i")
      when(floor(h) === ceil(h) || lo === hi, lo)
        .otherwise((ceil(h) - h) * lo + (h - floor(h)) * hi)
        .as(outNames(i))
    }
    g.select(col(groupCol) +: out: _*)
  }

  /** [[exactPercentiles]] for NEAR-DISTINCT values, where the value
    * histogram would not collapse (measured: the (flag, price) groupBy
    * shuffled all 600k rows and q50 got SLOWER than the aggregate it
    * replaced). Two-pass bin refinement instead — the guide-§8 "decide on
    * small rows" shape: pass 1 aggregates counts per (group, ⌊v/binWidth⌋)
    * — codegen, map-side partials, a few hundred bins per group — and the
    * cumulative bin counts locate which bin holds each target rank;
    * pass 2 re-scans with a broadcast semi-join onto ONLY those bins
    * (~n/bins rows survive), ranks within the bin (cum_before + local
    * row_number), and interpolates exactly as [[exactPercentiles]] does.
    * Same Percentile math, measured 1.5 → 0.9 s on q50's p99 at sf0.1 and
    * scale-safe (both passes are full codegen scans; nothing holds a
    * per-group value map).
    */
  private[queries] def exactPercentilesBinned(
      df: DataFrame,
      groupCol: String,
      value: org.apache.spark.sql.Column,
      ps: Seq[Double],
      outNames: Seq[String],
      binWidth: Double = 256.0): DataFrame = {
    require(ps.length == outNames.length, "one output name per fraction")
    val binned = df.select(col(groupCol), value.cast("double").as("v"))
      .withColumn("graft_bin", floor(col("v") / lit(binWidth)))
    val hist = binned.groupBy(col(groupCol), col("graft_bin"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy(groupCol).orderBy(col("graft_bin"))
    val wAll = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("cumb", sum(col("c")).over(wOrd))
      .withColumn("nn", sum(col("c")).over(wAll))
    def pos(p: Double) = lit(p) * (col("nn") - lit(1L)).cast("double")
    // a bin is of interest iff it contains rank ⌊pos⌋ or ⌈pos⌉ for any p
    val need = ps.map { p =>
      ((col("cumb") > floor(pos(p))) &&
        (col("cumb") - col("c")) <= floor(pos(p))) ||
      ((col("cumb") > ceil(pos(p))) &&
        (col("cumb") - col("c")) <= ceil(pos(p)))
    }.reduce(_ || _)
    val sel = cum.filter(need)
      .select(col(groupCol), col("graft_bin"),
        (col("cumb") - col("c")).as("cum_before"), col("nn"))
    val ranked = binned.join(broadcast(sel), Seq(groupCol, "graft_bin"))
      .withColumn("rk",
        col("cum_before") +
          row_number().over(Window.partitionBy(col(groupCol), col("graft_bin"))
            .orderBy(col("v"))).cast("long") - lit(1L))
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        min(when(col("rk") === floor(pos(p)), col("v"))).as(s"graft_lo_$i"),
        min(when(col("rk") === ceil(pos(p)), col("v"))).as(s"graft_hi_$i"))
    }
    val g = ranked.groupBy(col(groupCol))
      .agg(max(col("nn")).as("nn"), aggs: _*)
    val out = ps.zipWithIndex.map { case (p, i) =>
      val h = pos(p)
      val lo = col(s"graft_lo_$i")
      val hi = col(s"graft_hi_$i")
      when(floor(h) === ceil(h) || lo === hi, lo)
        .otherwise((ceil(h) - h) * lo + (h - floor(h)) * hi)
        .as(outNames(i))
    }
    g.select(col(groupCol) +: out: _*)
  }

  private def q50(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val qs = exactPercentiles(li, "l_returnflag", col("l_quantity"),
      Seq(0.25, 0.5, 0.75), Seq("p25r", "p50r", "p75r"))
    val p99 = exactPercentilesBinned(li, "l_returnflag", col("l_extendedprice"),
      Seq(0.99), Seq("p99r"))
    qs.join(broadcast(p99), "l_returnflag")
      .select(col("l_returnflag"),
        round(col("p25r"), 4).as("p25"),
        round(col("p50r"), 4).as("p50"),
        round(col("p75r"), 4).as("p75"),
        round(col("p99r"), 4).as("price_p99"))
      .orderBy(col("l_returnflag"))
  }

  private val q50Sql =
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** B15 completion — first_value/last_value/nth_value over a full-partition
    * frame: each order row sees the customer's cheapest, priciest, and
    * second order (deterministic tie-break in the window order).
    */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("cheapest_order"),
        last(col("o_orderkey")).over(w).as("priciest_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q53Sql =
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
      |  LAST_VALUE(o_orderkey) OVER w AS priciest_order,
      |  NTH_VALUE(o_orderkey, 2) OVER w AS second_cheapest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** 2-D spatial join (zonal statistics over arbitrary zone rectangles) —
    * B9's interval-join bucketization lifted to two dimensions via
    * [[graft.operators.SpatialJoin]]: points keyed by grid cell, zone
    * bboxes exploded to overlapped cells, equi-join + exact containment.
    * Synthetic-but-deterministic geometry: coordinates and boxes are
    * DYADIC rationals (/4, *0.5, *6) derived from integer keys, so every
    * float is exact in both engines; the value is acctbal in integer
    * cents (floor(x*100+0.5) — the established cross-engine rounding).
    */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.customer(s, dir).select(
      ((col("c_custkey") % 128) / lit(4.0)).as("x"),
      (expr("(c_custkey div 128) % 128") / lit(4.0)).as("y"),
      expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").as("v"))
    val z = Tables.region(s, dir).select(
      col("r_regionkey").as("zone_id"),
      (col("r_regionkey") * lit(6.0)).as("xmin"),
      lit(0.0).as("ymin"),
      (col("r_regionkey") * lit(6.0) + lit(8.0)).as("xmax"),
      (lit(0.5) + col("r_regionkey") * lit(0.5)).as("ymax"))
    graft.operators.SpatialJoin.zonalStats(p, z, cellSize = 4.0, valueCol = "v")
      .orderBy(col("zone_id"))
  }

  private val q102Sql =
    """WITH p AS (
      |  SELECT (c_custkey % 128) / 4.0 AS x,
      |    ((c_custkey // 128) % 128) / 4.0 AS y,
      |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v
      |  FROM customer
      |), z AS (
      |  SELECT r_regionkey AS zone_id, r_regionkey * 6.0 AS xmin,
      |    0.0 AS ymin, r_regionkey * 6.0 + 8.0 AS xmax,
      |    0.5 + r_regionkey * 0.5 AS ymax
      |  FROM region
      |)
      |SELECT zone_id, COUNT(*) AS n_points, CAST(SUM(v) AS BIGINT) AS val_sum,
      |  MIN(v) AS val_min, MAX(v) AS val_max
      |FROM p JOIN z ON x >= xmin AND x <= xmax AND y >= ymin AND y <= ymax
      |GROUP BY zone_id ORDER BY zone_id""".stripMargin

  /** Radius self-join (near-neighbor pairs — the DBSCAN / stay-point
    * primitive) via [[graft.operators.SpatialJoin.radiusJoin]]: cell size
    * = radius, left side exploded to its 3x3 neighborhood (constant 9x),
    * equi-join on the cell key, exact SQUARED-distance predicate. Same
    * dyadic-rational geometry discipline as q102 (here /4 and /8 offsets,
    * r = 3/8, r^2 = 9/64 — every comparison exact in both engines).
    */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.customer(s, dir).select(
      col("c_custkey").as("pid"),
      ((col("c_custkey") % 64) / lit(4.0) + (col("c_custkey") % 7) / lit(8.0)).as("x"),
      (expr("(c_custkey div 64) % 64") / lit(4.0) + (col("c_custkey") % 5) / lit(8.0)).as("y"))
    graft.operators.SpatialJoin.radiusJoin(p, radius = 0.375)
      .select(col("id_a"), col("id_b"),
        ((col("x_a") - col("x_b")) * (col("x_a") - col("x_b")) +
          (col("y_a") - col("y_b")) * (col("y_a") - col("y_b"))).as("dist2"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q103Sql =
    """WITH p AS (
      |  SELECT c_custkey AS pid,
      |    (c_custkey % 64) / 4.0 + (c_custkey % 7) / 8.0 AS x,
      |    ((c_custkey // 64) % 64) / 4.0 + (c_custkey % 5) / 8.0 AS y
      |  FROM customer
      |)
      |SELECT a.pid AS id_a, b.pid AS id_b,
      |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
      |FROM p a JOIN p b ON a.pid < b.pid
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 0.140625
      |ORDER BY id_a, id_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q102_zonal_join", q102, Some(q102Sql)),
    QueryDef("q103_radius_join", q103, Some(q103Sql)),
    QueryDef("q01_scan_filter_project", q01, Some(q01Sql)),
    QueryDef("q02_pricing_summary", q02, Some(q02Sql)),
    QueryDef("q03_join_broadcast_dims", q03, Some(q03Sql)),
    QueryDef("q04_multiway_join", q04, Some(q04Sql)),
    QueryDef("q05_outer_join", q05, Some(q05Sql)),
    QueryDef("q06_semi_anti", q06, Some(q06Sql)),
    QueryDef("q07_theta_join", q07, Some(q07Sql)),
    QueryDef("q08_range_join_events", q08, Some(q08Sql)),
    QueryDef("q09_asof_latest_order", q09, Some(q09Sql)),
    QueryDef("q71_asof_native", q71, Some(q71Sql)),
    QueryDef("q72_next_purchase_asof", q72, Some(q72Sql)),
    QueryDef("q10_rollup", q10, Some(q10Sql)),
    QueryDef("q11_cube", q11, Some(q11Sql)),
    QueryDef("q12_window_rank", q12, Some(q12Sql)),
    QueryDef("q13_window_lag_lead", q13, Some(q13Sql)),
    QueryDef("q14_window_running", q14, Some(q14Sql)),
    QueryDef("q15_topk", q15, Some(q15Sql)),
    QueryDef("q16_setops", q16, Some(q16Sql)),
    QueryDef("q17_dedup_exact", q17, Some(q17Sql)),
    QueryDef("q18_string_funcs", q18, Some(q18Sql)),
    QueryDef("q19_date_funcs", q19, Some(q19Sql)),
    QueryDef("q25_pivot_case", q25, Some(q25Sql)),
    QueryDef("q49_ntile_quartiles", q49, Some(q49Sql)),
    QueryDef("q50_percentiles", q50, Some(q50Sql)),
    QueryDef("q53_window_first_last", q53, Some(q53Sql)),
    QueryDef("q60_salted_join", q60, Some(q60Sql)))
}
