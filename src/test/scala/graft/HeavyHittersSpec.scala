package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** [[HeavyHitters]] (q126): the Misra–Gries retention guarantee, exactness
  * of the two-pass top-K under the condition, partitioning-independence of
  * the merged summary, and the bounded-state contract.
  */
class HeavyHittersSpec extends SparkSpec {

  /** Zipf(1) token stream over 200 terms — seeded, ~heavy head. */
  private def zipfDocs(nDocs: Int, docLen: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val weights = (0 until 200).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = { val u = rnd.nextDouble() * total; cum.indexWhere(u <= _) }
    (0 until nDocs).map { d =>
      (d.toLong, (0 until docLen).map(_ => s"t${draw()}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def exactCounts(docs: org.apache.spark.sql.DataFrame) =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  test("every token above n/(capacity+1) survives the sketch") {
    val docs = zipfDocs(100, 40)
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val capacity = 32
    val cand = HeavyHitters.candidates(toks, "token", capacity).toSet
    val mustSurvive = exactCounts(docs)
      .filter(col("cnt") > n / (capacity + 1))
      .collect().map(_.getString(0)).toSet
    assert(mustSurvive.nonEmpty)
    assert(mustSurvive.subsetOf(cand),
      s"missing guaranteed heavy hitters: ${mustSurvive -- cand}")
  }

  test("two-pass top-K equals the plain exact top-K in the tight-capacity regime") {
    val docs = zipfDocs(100, 40)
    val got = HeavyHitters.exactTopK(docs, "text", k = 3, capacity = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = exactCounts(docs)
      .orderBy(col("cnt").desc, col("token")).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("summary is partitioning-independent where the guarantee binds") {
    val docs = zipfDocs(80, 30)
    val t1 = HeavyHitters.exactTopK(docs.repartition(1), "text", 3, 32)
      .collect().toSeq
    val t8 = HeavyHitters.exactTopK(docs.repartition(8), "text", 3, 32)
      .collect().toSeq
    assert(t1.map(_.toSeq) == t8.map(_.toSeq))
  }

  test("candidate set never exceeds the capacity bound") {
    val docs = zipfDocs(200, 40)
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
    val cand = HeavyHitters.candidates(toks, "token", 16)
    assert(cand.size <= 16, s"state leaked past capacity: ${cand.size}")
  }

  test("pass-2 membership is a broadcast left-semi join, not an In-list") {
    // the candidate probe must keep the plan constant-size in capacity
    // (100k literals in an In predicate was the round-8 review finding)
    val docs = zipfDocs(100, 20)
    val top = HeavyHitters.exactTopK(docs, "text", k = 5, capacity = 64)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected a broadcast left-semi candidate probe, got:\n$plan")
    assert(!plan.contains(" IN ("), "candidate membership must not be an In-list")
  }

  test("rejects out-of-range parameters") {
    val docs = zipfDocs(5, 5)
    intercept[IllegalArgumentException](
      HeavyHitters.exactTopK(docs, "text", k = 0))
    intercept[IllegalArgumentException](
      new HeavyHitters.MisraGries(0))
  }
}
