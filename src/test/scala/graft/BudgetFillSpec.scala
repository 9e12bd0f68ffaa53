package graft

import graft.queries.BudgetSelect
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[BudgetSelect.fillScalable]]: the banded two-phase prefix sum must
  * keep EXACTLY the rows the naive per-source window keeps — ties,
  * bin-boundary scores, and out-of-range scores included.
  */
class BudgetFillSpec extends SparkSpec {
  import spark.implicits._

  private def naiveKept(perDoc: org.apache.spark.sql.DataFrame,
      budget: Long): Set[Long] = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("cum_before", coalesce(sum(col("n_pieces")).over(w), lit(0L)))
      .filter(col("cum_before") < budget)
      .select(col("doc_id")).as[Long].collect().toSet
  }

  test("banded fill equals the single-window fill on an adversarial frame") {
    // scores engineered for trouble: exact ties within and across sources,
    // values on bin edges, and out-of-range values that clamp
    val rng = new scala.util.Random(11)
    val rows = (0L until 4000L).map { i =>
      val score = (i % 7) match {
        case 0 => 0.25          // heavy tie group
        case 1 => 1.5           // above scoreHi -> clamps into bin 0
        case 2 => -2.0          // below scoreLo -> clamps into last bin
        case 3 => (i % 100) / 100.0 // exact bin-edge values at nBins=100
        case _ => math.rint(rng.nextDouble() * 10000) / 10000.0
      }
      (i, s"src${i % 5}", score, 1L + i % 37)
    }
    val perDoc = rows.toDF("doc_id", "source", "score", "n_pieces")
      .localCheckpoint(true)
    val budgetVal = 9000L
    val budget = Seq(budgetVal).toDF("budget_tokens")
    for (nBins <- Seq(2, 100, 1024)) {
      val banded = BudgetSelect
        .fillScalable(perDoc, budget, scoreLo = 0.0, scoreHi = 1.0, nBins)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(banded == naiveKept(perDoc, budgetVal),
        s"banded fill diverged at nBins=$nBins")
    }
  }

  test("cum_before values match the naive window row-for-row") {
    val perDoc = (0L until 500L)
      .map(i => (i, s"s${i % 3}", (i % 11) / 10.0, 2L + i % 5))
      .toDF("doc_id", "source", "score", "n_pieces").localCheckpoint(true)
    val budget = Seq(100000L).toDF("budget_tokens") // keep everything
    val banded = BudgetSelect
      .fillScalable(perDoc, budget, 0.0, 1.0, nBins = 16)
      .select(col("doc_id"), col("cum_before"))
      .as[(Long, Long)].collect().toMap
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = perDoc
      .withColumn("c", coalesce(sum(col("n_pieces")).over(w), lit(0L)))
      .select(col("doc_id"), col("c")).as[(Long, Long)].collect().toMap
    assert(banded == naive)
  }

  test("rejects out-of-range parameters") {
    val perDoc = Seq((1L, "a", 0.5, 3L)).toDF("doc_id", "source", "score", "n_pieces")
    val budget = Seq(10L).toDF("budget_tokens")
    intercept[IllegalArgumentException](
      BudgetSelect.fillScalable(perDoc, budget, 0.0, 1.0, nBins = 1))
    intercept[IllegalArgumentException](
      BudgetSelect.fillScalable(perDoc, budget, 1.0, 1.0))
  }
}
