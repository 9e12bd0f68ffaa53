package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

/** [[Drift]] (q127): PSI reads ~0 on identical snapshots, fires on
  * planted shift, stays finite through empty buckets, and the real
  * corpus's i.i.d. split reads stable.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psiVal(df: org.apache.spark.sql.DataFrame): Double =
    df.collect()(0).getAs[Double]("psi")

  test("identical snapshots score PSI ~ 0 (numeric and categorical)") {
    val snap = (0 until 1000).map(i => (i.toLong, (i % 400).toDouble, s"l${i % 5}"))
      .toDF("id", "v", "cat")
    assert(math.abs(psiVal(Drift.numericPsi(snap, snap, "v", 0, 400, 10))) < 1e-9)
    assert(math.abs(psiVal(Drift.categoricalPsi(snap, snap, "cat"))) < 1e-9)
  }

  test("a planted mean shift fires the conventional 0.25 action threshold") {
    val a = (0 until 2000).map(i => (i.toLong, 100.0 + i % 100)).toDF("id", "v")
    val shifted = (0 until 2000).map(i => (i.toLong, 250.0 + i % 100)).toDF("id", "v")
    val psi = psiVal(Drift.numericPsi(a, shifted, "v", 0, 400, 8))
    assert(psi > 0.25, s"shifted distribution must alarm, psi=$psi")
  }

  test("a vanished category stays finite via smoothing and still alarms") {
    val a = (0 until 900).map(i => (i.toLong, s"l${i % 3}")).toDF("id", "cat")
    val b = (0 until 900).map(i => (i.toLong, s"l${i % 2}")).toDF("id", "cat")
    val psi = psiVal(Drift.categoricalPsi(a, b, "cat"))
    assert(!psi.isNaN && !psi.isInfinite && psi > 0.25, s"psi=$psi")
  }

  test("out-of-range values clamp into the edge buckets, not a crash") {
    val a = Seq((0L, -50.0), (1L, 1e9), (2L, 200.0)).toDF("id", "v")
    val psi = psiVal(Drift.numericPsi(a, a, "v", 0, 400, 4))
    assert(math.abs(psi) < 1e-9)
  }

  test("the real corpus's even/odd split stays under the action threshold") {
    // PSI carries a small-sample bias: under NO drift its expectation is
    // ≈ B·(1/n_a + 1/n_b) (each share is itself noisy), which at 250 docs
    // per side with 12 buckets is ≈ 0.1 — the conventional "< 0.1 stable"
    // reading assumes production-sized snapshots. The i.i.d. split must
    // stay under the 0.25 ACTION threshold; the planted-shift test above
    // shows genuine drift clears it.
    val docs = Tables.documents(spark, sf("sf0.01"))
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val nPsi = psiVal(Drift.numericPsi(a, b, "n_chars", 0, 600, 12))
    val lPsi = psiVal(Drift.categoricalPsi(a, b, "lang"))
    assert(nPsi >= 0 && nPsi < 0.25, s"n_chars psi=$nPsi")
    assert(lPsi >= 0 && lPsi < 0.25, s"lang psi=$lPsi")
  }

  test("null values form ONE matched category, not two eps-smoothed ghosts") {
    // Identical snapshots with 30% nulls: a null-naive full-outer join
    // (key = key never matches NULL) would see each side's null bucket as
    // unmatched and spike the PSI; the sentinel coalesce must keep it ~0.
    val snap = (0 until 1000)
      .map(i => (i.toLong, if (i % 10 < 3) None else Some(s"l${i % 4}")))
      .toDF("id", "cat")
    assert(math.abs(psiVal(Drift.categoricalPsi(snap, snap, "cat"))) < 1e-9)
    // and a null-share SHIFT is real drift the metric must still see
    val fewNulls = (0 until 1000)
      .map(i => (i.toLong, if (i % 100 < 1) None else Some(s"l${i % 4}")))
      .toDF("id", "cat")
    assert(psiVal(Drift.categoricalPsi(snap, fewNulls, "cat")) > 0.1)
  }

  test("rejects out-of-range parameters") {
    val d = Seq((0L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException](Drift.numericPsi(d, d, "v", 0, 400, 1))
    intercept[IllegalArgumentException](Drift.numericPsi(d, d, "v", 5, 5, 4))
  }
}
