package graft

import graft.streaming.IntervalState
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit + property coverage of the shared interval-list machinery
  * ([[IntervalState]]) — the boundary semantics both stateful
  * sessionizers now depend on (round-10 review: these rules used to live
  * as two verbatim copies; this spec pins the single source of truth).
  * Elements are (start, last, payload-string) triples; merge concatenates
  * payloads in (left, right) order like the turn-buffer merge.
  */
class IntervalStateSpec extends AnyFunSuite {

  private type Iv = (Long, Long, String)
  private def ins(ss: Seq[Iv], t: Long, p: String, gap: Long): Seq[Iv] =
    IntervalState.insert(ss, (t, t, p), gap)(
      _._1, _._2, (a, b) => (a._1, math.max(a._2, b._2), a._3 + b._3))

  test("inserting at exactly the gap merges (inclusive gap)") {
    val out = ins(Seq((0L, 10L, "a")), 10L + 5L, "b", gap = 5L)
    assert(out === Seq((0L, 15L, "ab")))
    // one past the gap stays separate
    val out2 = ins(Seq((0L, 10L, "a")), 10L + 6L, "b", gap = 5L)
    assert(out2 === Seq((0L, 10L, "a"), (16L, 16L, "b")))
  }

  test("one insertion can bridge its two neighbors into a single interval") {
    val out = ins(Seq((0L, 10L, "a"), (20L, 30L, "c")), 15L, "b", gap = 5L)
    assert(out === Seq((0L, 30L, "abc")))
  }

  test("sweep is strict: a deadline exactly AT the watermark stays open") {
    val ss = Seq((0L, 10L, "a"))
    // wm == last + gap -> still open (a boundary event may yet merge)
    assert(IntervalState.sweep(ss, 15L, 5L)(_._2) === (Seq(), ss))
    // wm one past -> closed
    assert(IntervalState.sweep(ss, 16L, 5L)(_._2) === (ss, Seq()))
  }

  test("timeout clamps strictly past the watermark") {
    assert(IntervalState.timeoutUs(Seq((0L, 10L, "a")), 100L, 5L)(_._2) === 101L)
    assert(IntervalState.timeoutUs(Seq((0L, 10L, "a")), 3L, 5L)(_._2) === 15L)
  }

  test("tsToUs/usToTs round-trip exactly, including sub-ms and pre-epoch") {
    val cases = Seq(0L, 1L, 999L, 1000L, 1001L, 123456789L,
      -1L, -999L, -1000L, -1234567L, 1704067200123456L)
    cases.foreach { us =>
      assert(IntervalState.tsToUs(IntervalState.usToTs(us)) === us, s"us=$us")
    }
  }

  test("property: any insertion order yields the same session partition as a batch gap-scan") {
    val gen = for {
      n <- Gen.choose(1, 12)
      ts <- Gen.listOfN(n, Gen.choose(0L, 200L))
      gap <- Gen.choose(1L, 40L)
    } yield (ts, gap)
    val p = Prop.forAll(gen) { case (ts, gap) =>
      // streaming: fold in the GIVEN (arbitrary) order
      val folded = ts.zipWithIndex.foldLeft(Seq.empty[Iv]) { case (acc, (t, i)) =>
        ins(acc, t, s"[$t]", gap)
      }
      // batch: sort, split on gap
      val sorted = ts.sorted
      val batch = sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, t) =>
        if (t - acc.last.last <= gap) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      val foldedSpans = folded.map(s => (s._1, s._2))
      val batchSpans = batch.map(g => (g.head, g.last))
      foldedSpans == batchSpans
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }
}
