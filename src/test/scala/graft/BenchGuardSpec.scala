package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-query bench regression guard (round-10, VERDICT r9 task 6).
  *
  * The timing comparison itself runs in [[Bench]] guard mode
  * (`SPARK_GRAFT_BENCH_BANDS=bench/bands_sf0.1.json sbt "runMain
  * graft.Bench"`) where the environment matches the recording — running a
  * timed sweep inside the shared, contended test JVM would make the guard
  * order- and load-dependent. What belongs in `sbt test` is everything
  * deterministic: the band parser, the drift rule, and the contract that
  * the committed band file stays in lockstep with the declared catalog
  * (a new query without a recorded band, or a stale band for a deleted
  * query, fails here — so the machine-checked evidence chain cannot
  * silently rot).
  */
class BenchGuardSpec extends AnyFunSuite {

  private val bandPath = java.nio.file.Paths.get("bench/bands_sf0.1.json")

  test("parseBands round-trips the bench spread format") {
    val s = """{"q01_scan":[0.123,0.456],"q147_unigram_train":[1.0,2.5]}"""
    val bands = Bench.parseBands(s)
    assert(bands === Map(
      "q01_scan" -> (0.123, 0.456),
      "q147_unigram_train" -> (1.0, 2.5)))
  }

  test("drift rule: 2x factor with an absolute floor, failed runs exempt") {
    val bands = Map("a" -> (0.1, 0.2), "b" -> (1.0, 2.0), "c" -> (0.02, 0.05))
    // a: 0.2 max -> threshold max(0.4, 0.45) = 0.45; 0.44 passes, 0.46 fails
    assert(Bench.regressions(Seq("a" -> 0.44), bands).isEmpty)
    assert(Bench.regressions(Seq("a" -> 0.46), bands).nonEmpty)
    // b: threshold max(4.0, 2.25) = 4.0
    assert(Bench.regressions(Seq("b" -> 3.9), bands).isEmpty)
    assert(Bench.regressions(Seq("b" -> 4.1), bands) ===
      Seq(("b", 4.1, 2.0)))
    // c: tiny query — floor dominates; 0.09 s (>2x band) is still noise
    assert(Bench.regressions(Seq("c" -> 0.09), bands).isEmpty)
    // unknown query or failed (-1) median: never a regression
    assert(Bench.regressions(Seq("zzz" -> 99.0, "a" -> -1.0), bands).isEmpty)
  }

  test("resweep trigger: >25% spread among WARM sweeps (sweep 1 is structurally cold)") {
    // BENCH_r12 signature: contended warm sweeps disagree wildly
    assert(Bench.needsResweep(Seq(115.0, 230.0, 170.0)))
    // idle run: warm sweeps within the documented run-to-run band
    assert(!Bench.needsResweep(Seq(115.0, 118.0, 121.0)))
    // the normal idle shape — sweep 1 elevated by artifact builds + JIT,
    // warm sweeps agreeing — must NOT fire (else every run pays a 4th
    // sweep and the flag stops witnessing contention)
    assert(!Bench.needsResweep(Seq(140.0, 106.0, 104.0)))
    // boundary among warm sweeps: exactly 25% over does not fire (strict >)
    assert(!Bench.needsResweep(Seq(500.0, 100.0, 125.0)))
    assert(Bench.needsResweep(Seq(500.0, 100.0, 125.001)))
    // fewer than two warm sweeps: no spread to judge
    assert(!Bench.needsResweep(Seq(100.0, 125.0)))
    assert(!Bench.needsResweep(Seq(100.0)))
    assert(!Bench.needsResweep(Nil))
  }

  test("guard statistic is the WARM median (cold sweep 1 dropped when >1 sweep ran)") {
    // the round-15 advice scenario: REPEATS=2, a query with a ~106 s
    // one-time artifact build and a 0.5 s warm cost. The all-sweep median
    // would read 53.25 s against a ~0.6 s warm-band ceiling — a guaranteed
    // false regression; the guard statistic must be the warm 0.5 s.
    assert(Bench.guardMedian(Seq(106.0, 0.5)) === 0.5)
    assert(Bench.guardMedian(Seq(106.0, 0.5, 0.46)) === 0.48)
    // single sweep: no warm subset — the cold observation passes through
    // (main refuses band-guard mode at repeats < 2, so this value is never
    // compared to a warm band; it still backs the headline fields)
    assert(Bench.guardMedian(Seq(106.0)) === 106.0)
    // a failed warm observation poisons the query, same as the headline rule
    assert(Bench.guardMedian(Seq(0.5, -1.0, 0.5)) === -1.0)
    // a failed COLD observation also poisons via the headline failed-count
    // path; guardMedian itself only judges the warm subset
    assert(Bench.guardMedian(Seq(-1.0, 0.5)) === 0.5)
    assert(Bench.guardMedian(Nil) === -1.0)
  }

  test("calibration workload is pinned (changing the loop invalidates the nominal)") {
    // The recorded CalibNominalSecs (0.44 s idle) is only meaningful while
    // the probe's workload stays bit-identical. This pin is the hash of the
    // full 200M-iteration mix measured when the nominal was recorded
    // (2026-08-15); any edit to calibWork or CalibIters fails here and
    // forces a re-measured nominal.
    assert(Bench.CalibIters === 200000000L)
    assert(Bench.calibWork(Bench.CalibIters) === -3056747973042344347L)
    // determinism at a cheap size too (the in-probe JIT warm pass)
    assert(Bench.calibWork(1000L) === Bench.calibWork(1000L))
  }

  test("normalizedTotal applies nominal/median(calib) and passes poisoned totals through") {
    // the r14 incident shape: raw 142.66 s on a host measuring 25% slow
    // (calib 0.55 vs nominal 0.44) normalizes to 114.128 — under the gate
    assert(Bench.normalizedTotal(142.66, Seq(0.55, 0.55, 0.55), nominal = 0.44) === 114.128)
    // median across sweeps, not mean: one contended probe doesn't skew it
    assert(Bench.normalizedTotal(100.0, Seq(0.44, 0.44, 4.4), nominal = 0.44) === 100.0)
    // idle machine: correction ~1
    assert(Bench.normalizedTotal(100.0, Seq(0.44), nominal = 0.44) === 100.0)
    // poisoned total (failed queries) must stay poisoned
    assert(Bench.normalizedTotal(-1.0, Seq(0.44)) === -1.0)
    // no valid probe observations: raw passes through unchanged
    assert(Bench.normalizedTotal(100.0, Nil) === 100.0)
    assert(Bench.normalizedTotal(100.0, Seq(-1.0, 0.0)) === 100.0)
    // result is r3-rounded
    assert(Bench.normalizedTotal(100.0, Seq(0.66), nominal = 0.44) === 66.667)
  }

  test("committed band file exists, parses, and covers the declared catalog") {
    assert(java.nio.file.Files.exists(bandPath),
      s"band file $bandPath missing — record with SPARK_GRAFT_BENCH_RECORD_BANDS")
    val bands = Bench.parseBands(new String(
      java.nio.file.Files.readAllBytes(bandPath),
      java.nio.charset.StandardCharsets.UTF_8))
    val declared = graft.queries.Catalog.all.map(_.name).toSet
    val missing = declared -- bands.keySet
    val stale = bands.keySet -- declared
    assert(missing.isEmpty,
      s"queries with no recorded band (re-record bands): ${missing.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"bands for queries no longer declared: ${stale.toSeq.sorted.mkString(", ")}")
    bands.foreach { case (n, (lo, hi)) =>
      assert(lo >= 0 && hi >= lo, s"malformed band for $n: [$lo,$hi]")
    }
  }
}
