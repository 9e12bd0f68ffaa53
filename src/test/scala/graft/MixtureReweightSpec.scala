package graft

import graft.operators.MixtureReweight
import org.apache.spark.sql.functions._

class MixtureReweightSpec extends SparkSpec {
  import spark.implicits._

  private def base(rows: (String, Double, Double)*) =
    rows.toDF("source", "w0", "m")

  private def trajMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(Int, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("two-source trajectory matches the hand-computed MW updates") {
    val t = trajMap(MixtureReweight.reweight(
      base(("a", 0.5, 1.0), ("b", 0.5, 0.0)),
      "source", "w0", "m", iters = 2, eta = 0.5, cap = 1.0))
    assert(t((0, "a")) == 0.5 && t((0, "b")) == 0.5)
    // iter1: mbar=0.5 -> raw=(0.625, 0.375), tot=1
    assert(t((1, "a")) == 0.625 && t((1, "b")) == 0.375)
    // iter2: mbar=0.625 -> raw=(0.7421875, 0.2578125), r6-snapped
    assert(t((2, "a")) == 0.742188 && t((2, "b")) == 0.257813)
  }

  test("the cap clips the winning source before renormalization") {
    val t = trajMap(MixtureReweight.reweight(
      base(("a", 0.5, 1.0), ("b", 0.5, 0.0)),
      "source", "w0", "m", iters = 2, eta = 0.5, cap = 0.7))
    // iter2 raw a = 0.7421875 clips to 0.7; tot = 0.9578125
    assert(t((2, "a")) == 0.730832, t.toString)
    assert(t((2, "b")) == 0.269168, t.toString)
  }

  test("weights stay normalized (within snap grid) and positive") {
    val t = MixtureReweight.reweight(
      base(("a", 0.3, 0.9), ("b", 0.4, 0.1), ("c", 0.3, 0.5)),
      "source", "w0", "m", iters = 8, eta = 1.0, cap = 0.8)
    val sums = t.groupBy("iter").agg(sum("weight").as("s"))
      .as[(Int, Double)].collect().toMap
    (0 to 8).foreach(i =>
      assert(math.abs(sums(i) - 1.0) < 1e-4, s"iter $i sum ${sums(i)}"))
    assert(t.filter(col("weight") <= 0).isEmpty)
    // the strongest source must gain weight from its baseline
    val a = trajMap(t)
    assert(a((8, "a")) > a((0, "a")))
  }

  test("a collapsing source floors at the snap grid instead of dying at 0") {
    // eta = 1 with m = 0 vs a dominant m = 1 source decays the loser
    // geometrically; before the 1e-6 floor the r6 snap eventually
    // produced exactly 0 — and a multiplicative update can never revive
    // a zeroed weight. The floor must hold it at the grid.
    val t = trajMap(MixtureReweight.reweight(
      base(("a", 0.5, 1.0), ("b", 0.5, 0.0)),
      "source", "w0", "m", iters = 12, eta = 1.0, cap = 1.0))
    assert(t((12, "b")) == 1e-6, s"collapsed weight: ${t((12, "b"))}")
    assert(t.values.forall(_ > 0.0))
  }

  test("input contracts are guarded") {
    intercept[IllegalArgumentException] {
      MixtureReweight.reweight(base(("a", 0.5, 1.5)),
        "source", "w0", "m", 1, 0.5, 0.5) // metric > 1
    }
    intercept[IllegalArgumentException] {
      MixtureReweight.reweight(base(("a", 0.0, 0.5)),
        "source", "w0", "m", 1, 0.5, 0.5) // nonpositive baseline
    }
    intercept[IllegalArgumentException] {
      MixtureReweight.reweight(base(("a", 0.5, 0.5)),
        "source", "w0", "m", 0, 0.5, 0.5) // zero iters
    }
  }
}
