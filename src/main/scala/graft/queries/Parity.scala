package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine rounding for oracle-checked queries:
  * `floor(x * 10^scale + 0.5) / 10^scale`, NOT `round(x, scale)`.
  *
  * Spark's `round` is HALF_UP, DuckDB's is half-even on doubles; any value
  * that can land exactly on the .5 boundary (ratios with power-of-two
  * denominators like 3/32, averages of dyadic doubles) would hash-mismatch.
  * This form is the repo-wide convention — the oracle SQL spells the same
  * arithmetic literally (`FLOOR(x*10000+0.5)/10000.0`), so both engines
  * round identically. One definition here; a precision tweak in one place
  * keeps every query's parity in sync.
  */
object Parity {
  def r(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * f + 0.5) / f
  }
  /** 4-decimal form used by most float aggregates. */
  def r4(c: Column): Column = r(c, 4)
  /** 6-decimal form for small shares/weights (q74). */
  def r6(c: Column): Column = r(c, 6)
}
