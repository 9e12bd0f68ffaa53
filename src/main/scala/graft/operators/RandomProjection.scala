package graft.operators

import graft.plans.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Johnson–Lindenstrauss random projection (Achlioptas 2003, "Database-
  * friendly random projections"): compress an embedding column d → m
  * dimensions with a ±1/√m Rademacher matrix. Pairwise squared distances
  * are preserved in expectation (E[‖Rx‖²] = ‖x‖²) with relative error
  * concentrating as O(1/√m) — the standard cheap pre-step before ANN
  * indexing or near-dup scoring when the raw embedding width dominates
  * shuffle and memory cost (a 4× narrower vector is a 4× smaller
  * exchange in every downstream cluster-keyed join).
  *
  * Scale shape: the matrix is a LITERAL (m×d doubles — 8 KB at 16×64,
  * still <1 MB at 256×512), so the projection is a pure per-row map of
  * m·d fused multiply-adds inside whole-stage codegen: no shuffle, no
  * broadcast join, no UDF. At 100 TB this pipelines with the parquet
  * scan.
  *
  * Sign determinism: entry (j,i) draws its sign from the parity of the
  * first hex nibble of md5(j·d + i). md5 gives crypto-quality mixing —
  * measured distortion on the test corpus is indistinguishable from
  * seeded-PRNG signs (DESIGN.md §4) — while being exactly replicable in
  * ANY engine with an md5 function (the q55 simhash trick), which is what
  * lets q114's DuckDB oracle regenerate the identical matrix from scratch.
  * A linear-congruential parity formula was tried first and REJECTED:
  * its rows are linearly correlated and pairwise distortion measured ~2×
  * worse than random (mean ratio fine at 1.00, but only 47% of pairs
  * within ±0.5 vs 84% for md5/random signs at m=16).
  */
object RandomProjection {

  /** The ±1/√m Rademacher matrix, rows = output dims. Deterministic in
    * (m, d) — no seed, no state; both engines regenerate it exactly.
    */
  def signMatrix(m: Int, d: Int): Seq[Seq[Double]] = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val inv = 1.0 / math.sqrt(m.toDouble)
    (0 until m).map { j =>
      (0 until d).map { i =>
        val hash = md5.digest(String.valueOf(j * d + i).getBytes("UTF-8"))
        val nibble = (hash(0) >> 4) & 0xf
        if (nibble % 2 == 0) inv else -inv
      }
    }
  }

  /** Project `vecCol` (array<float|double>, fixed width d probed from the
    * first row) to an m-wide array<double> named `proj`, keeping `idCol`.
    * Width mismatches surface as null sums from vec_dot's length check —
    * callers with ragged input should validate upstream (the testdata
    * tables are fixed-width by construction).
    *
    * Physical form: one native `vec_dot` per output dim over the literal
    * matrix row — m codegen'd loops fused with the scan. The earlier
    * `transform(matrix, aggregate(zip_with(...)))` form walked three
    * INTERPRETED lambda closures per element (m·d of them per row; Catalyst
    * does not CSE or codegen into lambda bodies), and the other extreme —
    * unrolling the m·d multiply-adds as one expression tree — measured 12×
    * WORSE in optimizer/codegen time (r18 reverted experiment). vec_dot is
    * bit-identical to both by construction: identical element upcasts,
    * identical left-to-right accumulation from 0.0, identical NULL
    * semantics (length mismatch or null element → NULL).
    */
  def project(df: DataFrame, idCol: String, vecCol: String, m: Int): DataFrame = {
    require(m >= 1, s"target dim m must be >= 1, got $m")
    // the d probe is an eager one-row pruned scan: the literal matrix
    // needs the width at plan-construction time (SQL callers via
    // jl_project pay it at analysis — documented there)
    val probe = df.select(size(col(vecCol))).limit(1).collect()
    require(probe.nonEmpty, "project on an empty frame — width is unknowable")
    require(!probe(0).isNullAt(0), s"first $vecCol is null")
    val d = probe(0).getInt(0)
    require(m <= d, s"projection must compress: m=$m > d=$d")
    GraftFunctions.register(df.sparkSession)
    // float|double arrays feed vec_dot directly (it upcasts per element,
    // exactly the cast-then-multiply the HOF form did); anything else gets
    // the explicit array cast so vec_dot's type check stays loud
    val v = df.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => col(vecCol)
      case _ => col(vecCol).cast("array<double>")
    }
    val dots = signMatrix(m, d).map(r => GraftFunctions.vecDot(v, typedLit(r)))
    df.select(col(idCol), array(dots: _*).as("proj"))
  }
}
