package graft

import graft.operators.BloomDecontaminate
import org.apache.spark.sql.functions._

/** [[BloomDecontaminate]]: the no-false-negative contract against the
  * exact overlap set, the measured false-positive rate on a disjoint
  * corpus, and sizing/parameter guards.
  */
class BloomDecontaminateSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Exact contaminated id set: docs sharing >= 1 n-word shingle (q67's
    * broadcast-join form, the operator's exact twin).
    */
  private def exactContaminated(train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame, n: Int): Set[Long] = {
    def grams(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), graft.functions.TextHash.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        explode(graft.functions.TextHash.wordShinglesOf(col("t"), n)).as("g"))
    grams(train).join(grams(test).select("g").distinct(), "g")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
  }

  test("every exact overlap is flagged — no false negatives") {
    val test = docs(
      100L -> "the quick brown fox jumps over the lazy dog tonight",
      101L -> "benchmark question alpha beta gamma delta epsilon zeta eta theta")
    val train = docs(
      0L -> "prefix words then the quick brown fox jumps over the lazy dog tonight",
      1L -> "alpha beta gamma delta epsilon stuck inside another sentence frame",
      2L -> "completely unrelated text about spark shuffles and hash joins here",
      3L -> "benchmark question alpha beta gamma delta epsilon zeta eta theta")
    val exact = exactContaminated(train, test, 5)
    assert(exact == Set(0L, 1L, 3L)) // fixture sanity
    val flagged = BloomDecontaminate
      .contaminationFlags(train, test, "doc_id", "text")
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(flagged), s"missed: ${exact -- flagged}")
    // clean() removes every contaminated doc; survivors are a subset of
    // the exactly-clean docs
    val kept = BloomDecontaminate.clean(train, test, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((kept & exact).isEmpty)
    assert(kept.subsetOf(Set(2L)))
  }

  test("false-positive rate on a disjoint corpus is within the sized fpp") {
    val rnd = new scala.util.Random(11)
    // disjoint vocabularies => zero true overlaps; every flag is a bloom FP
    def corpus(prefix: String, n: Int) = docs((0 until n).map { i =>
      i.toLong -> (0 until 12).map(_ => s"$prefix${rnd.nextInt(5000)}").mkString(" ")
    }: _*)
    val train = corpus("a", 400)
    val test = corpus("b", 400)
    assert(exactContaminated(train, test, 5).isEmpty)
    // ~3200 true grams; 1<<16 bits = 20 bits/gram -> fpp well under 1e-3;
    // per-doc flag probability <= 8 probes * fpp. Assert a generous 2%.
    val fp = BloomDecontaminate
      .contaminationFlags(train, test, "doc_id", "text",
        expectedGrams = 4000, numBits = 1L << 16)
      .filter(col("contaminated")).count()
    assert(fp <= 8, s"unexpectedly many bloom false positives: $fp/400")
  }

  test("rejects non-positive sizing") {
    val d = docs(0L -> "a b c d e f")
    intercept[IllegalArgumentException](
      BloomDecontaminate.contaminationFlags(d, d, "doc_id", "text", shingleWords = 0))
    intercept[IllegalArgumentException](
      BloomDecontaminate.contaminationFlags(d, d, "doc_id", "text", numBits = 0))
  }
}
