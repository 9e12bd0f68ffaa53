package graft

import graft.operators.SparseCosineJoin
import org.apache.spark.sql.functions._

/** [[SparseCosineJoin]] (q117): hand-computed cosines, the df cap's
  * capped-space-exactness contract, and the Zipf-corpus join-volume
  * reduction that is the operator's scale argument.
  */
class SparseCosineJoinSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-computed TF-IDF cosines on a 3-doc corpus") {
    val out = SparseCosineJoin.pairs(
      docs(0L -> "x x y", 1L -> "x z", 2L -> "y z z"), "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        math.floor(r.getAs[Double]("cos") * 1e4 + 0.5) / 1e4)
      .toMap
    // idf = ln(3/2) for every term; the idf factor cancels in each cosine:
    // cos(0,1) = 2/sqrt(5*2*... ) — worked through: 2/sqrt(10), 1/5, 2/sqrt(10)
    assert(out == Map((0L, 1L) -> 0.6325, (0L, 2L) -> 0.2, (1L, 2L) -> 0.6325))
  }

  test("duplicate documents score exactly cosine 1") {
    val out = SparseCosineJoin.pairs(
      docs(0L -> "a b c a", 1L -> "a b c a", 2L -> "q r s"), "doc_id", "text")
      .collect()
    val dup = out.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 1L)
    assert(dup.isDefined && math.abs(dup.get.getAs[Double]("cos") - 1.0) < 1e-12)
    // (0,2)/(1,2) share no term — no row at all, not a zero row
    assert(out.length == 1)
  }

  /** Seeded Zipfian corpus: term `i` of a 200-term vocab drawn with
    * probability ∝ 1/(i+1) — a handful of stop terms dominate token mass,
    * like real text and unlike the 31-word testdata corpus.
    */
  private def zipfCorpus(nDocs: Int, docLen: Int) = {
    val rnd = new scala.util.Random(42)
    val weights = (0 until 200).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = { val u = rnd.nextDouble() * total; cum.indexWhere(u <= _) }
    docs((0 until nDocs).map { d =>
      d.toLong -> (0 until docLen).map(_ => s"t${draw()}").mkString(" ")
    }: _*)
  }

  test("df cap equals exact cosine of the stop-term-free space") {
    val corpus = zipfCorpus(nDocs = 80, docLen = 30)
    val frac = 0.25
    val capped = SparseCosineJoin.pairs(corpus, "doc_id", "text", maxDfFrac = frac)
    // manually delete stop terms from the TEXT, then run uncapped: if the
    // capped result is "the exact cosine of the capped space", the two
    // must agree to the last bit of 4-decimal rounding
    val stop = corpus
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df") > frac * 80).select("t")
      .collect().map(_.getString(0)).toSet
    val cleaned = corpus.select(col("doc_id"),
      array_join(filter(split(col("text"), " "),
        t => !t.isin(stop.toSeq.map(lit(_)): _*)), " ").as("text"))
    val manual = SparseCosineJoin.pairs(cleaned, "doc_id", "text")
    def canon(f: org.apache.spark.sql.DataFrame) =
      f.select(col("id_a"), col("id_b"), graft.queries.Parity.r4(col("cos")).as("c"))
        .orderBy("id_a", "id_b").collect().toSeq
    assert(canon(capped) == canon(manual))
  }

  test("df cap collapses the Zipf-corpus join volume") {
    val corpus = zipfCorpus(nDocs = 80, docLen = 30)
    // join volume is sum(df^2) over kept terms — measure it directly
    val df = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    def volume(frame: org.apache.spark.sql.DataFrame): Long =
      frame.agg(sum(col("df") * col("df"))).collect()(0).getLong(0)
    val uncapped = volume(df)
    val capped = volume(df.filter(col("df") <= 0.25 * 80))
    assert(capped * 5 < uncapped,
      s"expected >5x volume cut, got $uncapped -> $capped")
  }

  test("auto default prunes stop terms on a Zipfian corpus") {
    // n = 1000 puts the auto cap in the majority-rule regime:
    // max(256, min(500, 64*sqrt(1000)=2023)) = 500 = 0.5*n — so the default
    // must equal an explicit maxDfFrac = 0.5 run and differ from uncapped
    // (the Zipf head terms have df ~ n > 500).
    val corpus = zipfCorpus(nDocs = 1000, docLen = 30)
    def canon(f: org.apache.spark.sql.DataFrame) =
      f.select(col("id_a"), col("id_b"), graft.queries.Parity.r4(col("cos")).as("c"))
        .orderBy("id_a", "id_b").collect().toSeq
    val auto = canon(SparseCosineJoin.pairs(corpus, "doc_id", "text"))
    val half = canon(SparseCosineJoin.pairs(corpus, "doc_id", "text", maxDfFrac = 0.5))
    val uncapped = canon(SparseCosineJoin.pairs(corpus, "doc_id", "text", maxDfFrac = 1.0))
    assert(auto == half, "auto default must equal the majority-rule cap at n=1000")
    assert(auto != uncapped, "auto default must actually prune the Zipf head")
  }

  test("auto default never prunes below the 256-df floor (small corpora exact)") {
    // every term here has df = 2 > n/2 = 1.5 — the majority rule alone would
    // empty the space; the 256 floor must keep the corpus exact instead
    val out = SparseCosineJoin.pairs(
      docs(0L -> "a b c a", 1L -> "a b c a", 2L -> "q r s"), "doc_id", "text")
      .collect()
    assert(out.length == 1 &&
      math.abs(out.head.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("salted join composes exactly: identical pairs to the unsalted plan") {
    // saltDfAbove=2 forces multi-salt keys for every term with df > 2, so
    // this exercises both arms of the salt (rare terms S=1, hot terms
    // S up to 256) on a corpus with repeated shared terms
    val corpus = docs((0L until 40L).map(i =>
      i -> s"hot t${i % 7} u${i % 13}"): _*)
    def canon(saltAbove: Int) = SparseCosineJoin.pairs(
      corpus, "doc_id", "text", saltDfAbove = saltAbove)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        math.floor(r.getAs[Double]("cos") * 1e6 + 0.5) / 1e6)
      .toMap
    val unsalted = canon(Int.MaxValue)
    assert(unsalted.nonEmpty)
    assert(canon(2) == unsalted)
  }

  test("matches a plain-Scala brute-force reference on random corpora (salted)") {
    // independent of the DuckDB oracle: uncapped TF-IDF cosine recomputed
    // naively in memory; saltDfAbove=3 forces multi-salt join keys
    for (seed <- Seq(3, 17)) {
      val rng = new scala.util.Random(seed)
      val vocab = Array("a", "b", "c", "d", "e", "f", "g")
      val corpus = (0L until 50L).map { i =>
        i -> Array.fill(3 + rng.nextInt(8))(vocab(rng.nextInt(vocab.length)))
          .mkString(" ")
      }
      val n = corpus.length.toDouble
      val tf = corpus.map { case (id, text) =>
        id -> text.split(" ").groupBy(identity).map { case (t, xs) => t -> xs.length }
      }.toMap
      val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size }
      val wts = tf.map { case (id, m) =>
        id -> m.map { case (t, c) => t -> c * math.log(n / df(t)) }
      }
      def norm(m: Map[String, Double]) = math.sqrt(m.values.map(x => x * x).sum)
      val expected = (for {
        a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
        shared = wts(a).keySet intersect wts(b).keySet if shared.nonEmpty
      } yield {
        val dp = shared.toSeq.map(t => wts(a)(t) * wts(b)(t)).sum
        (a, b) -> math.floor(dp / (norm(wts(a)) * norm(wts(b))) * 1e6 + 0.5) / 1e6
      }).toMap
      val got = SparseCosineJoin.pairs(
          docs(corpus: _*), "doc_id", "text", maxDfFrac = 1.0, saltDfAbove = 3)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          math.floor(r.getAs[Double]("cos") * 1e6 + 0.5) / 1e6)
        .toMap
      assert(got == expected, s"seed $seed diverged from the brute-force reference")
    }
  }

  test("rejects out-of-range parameters") {
    val d = docs(0L -> "a")
    intercept[IllegalArgumentException](
      SparseCosineJoin.pairs(d, "doc_id", "text", maxDfFrac = 0.0))
    intercept[IllegalArgumentException](
      SparseCosineJoin.pairs(d, "doc_id", "text", minCos = 1.5))
  }
}
