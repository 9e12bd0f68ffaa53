package graft

import graft.functions.TextHash
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._

/** Regression tests for short-input shingle edges: Spark's sequence(1, 0)
  * DESCENDS (default step -1), which crashed slice / silently mis-shingled
  * substr before the when-guards.
  */
class ShingleEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("word shingles of docs shorter than n are empty, not an error") {
    val df = Seq((1L, "one two"), (2L, "a"), (3L, ""), (4L, "x y z w")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextHash.wordShingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).isEmpty && out(2L).isEmpty && out(3L).isEmpty)
    assert(out(4L) == Seq("x y z", "y z w"))
  }

  test("char shingles of short texts are empty, not wrong") {
    val df = Seq((1L, "ab"), (2L, ""), (3L, "abcd")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextHash.charShingles($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L) == Seq("abc", "bcd"))
  }

  test("native word_shingles row-equals the higher-order reference form") {
    // the pre-round-10 HOF derivation, kept here as the executable spec of
    // WordShinglesF's contract (order, dedup, short-input, null-token)
    def hofForm(toks: org.apache.spark.sql.Column, n: Int) =
      array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))
          .otherwise(array().cast("array<string>")))
    val rng = new scala.util.Random(11L)
    // incl. empty + spacey + NULL tokens (concat_ws skips nulls; n=1 maps
    // a null token to "" in both forms)
    val vocab = Array("a", "b", "ab", "ba", "aa", "", "x y", null)
    val rows = (0 until 400).map { i =>
      (i.toLong, Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.length))))
    } :+ (400L, Seq.empty[String])
    val df = rows.toDF("id", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = df.select($"id",
          TextHash.wordShinglesOf($"toks", n).as("native"),
          hofForm($"toks", n).as("hof"))
        .as[(Long, Seq[String], Seq[String])].collect()
      both.foreach { case (id, nat, hof) =>
        assert(nat == hof, s"id=$id n=$n native=$nat hof=$hof")
      }
    }
    // SQL registration path
    graft.plans.GraftFunctions.register(spark)
    df.createOrReplaceTempView("shingle_edge_v")
    val viaSql = spark.sql(
      "SELECT id, word_shingles(toks, 2) AS sh FROM shingle_edge_v ORDER BY id")
      .as[(Long, Seq[String])].collect()
    val viaCol = df.select($"id", TextHash.wordShinglesOf($"toks", 2).as("sh"))
      .orderBy($"id").as[(Long, Seq[String])].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    spark.catalog.dropTempView("shingle_edge_v")
  }

  test("minhash pipeline survives short and null documents in the corpus") {
    val docs = Seq(
      (1L, Some("the quick brown fox jumps over the lazy dog")),
      (2L, Some("the quick brown fox jumps over the lazy dog")),
      (3L, Some("hi")), (4L, Some("")),
      (5L, None), (6L, None)).toDF("doc_id", "text")
    val lsh = MinHashLSH(numHashes = 12, numBands = 3, shingleSize = 3)
    val pairs = lsh.candidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // the real dup still found
    // shorts: no shingles -> no buckets; nulls: null signature -> md5("")
    // band hash, excluded by the constant filter
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L))
  }
}
