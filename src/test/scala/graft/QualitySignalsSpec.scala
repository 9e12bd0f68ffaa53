package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dsir, Mmr, Repetition, UnigramLm}

/** Round-10 quality-signal operators: Gopher repetition stats, DSIR
  * importance weights, MMR greedy re-ranking, and the unigram-LM
  * perplexity scorer. The declared queries (q149–q153) are oracle-checked
  * end-to-end; these tests pin the hand-computable semantics.
  */
class QualitySignalsSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  test("dupNgramStats: fully repetitive vs distinct documents") {
    val docs = Seq(
      (1L, "a b a b a"), // 2-grams: a b, b a, a b, b a — all duplicated
      // 10 distinct 2-char words: no repeated gram, and the top gram's 4
      // chars are exactly 20% of the 20 non-space chars (== threshold,
      // strict > keeps it clean)
      (2L, "xa yb zc wd ve uf tg sh ri qj"),
      (3L, "q")          // < 2 tokens: excluded
    ).toDF("doc_id", "text")
    val out = Repetition.repetitiveFlag(
        Repetition.dupNgramStats(docs, "doc_id", "text", 2))
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    val r1 = out(0)
    assert(r1.getLong(1) === 4L)          // n_grams
    assert(r1.getDouble(2) === 1.0)       // dup_frac: every occurrence repeats
    assert(r1.getString(3) === "a b")     // count tie (2 vs 2) → lexicographic
    // top_frac: 2 occurrences × 2 chars ("ab") / 5 non-space chars
    assert(r1.getDouble(4) === 0.8)
    assert(r1.getBoolean(5))
    val r2 = out(1)
    assert(r2.getLong(1) === 9L && r2.getDouble(2) === 0.0)
    assert(r2.getString(3) === "ri qj") // all-ties → lexicographic argmin
    assert(r2.getDouble(4) === 0.2)
    assert(!r2.getBoolean(5))
  }

  test("native rep_stats row-equals the HOF reference derivation") {
    // the declarative derivation RepStatsF fuses, kept as the executable
    // spec of its contract (dup counting, top-run argmax, tie-breaks)
    def hofStats(docs: org.apache.spark.sql.DataFrame, n: Int) = {
      val toks = filter(split(col("text"), " "), w => w =!= "")
      val base = docs.select(col("doc_id"),
          length(regexp_replace(col("text"), " ", "")).as("nc"), toks.as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col("doc_id"), col("nc"),
          array_sort(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
      val m = size(col("g"))
      def at(i: org.apache.spark.sql.Column) = element_at(col("g"), i)
      val dupOcc = size(filter(sequence(lit(1), m), i =>
        (i > 1 && at(i) === at(i - 1)) || (i < m && at(i) === at(i + 1))))
      val run = aggregate(sequence(lit(1), m),
        struct(lit("").as("bg"), lit(0L).as("bc"), lit(0L).as("cc")),
        (acc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) => {
          val cur = when(i === 1 || at(i) =!= at(i - 1), lit(1L))
            .otherwise(acc.getField("cc") + lit(1L))
          val isNew = cur > acc.getField("bc")
          struct(when(isNew, at(i)).otherwise(acc.getField("bg")).as("bg"),
            when(isNew, cur).otherwise(acc.getField("bc")).as("bc"), cur.as("cc"))
        })
      base.select(col("doc_id"), col("nc"), m.as("m"), dupOcc.as("dup_occ"), run.as("run"))
        .select(col("doc_id"),
          col("m").cast("long").as("n_grams"),
          graft.queries.Parity.r4(col("dup_occ").cast("double") / col("m")).as("dup_frac"),
          col("run").getField("bg").as("top_gram"),
          graft.queries.Parity.r4(col("run").getField("bc")
            * length(regexp_replace(col("run").getField("bg"), " ", ""))
            / col("nc").cast("double")).as("top_frac"))
    }
    import testImplicits._
    val edge = Seq((1L, "a a a a"), (2L, "b a b a"), (3L, "x"),
      (4L, "p  q  p  q"), (5L, "zz zz yy yy zz")).toDF("doc_id", "text")
    for ((docs, label) <- Seq(
        (Tables.documents(spark, sf("sf0.001")), "corpus"),
        (edge, "edges"));
        n <- Seq(2, 3)) {
      val native = graft.operators.Repetition
        .dupNgramStats(docs, "doc_id", "text", n).orderBy("doc_id").collect()
      val hof = hofStats(docs, n).orderBy("doc_id").collect()
      assert(native.length === hof.length, s"$label n=$n")
      native.zip(hof).foreach { case (a, b) => assert(a === b, s"$label n=$n") }
    }
  }

  test("rep_stats on a too-short doc is SQL NULL under codegen, not a poisoned row") {
    // RepStatsF.compute returns null for size(toks) < n; the codegen path
    // must surface that as isNull=true (defineCodeGen would leave
    // isNull=false with a null value and NPE on the struct dereference —
    // the round-10 review finding). No pre-filter here on purpose.
    import testImplicits._
    val df = Seq((1L, Seq("a")), (2L, Seq("a", "b", "a", "b")))
      .toDF("doc_id", "toks")
    import org.apache.spark.sql.graftbridge.Bridge
    val out = df.select(col("doc_id"),
        Bridge.column(graft.functions.expr.RepStatsF(
          Bridge.expression(col("toks")), 2)).as("st"))
      .select(col("doc_id"), col("st").isNull.as("is_null"),
        col("st").getField("n_grams").as("ng"))
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(1) === true)
    assert(out(0).isNullAt(2))
    assert(out(1).getBoolean(1) === false)
    assert(out(1).getLong(2) === 3L)
  }

  test("DSIR: target-resembling docs outrank off-target docs") {
    // target slice speaks {alpha beta}; off-target speaks {gamma delta}
    val docs = Seq(
      (1L, true, "alpha beta alpha beta"),
      (2L, true, "beta alpha beta alpha"),
      (3L, false, "gamma delta gamma delta"),
      (4L, false, "alpha beta alpha gamma"),  // mostly target-like
      (5L, false, "delta gamma delta delta")
    ).toDF("doc_id", "is_t", "text")
    val w = Dsir.importanceWeights(docs, col("is_t"), "doc_id", "text",
        nSlots = 16)
      .orderBy(col("log_weight").desc, col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val byId = w.toMap
    assert(byId(4L) > byId(3L) && byId(4L) > byId(5L),
      s"target-like doc 4 should outrank off-target: $byId")
    assert(byId(1L) > byId(3L))
    // weights are finite and the slot table defined every token
    assert(w.forall { case (_, lw) => !lw.isNaN && !lw.isInfinite })
  }

  test("MMR greedy diversifies away from redundant candidates") {
    val cands = Seq((1L, 0.9), (2L, 0.89), (3L, 0.5))
    val sims = Map((1L, 2L) -> 0.99, (2L, 1L) -> 0.99,
      (1L, 3L) -> 0.0, (3L, 1L) -> 0.0, (2L, 3L) -> 0.0, (3L, 2L) -> 0.0)
    val picks = Mmr.greedy(cands, sims, k = 3, lambda = 0.5).map(_._2)
    // plain top-k would return 1,2,3; MMR demotes 2 (0.99-similar to 1)
    assert(picks === Seq(1L, 3L, 2L))
    // score ties break toward the lower id
    val tied = Mmr.greedy(Seq((7L, 0.5), (4L, 0.5)), Map.empty, 1, 0.7)
    assert(tied.head._2 === 4L)
  }

  test("diversifiedTopK matches greedy on the declared fixture") {
    val out = Mmr.diversifiedTopK(Tables.embeddings(spark, sf("sf0.001")),
      "vec_id", "embedding", queryId = 0L, nCandidates = 20, k = 5,
      lambda = 0.7).collect()
    assert(out.length === 5)
    assert(out.map(_.getInt(0)).toSeq === (1 to 5))
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length === 5 && !ids.contains(0L))
    // rank-1 is the pure-relevance argmax; later scores never exceed λ·rel
    assert(out(0).getDouble(3) ===
      math.floor(0.7 * out(0).getDouble(2) * 1e4 + 0.5) / 1e4)
  }

  test("q154 pipeline card: verdicts partition the population") {
    val card = graft.queries.Catalog.queries("q154_curation_pipeline")(
      spark, sf("sf0.001")).collect()
    assert(card.nonEmpty)
    var docs = 0L
    card.foreach { r =>
      val Seq(nDocs, rep, con, ppl, dsir, kept, tok) =
        (1 to 7).map(r.getLong(_))
      assert(nDocs === rep + con + ppl + dsir + kept,
        s"verdicts must partition source ${r.getString(0)}")
      assert(kept > 0 && tok > 0, "a source with zero kept docs is a bug here")
      docs += nDocs
    }
    // population = every doc_id >= 10 (the benchmark slice is excluded)
    val expect = Tables.documents(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 10).count()
    assert(docs === expect)
  }

  test("q154 card keeps degenerate docs in the population (left-join contract)") {
    // A 1-token training doc has no 3-gram shingle (absent from the
    // contamination frame) and an empty doc is absent from EVERY signal
    // frame; the card's left joins must still count them (round-10
    // review: inner joins silently dropped them from n_docs).
    import testImplicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q154edge").toString
    val docs = (0L until 10L).map(i =>
      (i, s"bench doc number $i with shared words", "en", "srcB", 0L)) ++ Seq(
      (10L, "xx", "en", "srcT", 0L),  // 1 token: no shingles
      (11L, "", "en", "srcT", 0L),    // empty: absent from every signal
      (12L, "normal words appear here normal words appear here", "en", "srcT", 0L),
      (13L, "alpha beta gamma delta epsilon zeta eta theta", "en", "srcT", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val card = graft.queries.Catalog.queries("q154_curation_pipeline")(spark, dir)
      .collect()
    val n = card.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(n.getOrElse("srcT", 0L) === 4L, card.mkString("; "))
    // verdict columns still partition the population
    card.foreach { r =>
      val parts = Seq("n_repetitive", "n_contaminated", "n_ppl_tail",
        "n_low_dsir", "n_kept").map(r.getAs[Long](_)).sum
      assert(parts === r.getAs[Long]("n_docs"), r.toString)
    }
  }

  test("scoreCounts agrees with encodeCounts on piece counts; lp_sum < 0") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val wt = graft.operators.Bpe.wordTypes(docs, "text")
    val (_, lp) = UnigramLm.train(wt, maxPieceLen = 4, vocabSize = 40,
      iters = 1, maxWordLen = 12)
    val enc = UnigramLm.encodeCounts(docs, lp, "doc_id", "text", 4, 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sc = UnigramLm.scoreCounts(docs, lp, "doc_id", "text", 4, 12)
      .collect()
    assert(sc.nonEmpty)
    sc.foreach { r =>
      assert(r.getLong(1) === enc(r.getLong(0)),
        s"n_pieces mismatch for doc ${r.getLong(0)}")
      assert(r.getDouble(2) < 0.0, "summed log-likelihood must be negative")
    }
  }
}
