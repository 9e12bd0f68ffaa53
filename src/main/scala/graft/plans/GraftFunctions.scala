package graft.plans

import graft.functions.expr.DotProductF
import org.apache.spark.sql.{AnalysisException, Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths to the same registry entry:
  *   - config path: `spark.sql.extensions=graft.plans.GraftExtensions`
  *     (cluster-wide, survives new sessions);
  *   - imperative path: `GraftFunctions.register(spark)` — idempotent,
  *     used by operators so any caller-supplied session works.
  */
/** Shared constructors for the two Spark error shapes graft raises during
  * analysis/planning — one place to absorb a Spark upgrade changing either
  * the positional AnalysisException constructor or the error-class
  * parameter map.
  */
object GraftErrors {
  def fail(msg: String): Nothing =
    throw new AnalysisException(msg, None, None, None, None, Map.empty, Array.empty)

  def wrongNumArgs(name: String, expected: String, actual: Int): Nothing =
    throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}

object GraftFunctions {

  /** (name, implementing class, arity-checked builder). The arity check
    * turns a wrong-argument-count SQL call into the same positioned
    * AnalysisException (WRONG_NUM_ARGS, SQLSTATE 42605) every builtin
    * function raises, instead of an IndexOutOfBoundsException from
    * positional indexing or a raw IllegalArgumentException mid-analysis.
    */
  val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = {
    def checked(name: String, arity: Int)(
        build: Seq[Expression] => Expression): Seq[Expression] => Expression =
      children => {
        if (children.length != arity)
          GraftErrors.wrongNumArgs(name, arity.toString, children.length)
        build(children)
      }
    Seq(
      ("vec_dot", classOf[DotProductF],
        checked("vec_dot", 2)(c => DotProductF(c(0), c(1)))),
      ("minhash_sig", classOf[graft.functions.expr.MinHashSigF],
        checked("minhash_sig", 2)(c =>
          graft.functions.expr.MinHashSigF(c(0), c(1)))),
      ("simhash32", classOf[graft.functions.expr.SimHash32F],
        checked("simhash32", 1)(c => graft.functions.expr.SimHash32F(c(0)))),
      ("char_bigram_counts", classOf[graft.functions.expr.CharBigramCountsF],
        checked("char_bigram_counts", 1)(c =>
          graft.functions.expr.CharBigramCountsF(c(0)))),
      ("word_shingles", classOf[graft.functions.expr.WordShinglesF],
        checked("word_shingles", 2)(c => c(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) =>
            graft.functions.expr.WordShinglesF(c(0), v)
          case other => GraftErrors.fail(
            s"word_shingles argument 2 (n) must be an integer literal, got ${other.sql}")
        })),
      ("gram_hashes", classOf[graft.functions.expr.GramHashesF],
        checked("gram_hashes", 2)(c => c(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
              org.apache.spark.sql.types.IntegerType) =>
            graft.functions.expr.GramHashesF(c(0), v)
          case other => GraftErrors.fail(
            s"gram_hashes argument 2 (k) must be an integer literal, got ${other.sql}")
        })),
      // Spark ships these two for its own runtime row-level filtering but
      // does not register them for users; graft's bloom decontamination
      // ([[graft.operators.BloomDecontaminate]]) surfaces them — a
      // mergeable bloom build + codegen'd probe, no UDF
      ("bloom_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate],
        checked("bloom_agg", 3)(c =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c(0), c(1), c(2)).toAggregateExpression())),
      ("bloom_might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain],
        checked("bloom_might_contain", 2)(c =>
          org.apache.spark.sql.catalyst.expressions
            .BloomFilterMightContain(c(0), c(1)))))
  }

  /** Table-valued functions: (name, doc class, builder to a LogicalPlan).
    * `asof_join` makes the native as-of operator SQL-callable
    * (`SELECT * FROM asof_join('l', 'r', ...)` — see [[AsOfSql]]); the
    * rest expose the Scala-only operators to a SQL prompt — each SQL form
    * returns the operator's OWN plan (see [[SqlTableFunctions]]).
    */
  val tableFunctions: Seq[(String, Class[_],
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    Seq(
      ("asof_join", classOf[AsOfJoinPlan], AsOfSql.builder _),
      ("bm25_search", SqlTableFunctions.getClass,
        SqlTableFunctions.bm25Builder _),
      ("radius_join", SqlTableFunctions.getClass,
        SqlTableFunctions.radiusJoinBuilder _),
      ("points_in_zones", SqlTableFunctions.getClass,
        SqlTableFunctions.pointsInZonesBuilder _),
      ("prefix_similarity_join", SqlTableFunctions.getClass,
        SqlTableFunctions.prefixJoinBuilder _),
      ("semdedup_pairs", SqlTableFunctions.getClass,
        SqlTableFunctions.semDeDupPairsBuilder _),
      ("jl_project", SqlTableFunctions.getClass,
        SqlTableFunctions.jlProjectBuilder _),
      ("sparse_cosine_join", SqlTableFunctions.getClass,
        SqlTableFunctions.sparseCosineBuilder _),
      ("rrf_fuse", SqlTableFunctions.getClass,
        SqlTableFunctions.rrfFuseBuilder _),
      ("pagerank", SqlTableFunctions.getClass,
        SqlTableFunctions.pageRankBuilder _),
      ("bpe_token_counts", SqlTableFunctions.getClass,
        SqlTableFunctions.bpeTokenCountsBuilder _),
      ("unigram_token_counts", SqlTableFunctions.getClass,
        SqlTableFunctions.unigramTokenCountsBuilder _),
      ("quality_scores", SqlTableFunctions.getClass,
        SqlTableFunctions.qualityScoresBuilder _),
      ("heavy_tokens", SqlTableFunctions.getClass,
        SqlTableFunctions.heavyTokensBuilder _),
      ("corpus_drift", SqlTableFunctions.getClass,
        SqlTableFunctions.corpusDriftBuilder _),
      ("kcenter_select", SqlTableFunctions.getClass,
        SqlTableFunctions.kcenterBuilder _),
      ("kmeans_assign", SqlTableFunctions.getClass,
        SqlTableFunctions.kmeansAssignBuilder _),
      ("label_propagation", SqlTableFunctions.getClass,
        SqlTableFunctions.labelPropagationBuilder _),
      ("repetition_stats", SqlTableFunctions.getClass,
        SqlTableFunctions.repetitionStatsBuilder _),
      ("dsir_weights", SqlTableFunctions.getClass,
        SqlTableFunctions.dsirWeightsBuilder _),
      ("mmr_rerank", SqlTableFunctions.getClass,
        SqlTableFunctions.mmrRerankBuilder _),
      ("chat_render", SqlTableFunctions.getClass,
        SqlTableFunctions.chatRenderBuilder _),
      ("loss_mask_spans", SqlTableFunctions.getClass,
        SqlTableFunctions.lossMaskSpansBuilder _))

  def register(spark: SparkSession): Unit = {
    val state = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
    functions.foreach { case (name, _, builder) =>
      state.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    tableFunctions.foreach { case (name, _, builder) =>
      state.tableFunctionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // the TVF yields a bare AsOfJoinPlan — the planner strategy must be
    // installed for it to execute; DeferredResult leaves (pagerank,
    // jl_project, bpe_token_counts, logistic quality_scores,
    // heavy_tokens) need theirs the same way
    AsOf.install(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(DeferredResultStrategy))
      exp.extraStrategies = exp.extraStrategies :+ DeferredResultStrategy
  }

  /** Install graft's optimizer rewrites on an existing session (idempotent).
    * Split from [[register]] so tests can compare the HOF and native forms
    * without the rule collapsing both sides to the same plan.
    */
  def installPlanRewrites(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(RewriteDotProduct))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteDotProduct
  }

  /** Remove the rewrites again (test isolation on a shared session). */
  def removePlanRewrites(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }

  /** Column-API handle for the native dot product; the session must have
    * [[register]] applied (operators call it themselves).
    */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** All k-gram xxhash64 values of a string in one linear pass — see
    * [[graft.functions.expr.GramHashesF]].
    */
  def gramHashes(text: Column, k: Int): Column =
    call_function("gram_hashes", text, org.apache.spark.sql.functions.lit(k))
}

/** `spark.sql.extensions` entry point injecting the native functions and
  * the optimizer rewrites (cluster-wide, survives new sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    GraftFunctions.tableFunctions.foreach { case (name, cls, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOf)
    ext.injectOptimizerRule(_ => PruneAsOfColumns)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => DeferredResultStrategy)
  }
}
