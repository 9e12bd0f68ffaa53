package graft

import graft.queries.Catalog

/** Executable plan audit: the scale-critical physical-plan properties the
  * design argues for (DESIGN.md §2) asserted on the flagship queries, so a
  * regression that silently drops a pushdown, un-broadcasts a dim join, or
  * turns top-K into a global sort fails CI — not a 100x-scale run.
  * Assertions read the FINAL adaptive plan (AQE's toString also prints the
  * initial plan; split it off first).
  */
class PlanAuditSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = Catalog.queries(name)(spark, sf("sf0.01"))
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def scanLines(plan: String): String =
    plan.linesIterator.filter(_.contains("FileScan")).mkString("\n")

  test("q01: sargable date range reaches the scan; unused columns pruned") {
    val scans = scanLines(finalPlan("q01_scan_filter_project"))
    assert(scans.contains("isnotnull(l_shipdate"), scans)
    assert(scans.contains("l_shipdate#") && scans.contains(">= 1995-01-01"), scans)
    // projection needs 6 of 11 lineitem columns — the rest must not be read
    assert(!scans.contains("l_tax") && !scans.contains("l_returnflag"), scans)
  }

  test("q03: all dim joins broadcast, nothing sort-merges") {
    val p = finalPlan("q03_join_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q04: three-way join runs on broadcast hash joins") {
    val p = finalPlan("q04_multiway_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q15: global top-K is TakeOrderedAndProject, not a full sort") {
    val p = finalPlan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("Sort \\[".r.findAllIn(p).isEmpty, p)
  }

  test("q02: aggregation is partial+final with whole-stage codegen") {
    val p = finalPlan("q02_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size == 2, p)
    assert(p.contains("*("), p) // whole-stage-codegen stage markers
  }

  test("q17: distinct-count scan reads only the two grouped columns") {
    val scans = scanLines(finalPlan("q17_dedup_exact"))
    assert(scans.contains("user_id") && scans.contains("event_type"), scans)
    assert(!scans.contains("props") && !scans.contains("value"), scans)
  }

  test("q63: the bounded slice is materialized once, not re-scanned") {
    // r18 shape: the ≤400-row slice is localCheckpointed at construction
    // (where its own scan DOES push the doc_id bound — asserted below via
    // the slice plan), so the final q63 plan must read the in-memory RDD
    // and never re-scan documents' parquet for its four consumers
    val p = finalPlan("q63_incremental_dedup")
    assert(!scanLines(p).contains("documents"), scanLines(p))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    val slice = graft.Tables.documents(spark, sf("sf0.01"))
      .filter(org.apache.spark.sql.functions.col("doc_id") < 400)
    val slicePlan = slice.queryExecution.executedPlan.toString
    assert(slicePlan.contains("(doc_id#") && slicePlan.contains("< 400"),
      slicePlan)
  }

  test("q79: EXISTS/NOT EXISTS decorrelate to broadcast semi + anti joins") {
    val p = finalPlan("q79_exists_subquery")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q82: centroids broadcast to the scoring loop, corpus never shuffles") {
    val p = finalPlan("q82_kmeans_assign")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only hash exchange allowed is the per-vector argmin window
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("q76: moments stay codegen HashAggregate; median rides the histogram") {
    // round-17 shape: the nine moment aggregates must NOT fall back to the
    // interpreted ObjectHashAggregate path (the old plan put `median` in
    // the same agg list, which dragged all nine through it), and the
    // 3-row median branch must broadcast back, never sort-merge
    val p = finalPlan("q76_stat_funcs")
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("q67: decontamination gram sets broadcast; corpus side never shuffles for the join") {
    val p = finalPlan("q67_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q44: banded self-join reuses its exchange and never degenerates to all-pairs") {
    val p = finalPlan("q44_minhash_lsh_full")
    // the near-dup scale claim in one assertion: candidates come from a
    // key-equality join (hash exchanges, AQE-reused), never a product
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("ReusedExchange|AQEShuffleRead".r.findAllIn(p).nonEmpty, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3, p)
  }

  test("q93: winsorize bounds broadcast back onto the corpus; no sort-merge") {
    val p = finalPlan("q93_winsorize")
    // the per-lang bounds frame is tiny by construction (one row per lang)
    // — joining it back must broadcast, not shuffle the corpus side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q100: substring dedup is one explode pass, no join, no product") {
    // The declared query serves the round-10 per-dataset span artifact
    // (a parquet scan) — the structural audit of the DETECTION plan
    // builds it directly from SubstringDedup.duplicatedSpans, the q120
    // cold-plan pattern, so the assertions run regardless of cache state.
    val cold = graft.operators.SubstringDedup.duplicatedSpans(
      graft.Tables.documents(spark, sf("sf0.01")), "doc_id", "text", k = 20)
    cold.collect()
    val p = cold.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // single-pass strategy: dup marking is a window over the gram key —
    // there must be NO join of any kind and exactly one Generate (explode)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert("Generate explode".r.findAllIn(p).size == 1, p)
    // exchanges: gram window + doc_id window — 2 (no final ORDER BY here)
    assert("Exchange (hash|range)partitioning".r.findAllIn(p).size <= 3, p)
    // the declared (artifact-serving) plan must still never product
    val dp = finalPlan("q100_dup_spans")
    assert(!dp.contains("CartesianProduct") && !dp.contains("SortMergeJoin"), dp)
  }

  test("q110: decay features aggregate map-side; one hash exchange of |users| rows") {
    val p = finalPlan("q110_decay_features")
    // reference time broadcasts; the decayed sums partial-aggregate before
    // the single user_id exchange (plus the final ORDER BY range exchange)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q108: BM25 top-20 is TakeOrderedAndProject over broadcast-joined postings") {
    val p = finalPlan("q108_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // stats is a 1-row frame: its cross join must be a broadcast NLJ, and
    // the df/dl joins hash-join — nothing sort-merges at this scale
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q102: zonal join equi-joins on cell keys; the tiny zone side broadcasts") {
    val p = finalPlan("q102_zonal_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // 5 zones explode to a handful of cells — AQE must broadcast them,
    // leaving the points side entirely unshuffled before the aggregate
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q103: radius join is a key-equality join on cells, never a product") {
    val p = finalPlan("q103_radius_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q101: semantic dedup joins on the cluster key, assignment row-wise") {
    val p = finalPlan("q101_semantic_dedup")
    // round-18 shape: the 8 pinned centroids take the LITERAL argmin path
    // (a row-wise least() over packed longs — no crossJoin expansion, no
    // aggregate, no window), the assigned frame materializes once
    // (ExistingRDD), and within-cluster pairing is a key-equality join on
    // the cluster id — never a global product, never a window, never a
    // SortAggregate (the min_by(struct) form sorted the n*k expansion
    // map-side: 134 GB of measured spill at sf2)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"), p)
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q112: incremental semdedup never self-joins the corpus; batch sides broadcast") {
    val p = finalPlan("q112_semdedup_incremental")
    // the indexed side is pruned by TWO broadcast joins (semi on the
    // batch's clusters, anti on the batch's ids) before any embedding is
    // fetched; the pair stage is cluster-key equality. No product, no
    // window. (The batch argmin itself sits behind the localCheckpoint so
    // it is not in this plan — q101's audit pins its hash-aggregate shape.)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q114: JL projection is a pure scan-side map — no exchange, no join") {
    val df = Catalog.queries("q114_random_projection")(spark, sf("sf0.01"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the matrix is a literal: the whole projection must pipeline with the
    // parquet scan — any join or hashpartitioning exchange means the
    // matrix stopped being a literal. (The final orderBy is the Verify
    // determinism contract, not part of the operator: allow its range
    // exchange, nothing else.)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty, p)
    assert(p.contains("Generate explode") || p.contains("Generate posexplode"), p)
  }

  test("q94: checksum aggregates map-side before its one exchange") {
    val p = finalPlan("q94_source_checksum")
    // partial+final pair: XOR partials combine map-side, so the exchange
    // carries |sources| rows per task, not the corpus
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q116: RRF fusion is broadcast-joined retrievals into one top-K") {
    val p = finalPlan("q116_hybrid_rrf")
    // the 1-row query vector and the bm25 dim frames broadcast; fused
    // top-20 must be TakeOrderedAndProject, never a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q117: sparse-cosine candidates come from a term equi-join, not a product") {
    val p = finalPlan("q117_sparse_cosine")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop joins allowed are broadcasts of the 1-row
    // n_docs stats frame onto the weights subtree (which appears once per
    // use: both join sides + norms); every one must be a BuildRight cross
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 3, p)
    assert("BroadcastNestedLoopJoin BuildRight, Cross".r.findAllIn(p).size == nlj, p)
  }

  test("q118: pagerank output stage is checkpoint-truncated and top-K bounded") {
    // The declared query serves the round-10 per-dataset rank artifact —
    // audit the TRAINING plan cold (q120 pattern): ranks straight from
    // PageRank.run must end behind a localCheckpoint truncation.
    val docs = graft.Tables.orders(spark, sf("sf0.01"))
      .join(graft.Tables.lineitem(spark, sf("sf0.01")),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("concat('c:', o_custkey) as src",
        "concat('s:', l_suppkey) as dst").distinct()
    val ranks = graft.operators.PageRank.run(
      docs, "src", "dst", iters = 2, damping = 0.85, undirected = true)
    ranks.collect()
    val rp = ranks.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(rp.contains("ExistingRDD") || rp.contains("Scan ExistingRDD"), rp)
    // declared stage: artifact ranks x broadcast 1-row count -> top-25
    val p = finalPlan("q118_pagerank")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q120: centroid classifier is hash aggregates + broadcast weights, no product") {
    // The declared query may serve the round-9 score cache (a
    // checkpointed artifact scan) depending on which test warmed it
    // first — so the structural audit of the TRAINING plan builds it
    // directly from QualityClassifier.centroidScores, which bypasses the
    // cache and is deterministic regardless of suite order: the 19-row
    // weight/intercept frames broadcast onto the feature frame, per-class
    // means and per-doc dots are partial+final hash aggregates.
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val qc = graft.operators.QualityClassifier
    val cold = qc.centroidScores(qc.features(docs), qc.cascadeLabels(docs))
    cold.collect()
    val cp = cold.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(cp.contains("BroadcastHashJoin"), cp)
    assert(cp.contains("HashAggregate"), cp)
    assert(!cp.contains("CartesianProduct"), cp)
    assert(!cp.contains("SortMergeJoin"), cp)
    // the declared (possibly cache-serving) plan must still never product
    val p = finalPlan("q120_quality_centroid")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q121: logistic scoring is one aggregate over literal weights, no shuffle of weights") {
    val p = finalPlan("q121_quality_logistic")
    // scoring joins the feature-store frame against a LITERAL weight map
    // folded into the projection — no weight-side join at all; the
    // per-doc margin is a partial+final hash aggregate. Features come
    // from the per-dataset Scratch parquet (round-9 feature store), so
    // the leaf is a parquet scan, not a checkpointed RDD.
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.toLowerCase.contains("parquet"), p) // feature-store scan
  }

  test("q122: BPE training output is a literal merge table; corpus cost is upstream") {
    val p = finalPlan("q122_bpe_train")
    // training already ran at construction (bounded 1-row argmax collects);
    // the declared plan must be a tiny local scan, no corpus re-read
    assert(p.contains("LocalTableScan") || p.contains("ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("q123: BPE encode reads the per-dataset count artifact") {
    val p = finalPlan("q123_bpe_encode")
    // round-18: the corpus encode (dictionary equi-join + per-doc
    // aggregate) runs once per (session, dataset) into a checkpointed
    // artifact shared with q129; the declared plan is a sort over that
    // materialized frame — no corpus re-read, no join, no product
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("FileScan") && !p.contains("Scan parquet"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q147/q148: unigram training is a checkpointed artifact; encode is a dict join") {
    // training ran once at construction (bounded <=V-row collects per EM
    // round); the declared trajectory must be a tiny checkpoint scan,
    // never a corpus re-read
    val p147 = finalPlan("q147_unigram_train")
    assert(p147.contains("LocalTableScan") || p147.contains("ExistingRDD"), p147)
    assert(!p147.contains("FileScan"), p147)
    // encode: distinct words segment once (the Viterbi fold runs inside
    // a projection over the type table), docs join the dictionary on
    // word equality, counts aggregate partial+final — never a product
    val p148 = finalPlan("q148_unigram_encode")
    assert(p148.contains("HashAggregate"), p148)
    assert(!p148.contains("CartesianProduct") && !p148.contains("SortMergeJoin"), p148)
  }

  test("q70: per-lang quota sample gets a map-side WindowGroupLimit") {
    // row_number <= 20 must push a per-partition group limit below the
    // lang shuffle — the property that keeps window state quota-bounded
    // instead of corpus-bounded (the scaladoc's claim, pinned here)
    val p = finalPlan("q70_balanced_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q93: winsorize bounds come from the length distribution, not a per-doc sort") {
    // the round-9 counting-sort form: the only per-doc work is the
    // dist hash aggregate; the ranking window runs on the per-(lang,
    // n_chars) frame. A per-doc row_number would put a Window directly
    // over the corpus scan — assert the Window's input is an aggregate.
    val p = finalPlan("q93_winsorize")
    val winIdx = p.indexOf("RunningWindowFunction")
    val idx = if (winIdx >= 0) winIdx else p.indexOf("Window")
    assert(idx >= 0, p)
    assert(!p.contains("row_number"), "per-doc ranking crept back:\n" + p)
  }

  test("q129: budget fill broadcasts the 1-row budget; no product, no global sort") {
    val p = finalPlan("q129_budget_fill")
    // the per-source window sorts WITHIN partitions; the only broadcast
    // product is the 1-row budget frame; candidate joins stay equi-joins
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q130: k-center's declared output is the tiny selection table, corpus cost upstream") {
    val p = finalPlan("q130_kcenter_select")
    // selection already ran at construction (bounded 1-row argmax collects
    // per round); the declared plan is a local scan of k rows
    assert(p.contains("LocalTableScan") || p.contains("ExistingRDD"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("q117: sparse-cosine postings join stays an equi-join under salting") {
    val p = finalPlan("q117_sparse_cosine")
    // the salt rides the term key: still a hash equi-join, never a product;
    // the 1-row stats frame is the only nested-loop broadcast
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }
}
