package graft.operators

import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A vector with an id — the typed currency of the ANN operators. */
final case class Vec(id: Long, embedding: Array[Float])

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths (north star: similarity search at 100 TB):
  *   - [[bruteForceTopK]]: exact baseline. Broadcast the (small) query set,
  *     stream the corpus once, per-query top-k via ranking window. Cost
  *     O(|corpus| * |queries| * dim) with NO corpus shuffle — correct at any
  *     corpus size as long as the query set broadcasts.
  *   - [[lshTopK]]: sign-random-projection LSH. Each vector maps to L
  *     bucket keys (L independent tables of nbits hyperplanes); candidates
  *     are bucket-key equi-joins (shuffle on bucket key, never all-pairs),
  *     then exact cosine ranks the candidates. Recall tuned by (nbits, L).
  *   - [[ivfTopK]]: IVF coarse quantization. Centroids come from a BOUNDED
  *     deterministic sample (size independent of corpus scale) trained with
  *     seeded Lloyd's iterations; search probes only the nprobe nearest
  *     cells per query via a cell-key equi-join.
  *
  * Hyperplanes / centroid seeds are derived deterministically so plans are
  * reproducible run-to-run (no Math.random in the plan). No operator here
  * caches: every intermediate is consumed exactly once (the round-1 forms
  * cached frames that were never unpersisted and leaked executor storage
  * across a long session).
  */
object Ann {

  /** Cosine via the native codegen'd vec_dot expression — identical math to
    * VectorMath.cosine (sequential double accumulate), ~an order of
    * magnitude less per-row overhead in the scoring loop.
    */
  private def cosineNative(a: Column, b: Column): Column =
    GraftFunctions.vecDot(a, b) /
      (sqrt(GraftFunctions.vecDot(a, a)) * sqrt(GraftFunctions.vecDot(b, b)))

  /** Exact top-k neighbors of each query vector by cosine. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic unit-free hyperplanes: L tables × nbits planes × dim. */
  private[operators] def planes(dim: Int, nbits: Int, tables: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, nbits, dim)(rnd.nextGaussian())
  }

  /** First embedding's length — one limit-1 scan job. Throws on an empty
    * corpus; operators that accept empty input take(1) and branch instead.
    */
  def headDim(corpus: Dataset[Vec]): Int = corpus.head().embedding.length

  /** (id, table, bucket) keys for every vector: bucket = sign bits of the
    * nbits hyperplane projections. Runs as a partition-local map (typed,
    * one pass, planes built once per partition).
    *
    * `dim` is explicit and validated against EVERY vector: the hyperplanes
    * are a function of (dim, seed), so a ragged corpus hashed with
    * per-partition dims would silently produce meaningless buckets
    * (round-1 advice finding) — fail loudly instead.
    */
  def lshKeys(ds: Dataset[Vec], dim: Int, nbits: Int, tables: Int, seed: Long): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val ps = planes(dim, nbits, tables, seed)
      it.flatMap { v =>
        require(v.embedding.length == dim,
          s"ragged embedding dimensions: vector ${v.id} has ${v.embedding.length}, expected $dim")
        (0 until tables).iterator.map { t =>
          var bucket = 0L
          var b = 0
          while (b < nbits) {
            var s = 0.0
            var i = 0
            val p = ps(t)(b)
            while (i < dim) { s += p(i) * v.embedding(i); i += 1 }
            if (s >= 0) bucket |= (1L << b)
            b += 1
          }
          (v.id, t, bucket)
        }
      }
    }.toDF("id", "table", "bucket")
  }

  /** Returns (id, cell) assignments via a partition-local map against the
    * broadcast centroids.
    */
  def ivfAssign(corpus: Dataset[Vec], centroids: Array[Vec]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    corpus.mapPartitions { it =>
      val cents = bc.value
      it.map { v => (v.id, nearestCells(v.embedding, cents, 1).head) }
    }.toDF("id", "cell")
  }

  /** Deterministic subsample of ~`target` vectors WITHOUT a global sort:
    * a hash-mod filter spreads the selection pseudo-randomly over the id
    * space, and orderBy+limit on the survivors compiles to
    * TakeOrderedAndProject (per-partition top-k + driver merge). The only
    * full pass is the count — a map-side partial aggregate with no data
    * movement. The round-1 form ran row_number over an UNPARTITIONED window,
    * which moved the entire corpus to a single partition — the engine's one
    * outright 100x-scale failure; this replaces it.
    */
  private[operators] def hashModSample(corpus: Dataset[Vec], target: Int): Array[Vec] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.toDF().count()
    val step = math.max(1L, n / math.max(1L, target.toLong))
    corpus.toDF()
      .filter(pmod(xxhash64(col("id")), lit(step)) === 0)
      .orderBy(col("id"))
      .limit(target)
      .as[Vec].collect()
  }

  /** Every 4th of a 4x sample, so seeds stay spread across the id range —
    * take(nCells) of the ordered sample would concentrate every seed in
    * the lowest-id quarter, which for id-correlated embeddings (time- or
    * cluster-ordered corpora) collapses quantizer coverage.
    */
  private def stridedSeeds(sample: Array[Vec], nCells: Int): Array[Vec] =
    sample.zipWithIndex.collect {
      case (v, i) if i % 4 == 0 => v
    }.take(nCells)

  /** IVF coarse quantizer seeds: `nCells` deterministically-sampled corpus
    * vectors (4x oversampled hash-mod filter, strided back down). A cheap
    * stand-in for trained centroids — see [[ivfCentroidsKMeans]] for the
    * trained path; both share the shuffle-free selection.
    */
  def ivfCentroids(corpus: Dataset[Vec], nCells: Int): Array[Vec] =
    stridedSeeds(hashModSample(corpus, nCells * 4), nCells)

  /** Trained coarse quantizer: seeded Lloyd's iterations (spherical k-means
    * by cosine) over a BOUNDED deterministic sample of ~nCells*sampleFactor
    * vectors. The sample size is independent of corpus scale — the
    * selection is the same shuffle-free hash-mod scan as [[ivfCentroids]].
    * Deterministic: same corpus + params => same centroids.
    *
    * The assignment scan (each sample vector's nearest centroid) is
    * O(sample * nCells * dim) flops per iteration — at nCells near
    * [[SemDeDup.DriverTrainMaxK]] that is ~10^10 flops, which run SERIALLY
    * on the driver cost the 1M composition rehearsal a 90–199 s stage
    * (round-16 watch item). Round 17 distributes exactly that scan: the
    * collected sample is parallelized once (the same sample*dim floats the
    * collect already moved), each iteration broadcasts the centroids and
    * executors score it — nearest-centroid is a PER-VECTOR pure function
    * with no cross-row accumulation, so executor math is bit-identical to
    * the old driver loop — and only the assignment ints (4*sample bytes)
    * come back. The centroid UPDATE then accumulates on the driver in
    * sample order, the same float-addition order as the round-16 serial
    * form, so trained centroids (and every downstream oracle hash) are
    * byte-identical; only the wall moves, from one driver thread to
    * sample/partitions-sized executor tasks.
    */
  def ivfCentroidsKMeans(
      corpus: Dataset[Vec],
      nCells: Int,
      iters: Int = 5,
      sampleFactor: Int = 32): Array[Vec] = {
    val sample = hashModSample(corpus, nCells * sampleFactor)
    if (sample.length <= nCells)
      return sample.zipWithIndex.map { case (v, i) => Vec(i.toLong, v.embedding) }
    val dim = sample(0).embedding.length
    // strided init for the same id-spread reason as ivfCentroids: Lloyd's
    // converges to a much better quantizer from spread seeds
    var cents: Array[Array[Double]] = sample.zipWithIndex.collect {
      case (v, i) if i % math.max(1, sample.length / nCells) == 0 => v
    }.take(nCells).map(_.embedding.map(_.toDouble))
    val sc = corpus.sparkSession.sparkContext
    // Size-gated execution of the assignment scan (round 17): distributing
    // it exists for the DriverTrainMaxK regime (~10^10 flops/iteration at
    // the 1M rehearsal), but each distributed iteration is a Spark job, and
    // at small sample*k*dim the job-launch floor dwarfs the math — the
    // round's bench showed every trained-quantizer query (q111/q146/...)
    // paying ~5 scheduler round-trips to score a few thousand vectors. The
    // scan is a per-vector pure function either way (same nearestCentroid,
    // same sample order), so the driver loop below is bit-identical to the
    // distributed map; only the wall changes. Gate at ~10^8 flops/iteration
    // (< ~100 ms serial): below it the driver scores, above it executors do.
    val flopsPerIter = sample.length.toLong * nCells.toLong * dim.toLong
    val driverScore = flopsPerIter <= (1L << 27)
    // parallelize preserves element order through collect, so the returned
    // assignment array lines up with `sample` by index; slice count only
    // shapes task granularity, never the result
    val sampleRdd = if (driverScore) null else {
      val r = sc.parallelize(
        sample.map(_.embedding).toIndexedSeq,
        math.max(1, math.min(sc.defaultParallelism * 2, sample.length / 64)))
      r.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      r
    }
    try {
      var iter = 0
      while (iter < iters) {
        val assigns: Array[Int] =
          if (driverScore) {
            val cs = cents
            sample.map(v => nearestCentroid(v.embedding, cs))
          } else {
            val bcCents = sc.broadcast(cents)
            val a = sampleRdd.map(emb => nearestCentroid(emb, bcCents.value)).collect()
            bcCents.destroy()
            a
          }
        val sums = Array.fill(nCells)(new Array[Double](dim))
        val counts = new Array[Long](nCells)
        var si = 0
        while (si < sample.length) {
          val ci = assigns(si)
          counts(ci) += 1
          val s = sums(ci)
          val emb = sample(si).embedding
          var i = 0
          while (i < dim) { s(i) += emb(i); i += 1 }
          si += 1
        }
        cents = Array.tabulate(nCells) { ci =>
          if (counts(ci) == 0L) cents(ci) // empty cluster: keep previous seed
          else sums(ci).map(_ / counts(ci))
        }
        iter += 1
      }
    } finally if (sampleRdd != null) sampleRdd.unpersist(blocking = false)
    cents.zipWithIndex.map { case (c, i) => Vec(i.toLong, c.map(_.toFloat)) }
  }

  /** Distributed k-means via Spark ML (k-means|| seeding + distributed
    * Lloyd's): the training path for k beyond [[ivfCentroidsKMeans]]'s
    * driver wall. The sampled driver trainer costs ~32*k^2*d*iters driver
    * flops — quadratic in k, impractical past k ~ 2000; this one is
    * O(n*k*d) per iteration spread across executors with only k*d bytes
    * ever on the driver, so k up to [[SemDeDup.MaxCentroids]] (and the
    * full corpus, not a 32k-point sample) stays tractable. Seeded, so
    * centroids are reproducible run-to-run on a fixed corpus. Same
    * Array[Vec] contract as the driver trainer: ids 0..k-1, float
    * embeddings.
    */
  def kMeansCentroidsDistributed(
      corpus: Dataset[Vec],
      nCells: Int,
      iters: Int = 5,
      seed: Long = 42L): Array[Vec] = {
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.toDF()
      .select(array_to_vector(col("embedding")).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setMaxIter(iters).setSeed(seed)
      .setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      Vec(i.toLong, c.toArray.map(_.toFloat))
    }
  }

  private def nearestCentroid(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestSim = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { dot += v(i).toDouble * c(i); na += v(i).toDouble * v(i); nb += c(i) * c(i); i += 1 }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sim > bestSim) { bestSim = sim; best = ci }
      ci += 1
    }
    best
  }

  private def nearestCells(v: Array[Float], cents: Array[Vec], nprobe: Int): Seq[Int] = {
    val sims = cents.indices.map { ci =>
      val c = cents(ci).embedding
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { dot += v(i).toDouble * c(i); na += v(i).toDouble * v(i); nb += c(i).toDouble * c(i); i += 1 }
      ci -> dot / (math.sqrt(na) * math.sqrt(nb))
    }
    sims.sortBy { case (ci, s) => (-s, ci) }.take(nprobe).map(_._1)
  }

  /** IVF approximate top-k: search only the `nprobe` cells nearest to each
    * query vector — candidates come from a cell-key equi-join, then exact
    * cosine reranks. At scale the assignment table is computed once and
    * reused across queries (the classic IVF index). `trained=true` (default)
    * uses the k-means quantizer; false uses raw sampled seeds.
    */
  def ivfTopK(
      spark: SparkSession,
      corpus: Dataset[Vec],
      queryIds: Seq[Long],
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      trained: Boolean = true): DataFrame = {
    val cents =
      if (trained) ivfCentroidsKMeans(corpus, nCells)
      else ivfCentroids(corpus, nCells)
    // assignments are consumed exactly once by the candidate join — no cache
    ivfSearch(spark, corpus, ivfAssign(corpus, cents), cents, queryIds, k, nprobe)
  }

  /** FILTERED approximate search — the production path for hard-negative
    * mining (q135's scale form): for each query, the top-k most
    * cosine-similar corpus vectors whose label DIFFERS from the query's.
    * The label filter composes into the candidate set BEFORE any scoring
    * (a broadcast join of the per-query label against the cell-pruned
    * candidates), so same-label vectors cost nothing past the id join —
    * the standard filtered-ANN design (filter during traversal, not
    * post-filter the final k).
    *
    * Over-fetch contract: filtering shrinks each probed cell's usable
    * candidates by the filtered fraction, so callers should raise
    * `nprobe` accordingly (a label covering half the corpus wants ~2× the
    * unfiltered nprobe for the same recall). Recall vs the exact
    * different-label brute force is measured in AnnSpec.
    */
  def ivfHardNegatives(
      spark: SparkSession,
      corpus: Dataset[Vec],
      labels: DataFrame,
      queryIds: Seq[Long],
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = ivfCentroidsKMeans(corpus, nCells)
    val assigned = ivfAssign(corpus, cents)
    val bc = spark.sparkContext.broadcast(cents)
    val qCells = corpus.filter(col("id").isin(queryIds: _*)).as[Vec]
      .flatMap { q =>
        nearestCells(q.embedding, bc.value, nprobe).map(c => (q.id, c))
      }
      .toDF("q_id", "cell")
    val lab = labels.select(col("id").cast("long").as("id"),
      col("label").as("lab"))
    val qLab = lab.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("lab").as("q_lab"))
    // label inequality joins into the candidate stage: cell-pruned ids ⋈
    // candidate label, anchor label broadcast — same-label rows die here
    val candidates = assigned.join(broadcast(qCells), "cell")
      .filter(col("id") =!= col("q_id"))
      .join(lab, "id")
      .join(broadcast(qLab), "q_id")
      .filter(col("lab") =!= col("q_lab"))
      .select("q_id", "id").distinct()
    val corpusDf = corpus.toDF("id", "embedding")
    val qDf = corpusDf.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    GraftFunctions.register(spark)
    val scored = candidates
      .join(corpusDf, "id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Persist an IVF index (centroids + per-vector cell assignments) as
    * parquet — the build-once / search-many lifecycle: at corpus scale the
    * assignment pass is the expensive step, so it runs once and every
    * later query reads the (cell-keyed, partition-prunable) assignment
    * table instead of re-quantizing the corpus.
    */
  def buildIvfIndex(
      corpus: Dataset[Vec],
      path: String,
      nCells: Int = 16,
      trained: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      if (trained) ivfCentroidsKMeans(corpus, nCells)
      else ivfCentroids(corpus, nCells)
    // normalize centroid ids to their ARRAY POSITION before persisting:
    // the assignment table's `cell` is the position, and untrained seeds
    // otherwise keep raw corpus ids — every index consumer would then have
    // to know position != id (a trap that produced a real probe-by-id bug
    // in the streaming dedup). After this, cell == centroid id everywhere.
    val normalized = cents.zipWithIndex
      .map { case (v, i) => Vec(i.toLong, v.embedding) }
    spark.createDataset(normalized.toIndexedSeq)
      .write.mode("overwrite").parquet(s"$path/centroids")
    ivfAssign(corpus, cents)
      .write.mode("overwrite").parquet(s"$path/assignments")
  }

  /** Append new vectors to a persisted [[buildIvfIndex]] index WITHOUT
    * retraining: the persisted centroids ARE the quantizer, so index growth
    * is one assignment pass over the batch plus an append write — cost
    * scales with the batch, never the indexed corpus. This is the standard
    * IVF lifecycle for a living corpus (new embeddings arrive continuously;
    * the quantizer is rebuilt only when distribution drift degrades recall
    * — until then appends land in existing cells and are immediately
    * searchable by [[ivfTopKIndexed]] and the streaming dedup).
    *
    * Caller owns id uniqueness across appends (same single-writer posture
    * as the bucketed upsert: a duplicate check here would cost a full
    * assignments scan per batch — exactly the table-proportional work this
    * operator exists to avoid).
    */
  def appendToIvfIndex(newVecs: Dataset[Vec], indexPath: String): Unit = {
    val spark = newVecs.sparkSession
    import spark.implicits._
    // sortBy(id) == array-position order: buildIvfIndex normalizes centroid
    // ids to positions before persisting, so assignment here agrees with
    // every existing cell key
    val cents = spark.read.parquet(s"$indexPath/centroids").as[Vec]
      .collect().sortBy(_.id)
    require(cents.nonEmpty, s"no centroids at $indexPath — build the index first")
    // nearestCells tolerates ragged dims by comparing the common prefix —
    // right for the search path, wrong for growth: appending a
    // mismatched-dim batch would silently mis-assign into a good index
    val dim = headDim(newVecs)
    require(dim == cents(0).embedding.length,
      s"batch dim $dim != index dim ${cents(0).embedding.length} — wrong index path?")
    ivfAssign(newVecs, cents).write.mode("append").parquet(s"$indexPath/assignments")
  }

  /** The assignment table minus tombstoned ids — EVERY consumer of a
    * persisted IVF index (batch search here, the streaming dedup) must
    * read assignments through this so deleted vectors stop matching the
    * moment [[deleteFromIvfIndex]] returns.
    */
  def loadIvfAssignments(spark: SparkSession, indexPath: String): DataFrame =
    IndexTombstones.filterLive(spark,
      spark.read.parquet(s"$indexPath/assignments"), s"$indexPath/deletes")

  /** O(batch) tombstone DELETE from a persisted [[buildIvfIndex]] index —
    * the erasure half of the lifecycle (append is the growth half). The
    * centroids are untouched (they are the quantizer, not data), so
    * delete-then-search equals a same-centroid rebuild without the
    * deleted vectors, exactly (AnnSpec). Physical reclamation at the next
    * [[compactIvfIndex]]; a tombstoned id can only be re-appended after
    * that compact (the tombstone hides it by id until then).
    */
  def deleteFromIvfIndex(
      spark: SparkSession, indexPath: String, ids: Seq[Long]): Unit =
    IndexTombstones.record(spark, s"$indexPath/deletes",
      spark.read.parquet(s"$indexPath/assignments").select(col("id")), ids)

  /** Fold tombstones into the assignment table physically and reset the
    * tombstone set. Cost ∝ index (explicit maintenance, like
    * `Curation.compactBuckets`); the assignment rows are 2 longs each, so
    * even at corpus scale this rewrite moves ~16 bytes/vector.
    */
  def compactIvfIndex(spark: SparkSession, indexPath: String): Unit = {
    val live = loadIvfAssignments(spark, indexPath).localCheckpoint(true)
    live.write.mode("overwrite").parquet(s"$indexPath/assignments")
    IndexTombstones.clear(spark, s"$indexPath/deletes")
  }

  /** Search against a persisted index from [[buildIvfIndex]]: loads the
    * (small, ≤nCells) centroid set to the driver and streams the
    * assignment table — the corpus itself is only touched to fetch
    * candidate and query embeddings.
    */
  def ivfTopKIndexed(
      spark: SparkSession,
      corpus: Dataset[Vec],
      indexPath: String,
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexPath/centroids").as[Vec]
      .collect().sortBy(_.id)
    val assigned = loadIvfAssignments(spark, indexPath)
    ivfSearch(spark, corpus, assigned, cents, queryIds, k, nprobe)
  }

  private def ivfSearch(
      spark: SparkSession,
      corpus: Dataset[Vec],
      assigned: DataFrame,
      cents: Array[Vec],
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val qCells = corpus.filter(col("id").isin(queryIds: _*)).as[Vec]
      .flatMap { q => nearestCells(q.embedding, bc.value, nprobe).map(c => (q.id, c)) }
      .toDF("q_id", "cell")
    val candidates = assigned.join(broadcast(qCells), "cell")
      .filter(col("id") =!= col("q_id"))
      .select("q_id", "id").distinct()
    val corpusDf = corpus.toDF("id", "embedding")
    val qDf = corpusDf.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    GraftFunctions.register(spark)
    val scored = candidates
      .join(corpusDf, "id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: candidates share any (table, bucket) with the
    * query, then exact cosine ranks candidates. Returns the same schema as
    * bruteForceTopK (queries with < k candidates return fewer rows — the
    * recall/latency trade).
    *
    * The query-side keys are computed from the FILTERED corpus (a pruned
    * scan of <= |queryIds| rows) rather than by filtering the full key set,
    * so the full-corpus keys are built exactly once and nothing needs a
    * cache; the tiny query side broadcasts.
    */
  def lshTopK(
      spark: SparkSession,
      corpus: Dataset[Vec],
      queryIds: Seq[Long],
      k: Int,
      nbits: Int = 6,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    // empty corpus => empty result (not a head() crash): there is no dim
    // to derive and nothing to search
    val first = corpus.take(1)
    if (first.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("q_id", "id", "cos_sim", "rank")
    val dim = first(0).embedding.length
    val keys = lshKeys(corpus, dim, nbits, tables, seed)
    val qKeys = lshKeys(corpus.filter(col("id").isin(queryIds: _*)), dim, nbits, tables, seed)
      .withColumnRenamed("id", "q_id")
    val candidates = keys.join(broadcast(qKeys), Seq("table", "bucket"))
      .filter(col("id") =!= col("q_id"))
      .select("q_id", "id").distinct()
    val corpusDf = corpus.toDF("id", "embedding")
    val qDf = corpusDf.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("embedding").as("q_emb"))
    GraftFunctions.register(spark)
    val scored = candidates
      .join(corpusDf, "id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("id"),
        cosineNative(col("embedding"), col("q_emb")).as("cos_sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
