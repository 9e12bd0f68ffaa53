package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared LSH banding scaffold used by [[MinHashLSH]] and [[SimHash]]:
  * mega-bucket cap + self-join on the band key. Input must have columns
  * (id, band, key) plus any payload columns; output is the a/b-joined rows
  * with `a.id < b.id` (payloads reachable as `a.<col>` / `b.<col>`).
  *
  * Both self-join sides are the SAME plan shuffled on (band, key), so AQE's
  * runtime exchange reuse computes the keys once and reads the shuffle
  * twice; the mega-bucket cap is a count-over-window on that same key — it
  * rides the join's own exchange instead of adding a groupBy + semi-join
  * pass, and nothing is cached (nothing to leak). `maxBucket <= 0` disables
  * the cap.
  */
private[graft] object BandedSelfJoin {

  /** Data-derived mega-bucket cap (round 16, VERDICT r15 task 3): the
    * constant catalog default (10000) was measured wrong twice — 73.6 GB
    * of spill at 1M whole-clip audio fingerprints, and q174's ~95 s
    * sweep-1 build at sf0.1, both from template buckets the constant let
    * through. The rule replaces the constant with the repo's own
    * rows/2^keyBits arithmetic, checked at plan time by the caller once
    * the fingerprint row count is known:
    *
    *   E = rowsPerBand / 2^keyBits      (expected RANDOM bucket size)
    *   cap = max(floor, 16 × ⌈E⌉)
    *
    * A uniform hash key makes bucket sizes ~Poisson(E); P(n ≥ 16E) is
    * Chernoff-negligible for any E ≥ 1, and the floor covers the E < 1
    * regime's small-count noise — so any bucket OVER the derived cap is
    * degenerate content (templates, near-silence, flat fields), never a
    * random collision. Combined with representative pairing
    * ([[pairs]]' `repOverCap`) the cap then costs recall nothing: over-cap
    * buckets keep their members reachable through one star of verified
    * edges instead of being dropped.
    */
  def derivedCap(rowsPerBand: Long, keyBits: Int, floor: Int = 32): Int = {
    require(rowsPerBand >= 0, s"rowsPerBand must be >= 0, got $rowsPerBand")
    require(keyBits >= 1 && keyBits <= 62, s"keyBits must be in [1, 62], got $keyBits")
    val expected = math.ceil(rowsPerBand.toDouble / math.pow(2.0, keyBits))
    math.max(floor.toLong, math.min(Int.MaxValue.toLong, 16L * expected.toLong)).toInt
  }

  /** `saltAbove > 0` additionally SALTS buckets larger than it (the
    * [[SparseCosineJoin]] head-term shape): the a-side gets
    * `salt = hash(id) mod S`, the b-side replicates to every salt, and the
    * join key grows by the salt — each (a, b) pair still meets exactly
    * once (at the a-row's salt), so the pair set is row-identical to the
    * unsalted plan (DedupSpec proves it), while one capped bucket's cap²
    * pair-verify spreads over S reducer keys instead of landing on one
    * straggler task. `S = min(⌈(bucket_n/saltAbove)²⌉, 64)` bounds per-key
    * candidate volume at ~saltAbove² and b-side replication at 64×, and
    * buckets at or under the threshold keep S = 1 (same work, same
    * result). The salted plan's two sides differ (pmod vs explode), so it
    * forgoes the unsalted plan's AQE exchange reuse — that trade only
    * makes sense where a quadratic bucket exists, which is why it is
    * opt-in.
    *
    * `repOverCap` (round 16): instead of DROPPING buckets larger than
    * `maxBucket`, pair every over-cap member against deterministic
    * representatives — star edges instead of n²/2, so the cost stays
    * linear in the degenerate bucket while the downstream verify +
    * connected-components action keeps the whole bucket reachable (a
    * template corpus' trims all verify against a representative and land
    * in one cluster — the recall the drop semantics sacrificed, measured
    * at 1M in BASELINE). Buckets at or under the cap are pair-identical
    * to the plain form. Mutually exclusive with salting: a star has no
    * quadratic hot key to spread.
    *
    * `numReps` (round 17, VERDICT r16 task 3): the round-16 single
    * min-id representative left 59% of the 1M trim-audio corpus' planted
    * pairs un-clustered — a MIXED over-cap bucket (several template
    * VARIANTS sharing one band key) pairs every member against a rep of
    * possibly the WRONG variant, and the strict verify kills the star
    * edge. With `numReps = R`, each over-cap bucket keeps R
    * representatives spread by ID STRIDE (ranks 1, 1+⌈n/R⌉, 1+2⌈n/R⌉, …
    * in id order — deterministic, and interleaved variants get sampled
    * across the id range), and every member pairs with EVERY rep
    * regardless of id order — R·n edges, still linear. The a.id < b.id
    * contract holds by emitting rep→member edges from whichever side is
    * smaller: edges₁ = (small-bucket members ∪ reps) × all members with
    * a.id < b.id (rep-rep pairs included once); edges₂ = over-cap
    * NON-rep members × reps with a.id < b.id (the member-below-rep half
    * single-rep stars never had). R = 1 keeps the round-16 plan exactly
    * (edges₂ is provably empty below the min-id rep and is not built).
    *
    * `repStratCol` (round 17, the DESIGN §8.2 "spread by fingerprint
    * distance" option, measured necessary): id-stride reps pair every
    * member with EVERY rep — R·n edges — and on the 1M trim corpus'
    * 10⁵-row mega-buckets R = 8 needed more shuffle than this box's
    * 80 GB disk twice over. Stratified reps replace "every rep" with
    * "YOUR variant's rep": members class by `xxhash64(stratCol)` — a
    * payload column that identifies the member's content variant (the
    * full fingerprint behind the band key), so same-variant rows land in
    * one class — and each over-cap class keeps its own min-id rep, with
    * edges only WITHIN the class. Cost is ~n edges TOTAL, same scale as
    * the single-rep star: per (band, key, class) join group the rep side
    * has exactly one row, so group combos sum to the bucket size — even
    * the adversarial all-distinct-variant bucket (every row its own
    * class, every row a rep) yields 1×1 groups, linear work, zero edges.
    * That is why the class space is NOT folded down to `numReps` (a
    * first cut classed by `pmod(hash, R)`, and on the 1M trim corpus'
    * thousands-of-variants buckets birthday collisions handed a large
    * fraction of variants a WRONG-variant rep — R = 8 recalled 104k and
    * R = 1024 only 117k of 200k planted pairs, where exact classes have
    * no collision term at all, at the same linear cost). Recall targets
    * exactly the pairs the strict verify can confirm — cross-variant
    * star edges, the ones stride reps spend R·n edges probing, verify
    * to nothing by definition. Small buckets class to 0, so their
    * all-pairs semantics are untouched; `numReps` is ignored in this
    * branch (kept for the id-stride form).
    */
  def pairs(keyed: DataFrame, maxBucket: Int, saltAbove: Int = 0,
      repOverCap: Boolean = false, numReps: Int = 1,
      repStratCol: Option[String] = None): DataFrame = {
    require(numReps >= 1, s"numReps must be >= 1, got $numReps")
    if (repOverCap && repStratCol.isDefined) {
      require(maxBucket > 0, "repOverCap needs a positive maxBucket")
      require(saltAbove <= 0,
        "repOverCap and saltAbove are mutually exclusive: the star's cost " +
          "is already linear, there is no quadratic bucket left to salt")
      val strat = col(repStratCol.get)
      val wBucket = Window.partitionBy(col("band"), col("key"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val counted0 = keyed
        .withColumn("bucket_n", count(lit(1)).over(wBucket))
        .withColumn("graft_cls",
          when(col("bucket_n") > maxBucket, xxhash64(strat))
            .otherwise(lit(0L)))
      val wCls = Window.partitionBy(col("band"), col("key"), col("graft_cls"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      // row-level rep mark: a clip id can appear in several classes
      // (different ranks → different variants of content); each of its
      // rows is rep exactly where its class elected it
      val counted = counted0
        .withColumn("is_rep",
          col("bucket_n") > maxBucket && col("id") === min(col("id")).over(wCls))
        .localCheckpoint(true)
      val aSide = counted
        .filter(col("bucket_n") <= maxBucket || col("is_rep"))
        .drop("bucket_n", "is_rep")
      val bSide = counted.drop("bucket_n", "is_rep")
      // class in the join key: small buckets are all class 0 (their
      // all-pairs join is unchanged); over-cap edges stay within class
      val edges = aSide.as("a").join(bSide.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.graft_cls") === col("b.graft_cls") &&
          col("a.id") < col("b.id"))
      val aNonRep = counted
        .filter(col("bucket_n") > maxBucket && !col("is_rep"))
        .drop("bucket_n", "is_rep")
      val bReps = counted.filter(col("is_rep")).drop("bucket_n", "is_rep")
      edges.union(aNonRep.as("a").join(bReps.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.graft_cls") === col("b.graft_cls") &&
          col("a.id") < col("b.id")))
    } else if (repOverCap) {
      require(maxBucket > 0, "repOverCap needs a positive maxBucket")
      require(saltAbove <= 0,
        "repOverCap and saltAbove are mutually exclusive: the star's cost " +
          "is already linear, there is no quadratic bucket left to salt")
      // One window pass (one sort: both specs share partitioning AND
      // ordering) computes the count and the id-rank the stride reps
      // derive from. The cap must live in the JOIN SIDES, not the join
      // condition: a residual predicate is applied AFTER the sort-merge
      // join emits a key group's combinations, so a mega-bucket still
      // pays ~G²/4 comparisons before the filter (measured on the 1M
      // trim corpus, normalized against the unchanged drop-arm run next
      // to each form: condition-form 3.8× the drop arm; this form 2.2× —
      // BASELINE round 16; pair sets identical). Left side = every
      // member of a small bucket plus only REPRESENTATIVE rows of an
      // over-cap bucket, so per-bucket comparisons are n² small /
      // |rep rows|×G big — linear in the degenerate bucket.
      // The two sides differ, so (like the salted branch, same caveats)
      // the keyed rows are materialized once rather than recomputed.
      val wOrd = Window.partitionBy(col("band"), col("key")).orderBy(col("id"))
      val wAll = wOrd.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val stride = greatest(
        ceil(col("bucket_n").cast("double") / lit(numReps.toDouble)).cast("long"),
        lit(1L))
      val counted = keyed
        .withColumn("bucket_n", count(lit(1)).over(wAll))
        // dense_rank, NOT row_number: a clip's sub-fingerprints can put
        // the same id in one bucket several times (different ranks), and
        // row_number would tie-break among equal ids nondeterministically
        // AND split an id's rows across rep/non-rep. dense_rank is a pure
        // function of the id VALUE, so a selected rep keeps ALL its rows
        // (the round-16 min-id semantics, generalized to R id-classes).
        .withColumn("is_rep",
          col("bucket_n") > maxBucket &&
            pmod(dense_rank().over(wOrd).cast("long") - 1L, stride) === 0L)
        .localCheckpoint(true)
      val aSide = counted
        .filter(col("bucket_n") <= maxBucket || col("is_rep"))
        .drop("bucket_n", "is_rep")
      val bSide = counted.drop("bucket_n", "is_rep")
      val edges = aSide.as("a").join(bSide.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      if (numReps == 1) edges // the min-id rep has no member below it
      else {
        val aNonRep = counted
          .filter(col("bucket_n") > maxBucket && !col("is_rep"))
          .drop("bucket_n", "is_rep")
        val bReps = counted.filter(col("is_rep")).drop("bucket_n", "is_rep")
        // positional union: the joined frames carry duplicate column
        // names (a.*, b.*), which unionByName cannot address
        edges.union(aNonRep.as("a").join(bReps.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id")))
      }
    } else if (saltAbove <= 0) {
      val bounded =
        if (maxBucket <= 0) keyed
        else keyed
          .withColumn("bucket_n",
            count(lit(1)).over(Window.partitionBy(col("band"), col("key"))))
          .filter(col("bucket_n") <= maxBucket)
          .drop("bucket_n")
      // both sides are the SAME plan: AQE computes the keys once and
      // reads the (band, key) exchange twice
      bounded.as("a").join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
    } else {
      // Round 17: bucket counts come from a groupBy (map-side partials,
      // tiny result) broadcast-joined back, NOT a count-over-window — the
      // window hash-partitioned and SORTED every keyed row just to tag it
      // with its bucket size, a full extra exchange on the salted path's
      // hot input. Only buckets ABOVE the engagement threshold are kept
      // (bounded by the number of degenerate keys, so the broadcast is
      // safe at any scale); absent rows coalesce to bucket_n = 1, which
      // yields the same nSalt = 1 / cap verdict as their true sub-
      // threshold count. The threshold is min(maxBucket, saltAbove) when
      // both engage so the cap filter still sees every over-cap bucket.
      val thr = if (maxBucket > 0) math.min(maxBucket.toLong, saltAbove.toLong)
        else saltAbove.toLong
      // Round-18 (ADVICE r17): the hot frame is bounded by the number of
      // DEGENERATE buckets in ordinary corpora, but that count is
      // data-dependent — a corpus with millions of moderately hot
      // (band, key) buckets would make a forced broadcast arbitrarily
      // large and fail the job (availability, not correctness). The frame
      // is materialized once (its aggregate ran exactly once inside the
      // old join plan too — the checkpoint relocates, not adds, that
      // work) and size-probed: above the bound the hint is dropped and
      // the planner shuffle-joins instead. ~1M (band, key, n) rows ≈
      // 40 MB framed — a safe broadcast ceiling at any scale.
      // the salted sides differ (pmod vs explode), so AQE cannot reuse one
      // exchange for both — materialize the keyed rows ONCE or the whole
      // upstream pipeline (e.g. a conversation render) runs per reader.
      // Round-18: the checkpoint moved UP from the counted join to `keyed`
      // itself — the r17 shape evaluated the upstream pipeline TWICE (the
      // hot aggregate and the join's probe side both sat above raw
      // `keyed` inside one checkpoint job); now every consumer (the hot
      // aggregate, the probe side, the bounded materialization) reads the
      // in-memory blocks. Blocks are freed by the ContextCleaner when the
      // frame drops. Caveats of localCheckpoint(true), accepted because
      // this branch is opt-in: (a) it is EAGER — building the DataFrame
      // runs the upstream pipeline right here, a side effect of
      // construction; (b) it is NON-RELIABLE — the blocks live on
      // executors, so losing one (kill/decommission) fails the job
      // instead of recomputing lineage. On a cluster with executor churn,
      // prefer saltAbove = 0 (the AQE-reusing unsalted plan) or
      // checkpoint `keyed` to reliable storage first.
      val keyedOnce = keyed.localCheckpoint(true)
      val hot0 = keyedOnce.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > thr)
        .localCheckpoint(true)
      val hot =
        if (hot0.count() <= 1000000L) broadcast(hot0) else hot0
      val counted = keyedOnce
        .join(hot, Seq("band", "key"), "left")
        .withColumn("bucket_n", coalesce(col("bucket_n"), lit(1L)))
      val bounded = (
        if (maxBucket <= 0) counted
        else counted.filter(col("bucket_n") <= maxBucket)
      ).localCheckpoint(true)
      val nSalt = greatest(least(
        ceil(pow(col("bucket_n") / lit(saltAbove.toDouble), 2.0)),
        lit(64.0)).cast("int"), lit(1))
      val a = bounded
        .withColumn("graft_salt", pmod(xxhash64(col("id")), nSalt).cast("int"))
        .drop("bucket_n")
      val b = bounded
        .withColumn("graft_salt", explode(sequence(lit(0), nSalt - 1)))
        .drop("bucket_n")
      a.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.graft_salt") === col("b.graft_salt") &&
          col("a.id") < col("b.id"))
    }
  }
}
