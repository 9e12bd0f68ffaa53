package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence-packing strategy comparison (the q163 surface, reusable at
  * rehearsal scale): per shard, pack items of `n_tokens` each into
  * `capacity`-token bins under three strategies and report bins + padding
  * for each —
  *
  *   - `q_*`: the shipped cumulative-quotient scheme (q157/q160's packing
  *     contract — `bin = floor(cum_before / capacity)` in arrival order;
  *     bins may straddle, so it reports overflow too);
  *   - `ff_*`: TRUE first-fit — hard capacity, arrival order, first bin
  *     with room;
  *   - `bfd_*`: best-fit-decreasing — size-descending order, fullest bin
  *     that still fits (the classic ~11/9·OPT heuristic).
  *
  * Items never split; an item larger than capacity opens its own
  * permanently-oversize bin under EVERY strategy, so that overflow is
  * strategy-invariant and reported once (`oversize_overflow`), and the
  * bin-count lower bound is
  * `lb_bins = oversize_convs + ceil(packable_total/capacity)` where
  * packable_total excludes the oversize items — a plain
  * ceil(total/capacity) is NOT a bound once oversize bins carry more
  * than capacity each (caught by the 1M-item rehearsal, where first-fit
  * "beat" the naive figure by 14k bins).
  *
  * Scale posture: the greedy folds are inherently sequential PER SHARD
  * (each placement depends on all earlier bin fills), so each shard runs
  * as one `mapGroups` task — the shard is the unit of parallelism, its
  * item count is bounded by the caller's sharding contract (q58's
  * sub-shard rule), and nothing collects to the driver. The fills scan is
  * O(bins) per placement (Θ(n²/capacity·mean) worst case per shard) —
  * fine at the thousands-of-items-per-shard scale the sharding contract
  * implies.
  */
// Serializable so executor closures may call the shared `place` fold (the
// module reference is captured; a stateless singleton round-trips freely).
object Packing extends Serializable {

  /** ONE hard-capacity greedy placement step, shared by [[strategyAb]] and
    * [[bfdAssignments]] so the card and the action cannot drift by
    * construction: put `n` into the first (firstFit) or fullest-fitting
    * (bestFit) bin of `fills`, opening a new bin when none fits (an
    * oversize item therefore opens its own). Returns the 1-based bin id.
    */
  private def place(fills: scala.collection.mutable.ArrayBuffer[Long],
      n: Long, cap: Long, bestFit: Boolean): Int = {
    var pick = -1
    var best = -1L
    var i = 0
    while (i < fills.length) {
      if (fills(i) + n <= cap && (pick < 0 || (bestFit && fills(i) > best))) {
        pick = i; best = fills(i)
        if (!bestFit) i = fills.length // first fit: stop at first
      }
      i += 1
    }
    if (pick < 0) { fills += n; fills.length }
    else { fills(pick) += n; pick + 1 }
  }

  /** Best-fit-decreasing ASSIGNMENTS — the ACTION the [[strategyAb]] card
    * motivates when a corpus is in the large-conversation regime: every
    * item gets its hard-capacity BFD bin id (1-based, in bin-creation
    * order per shard; an oversize item opens its own bin). Same fold as
    * the `bfd_*` columns of [[strategyAb]] — deterministic by the
    * (n_tokens desc, k1, k2) placement order — so
    * `max(bin) == bfd_bins` and per-bin sums reconcile with `bfd_padding`
    * exactly (PackingSpec pins both). Input contract as [[strategyAb]].
    */
  def bfdAssignments(items: DataFrame, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = items.sparkSession
    import spark.implicits._
    val cap = capacity
    items
      .select(col("shard").cast("int"), col("k1").cast("long"),
        col("k2").cast("long"), col("n_tokens").cast("long"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val bySize = it.map { case (_, a, b, n) => (a, b, n) }.toArray
          .sortBy { case (a, b, n) => (-n, a, b) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        bySize.iterator.map { case (a, b, n) =>
          (shard, a, b, n, place(fills, n, cap, bestFit = true))
        }
      }
      .toDF("shard", "k1", "k2", "n_tokens", "bin")
  }

  /** `items` must have exactly (shard INT, k1 LONG, k2 LONG, n_tokens
    * LONG): (k1, k2) is the arrival order within the shard and the
    * deterministic tie-break of the size-descending order. Returns one row
    * per shard with the column set q163 declares.
    */
  def strategyAb(items: DataFrame, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val spark = items.sparkSession
    import spark.implicits._
    val cap = capacity
    items
      .select(col("shard").cast("int"), col("k1").cast("long"),
        col("k2").cast("long"), col("n_tokens").cast("long"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val convs = it.map { case (_, a, b, n) => (a, b, n) }.toArray
        def fold(order: Array[(Long, Long, Long)], bestFit: Boolean)
            : (Long, Long) = {
          val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
          order.foreach { case (_, _, n) => place(fills, n, cap, bestFit) }
          (fills.length.toLong,
            fills.map(f => math.max(0L, cap - f)).sum)
        }
        val arrival = convs.sortBy { case (a, b, _) => (a, b) }
        val bySize = convs.sortBy { case (a, b, n) => (-n, a, b) }
        val (ffBins, ffPad) = fold(arrival, bestFit = false)
        val (bfdBins, bfdPad) = fold(bySize, bestFit = true)
        // the shipped quotient scheme, replayed on the same arrival order
        var cum = 0L
        val byBin = scala.collection.mutable.LongMap.empty[Long]
        arrival.foreach { case (_, _, n) =>
          val bin = cum / cap
          byBin(bin) = byBin.getOrElse(bin, 0L) + n
          cum += n
        }
        // a plain tuple, not a case class of an enclosing object (the
        // serializability trap above)
        val oversize = convs.count(_._3 > cap).toLong
        val packable = convs.iterator.map(_._3).filter(_ <= cap).sum
        (shard, convs.length.toLong, cum,
          oversize,
          convs.map(c => math.max(0L, c._3 - cap)).sum,
          oversize + (packable + cap - 1) / cap,
          byBin.size.toLong,
          byBin.values.map(f => math.max(0L, cap - f)).sum,
          byBin.values.map(f => math.max(0L, f - cap)).sum,
          ffBins, ffPad, bfdBins, bfdPad)
      }
      .toDF("shard", "n_convs", "total_tokens", "oversize_convs",
        "oversize_overflow", "lb_bins", "q_bins", "q_padding", "q_overflow",
        "ff_bins", "ff_padding", "bfd_bins", "bfd_padding")
  }
}
