package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** [[Packing]]: the strategy A/B card and the BFD assignment action must
  * reconcile exactly — assignments are the SAME fold the card's `bfd_*`
  * columns summarize, so bin counts, paddings and validity are all
  * cross-checkable, including the oversize-item and tie-on-fill edges.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 100L

  /** Deterministic pseudo-random items: 3 shards, sizes 1..250 (some past
    * capacity), ids fixed by the hash so every run sees the same corpus.
    */
  private def items = (0 until 300).map { i =>
    val n = 1 + ((i * 2654435761L >>> 7) % 250L)
    (i % 3, i.toLong / 3, i.toLong, n)
  }.toDF("shard", "k1", "k2", "n_tokens")

  test("bfd assignments are valid bins that reconcile with the A/B card") {
    val ab = Packing.strategyAb(items, Cap)
      .select($"shard", $"bfd_bins", $"bfd_padding", $"oversize_convs",
        $"lb_bins", $"ff_bins", $"n_convs")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val asg = Packing.bfdAssignments(items, Cap)
    // every item assigned exactly once
    assert(asg.count() == 300)
    // per-shard: max(bin) equals the card's bfd_bins, bins are contiguous
    // 1..bfd_bins, and padding = bins*C - total(packable fills capped)
    val perShard = asg.groupBy($"shard")
      .agg(max($"bin").as("mx"), countDistinct($"bin").as("nb"))
      .as[(Int, Int, Long)].collect()
    perShard.foreach { case (sh, mx, nb) =>
      assert(mx.toLong == ab(sh)._2, s"shard $sh: max bin $mx != bfd_bins ${ab(sh)._2}")
      assert(nb == ab(sh)._2, s"shard $sh: bins not contiguous")
    }
    // per-bin fills: <= capacity unless the bin is a single oversize item;
    // and the summed slack of non-overflowing bins equals bfd_padding
    val bins = asg.groupBy($"shard", $"bin")
      .agg(sum($"n_tokens").as("fill"), count(lit(1)).as("k"),
        max($"n_tokens").as("mxn"))
      .as[(Int, Int, Long, Long, Long)].collect()
    bins.foreach { case (sh, b, fill, k, mxn) =>
      assert(fill <= Cap || (k == 1 && mxn > Cap),
        s"shard $sh bin $b overfilled: $fill with $k items")
    }
    val padBy = bins.groupBy(_._1).map { case (sh, bs) =>
      sh -> bs.map { case (_, _, fill, _, _) => math.max(0L, Cap - fill) }.sum
    }
    padBy.foreach { case (sh, pad) =>
      assert(pad == ab(sh)._3, s"shard $sh: padding $pad != bfd_padding ${ab(sh)._3}")
    }
    // the card's own invariants on the same corpus: the corrected lower
    // bound really bounds both hard-capacity strategies
    ab.values.foreach { r =>
      assert(r._5 <= r._2 && r._5 <= r._6,
        s"lb ${r._5} must bound bfd ${r._2} and ff ${r._6}")
    }
  }

  test("oversize items open singleton bins under every strategy") {
    val one = Seq((0, 0L, 0L, 250L), (0, 1L, 1L, 25L), (0, 2L, 2L, 70L))
      .toDF("shard", "k1", "k2", "n_tokens")
    val asg = Packing.bfdAssignments(one, Cap)
      .as[(Int, Long, Long, Long, Int)].collect().map(r => r._2 -> r._5).toMap
    // 250 is oversize -> its own bin (placed first, size-desc): bin 1;
    // 70 then 25 share bin 2 (25 best-fits the 70-filled bin: 95 <= 100)
    assert(asg(0L) == 1 && asg(2L) == 2 && asg(1L) == 2)
    val ab = Packing.strategyAb(one, Cap)
      .select($"oversize_convs", $"oversize_overflow", $"bfd_bins", $"lb_bins")
      .as[(Long, Long, Long, Long)].head()
    // lb = oversize(1) + ceil((25+70)/100) = 2; padding-free check rides
    // the first test — here the exact tuple pins the whole card row
    assert(ab == ((1L, 150L, 2L, 2L)))
  }
}
