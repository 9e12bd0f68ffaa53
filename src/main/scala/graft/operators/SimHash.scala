package graft.operators

import graft.functions.TextHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 32-bit SimHash document fingerprinting.
  *
  * simhash(doc) = for each bit b: sign of Σ over distinct tokens of
  * (bit b of h60(token) ? +1 : -1); near-duplicates are pairs with small
  * Hamming distance between fingerprints.
  *
  * Scale design: the fingerprint is a single pure-expression fold over the
  * token array (aggregate + zip_with) — one pass per row, no explode, no
  * shuffle, stays in whole-stage codegen. Pairing then groups/joins on the
  * 32-bit value (exact dups) or on bit-band substrings (near dups) — both
  * key-equality joins, never all-pairs. Integer bit ops (shiftright/
  * shiftleft) match DuckDB's >>/<< exactly, so the operator is
  * oracle-checked end-to-end (queries.Dedup q31).
  */
object SimHash {

  val Bits = 32

  private def bitIdx: Column = sequence(lit(0), lit(Bits - 1))

  /** SimHash over an array of tokens (deduplicated internally). */
  def simhash(toks: Column): Column = {
    val counts = aggregate(
      transform(array_distinct(toks), t => TextHash.h60(t)),
      array_repeat(lit(0L), Bits),
      (acc, h) => zip_with(acc, bitIdx,
        (a, b) => a + when(call_function("shiftright", h, b) % 2 === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, bitIdx,
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc + v)
  }

  def simhashOfText(text: Column): Column = simhash(TextHash.tokens(text))

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")
}
