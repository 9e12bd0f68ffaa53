package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text-hashing primitives shared by the dedup /
  * fingerprinting operators (north star: LLM-data-pipeline dedup at 100 TB).
  *
  * Everything here is a pure Catalyst expression chain — no UDFs — so the
  * operators built on top stay inside whole-stage codegen and, critically,
  * every hash value is reproducible in DuckDB SQL for the driver's oracle
  * gate: `h60(x)` == `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  */
object TextHash {

  /** Modulus for rolling fingerprints: a prime < 2^31 so `acc*31 + h` stays
    * well inside Long on both engines.
    */
  val FpMod = 2147483629L

  /** 60-bit hash from the md5 hex prefix. md5 agrees across engines, and 15
    * hex chars keep the value positive in a signed 64-bit integer.
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens (the parity-simple tokenizer used by the declared
    * queries; `\\w+` regex tokens are available via regexp_extract_all).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles: ["a b c", "b c d", ...] for n=3. Documents
    * shorter than n tokens yield an empty array. Since round 10 this is
    * the NATIVE codegen'd [[graft.functions.expr.WordShinglesF]] — the
    * prior higher-order-function form ran interpreted and its per-element
    * lambda walk dominated every shingle-family scan at 1M docs (q150's
    * profile: ~29 s × 32 uniform map tasks just building shingles). The
    * coalesce preserves the old form's null contract (null text/tokens →
    * empty array, via the when/otherwise it used to carry).
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOf(tokens(text), n)

  /** [[wordShingles]] over an already-computed token-array column. (The
    * pre-round-10 lambda-CSE warning no longer applies — the native
    * expression evaluates its child once per row — but projecting the
    * token array as an attribute first remains good plan hygiene.)
    *
    * n = 1 null-element behavior (round-10 advice): the pre-round-10 form
    * was `array_distinct(toks)`, which PRESERVED null elements; the
    * native expression maps a null token to "" (honoring the result's
    * containsNull=false, and matching concat_ws-of-one-null for n >= 2).
    * Callers passing token arrays containing nulls with n = 1 get [""]
    * where they previously got [null]. [[tokens]] never produces null
    * elements, so in-repo callers are unaffected.
    */
  def wordShinglesOf(toks: Column, n: Int): Column =
    coalesce(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.functions.expr.WordShinglesF(
          org.apache.spark.sql.graftbridge.Bridge.expression(toks), n)),
      array().cast("array<string>"))

  /** Distinct character n-grams; same short-input guard as wordShingles
    * (substr would silently mis-shingle on the descending sequence).
    */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n))))
        .otherwise(array().cast("array<string>")))

  /** Order-sensitive polynomial rolling hash over an array of strings:
    * fold(acc*31 + h60(t) % M) % M. Sequential left fold on both engines →
    * bit-identical.
    */
  def rollingFp(items: Column): Column =
    aggregate(
      transform(items, t => h60(t) % FpMod),
      lit(0L),
      (acc, h) => (acc * 31 + h) % FpMod)

  /** Order-insensitive content key: rolling hash over the sorted distinct
    * items — equal iff two documents have the same token SET.
    */
  def setFp(items: Column): Column =
    rollingFp(array_sort(array_distinct(items)))
}
