package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the wordcount / text-analysis / dedup
  * operator families.
  *
  * Tokenization matches the reference's `java.util.StringTokenizer`
  * default delimiter set `" \t\n\r\f"` (reference
  * `src/wordcount/WordCount.java:45`): split on runs of those
  * characters and drop empty tokens. All functions here are pure
  * `org.apache.spark.sql.functions` compositions, so they stay inside
  * whole-stage codegen and never leave the Tungsten row format.
  */
object TextFunctions {

  /** Regex equivalent of StringTokenizer's default delimiters. */
  val WsPattern = "[ \\t\\n\\r\\f]+"

  /** Lower-cased whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), WsPattern), w => length(w) > lit(0))

  /** Word n-grams as space-joined strings ("w1 w2 ... wn").
    * Empty array when the document has fewer than `n` tokens
    * (guard needed: Spark's `sequence(1, 0)` counts *down*).
    * `slice` per position is O(n) per gram and benches faster than
    * the per-element `element_at` formulation (ANSI bounds checks).
    */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles (the dedup unit). */
  def shingles(toks: Column, n: Int): Column = array_distinct(wordNgrams(toks, n))

  /** Rolling polynomial fingerprint over the token sequence.
    * Per-token contribution c(w) = 7*len(w) + ascii(first char);
    * fold h = (31*h + c) mod 1e9+7. Stays far below Long overflow so
    * it is safe under ANSI mode, and is reproducible in DuckDB with
    * `list_reduce(list_prepend(0, ...))`.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      toks,
      lit(0L),
      (h, w) => pmod(h * lit(31L) + (length(w).cast("long") * lit(7L) + ascii(w).cast("long")), lit(1000000007L)))

  /** Deterministic per-word hash with full 32-bit entropy (for
    * SimHash): the first 60 bits of md5(w), mod the largest prime
    * below 2^32. Every fingerprint bit drawn from this hash is
    * informative — an earlier length/first-char arithmetic hash
    * spanned only ~17 bits, which made high fingerprint bits
    * near-constant and collapsed simhash chunk buckets into
    * corpus-sized skew. Reproducible in DuckDB as
    * `('0x' || substr(md5(w),1,15))::UBIGINT % 4294967291`.
    */
  def wordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long") % lit(4294967291L)
}
