package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

import graft.expressions.{CharPairCounts, DotProduct, TextShingles}

/** Column helpers shared by the text-analysis / dedup / similarity
  * operators. Everything here is built from codegen'd Spark built-ins
  * (no UDFs), and every construct has a bit-exact DuckDB equivalent so
  * the operators stay oracle-checkable:
  *
  *   - `hash60`:   Spark `conv(substr(md5(x),1,15),16,10)::long`
  *               ≡ DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`
  *     60 bits of md5 — fits a signed int64, always non-negative, and
  *     identical across engines (md5 is md5). All downstream MinHash /
  *     SimHash / LSH arithmetic is integer-only on top of this, so
  *     cross-engine comparison is exact, never float-fuzzy.
  *
  *   - token/shingle builders use higher-order array functions
  *     (`filter`/`transform`/`aggregate`), which stay inside
  *     whole-stage codegen — no row-at-a-time UDF cost at 100 TB.
  */
object TextFns {

  /** 2^31 - 1, the classic Mersenne prime for Carter–Wegman hashing. */
  val MinHashPrime: Long = 2147483647L

  /** First 60 bits of md5(input) as a non-negative long; identical in
    * Spark and DuckDB (see object doc).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens with empties dropped — mirrors the pandas-side
    * `.str.split()` semantics the reference's text columns would get,
    * and DuckDB's `list_filter(string_split(text,' '), t -> t != '')`.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Word n-gram shingles (space-joined runs of `n` consecutive
    * tokens). Empty array when the doc has fewer than `n` tokens —
    * matches DuckDB `range(1, len-n+2)` producing an empty list.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Character n-gram shingles over the raw text (for fingerprinting).
    * Positions are 1-based to match SQL `substr` in both engines; the
    * final grams shorter than `n` are excluded.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array(text))

  /** Dot product of two double arrays — native codegen'd
    * [[graft.expressions.DotProduct]], sequentially summed left-to-right
    * (the same evaluation order as DuckDB's `list_reduce`, so the float
    * result is bit-identical across engines). The HOF formulation
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` computes the same value
    * but interpreted per element; on the 2M-pair cosine queries the
    * native loop is ~20× faster.
    */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Distinct word n-gram shingle set straight from the raw text —
    * native single-pass [[graft.expressions.TextShingles]], equivalent
    * to `array_distinct(shingles(tokens(text), n))`.
    */
  def shingleSet(text: Column, n: Int): Column =
    ColumnShim.column(TextShingles(ColumnShim.expression(text), n))

  /** Distinct word n-gram shingle set ALREADY hash60'd — the same
    * native pass as [[shingleSet]] with the md5 fused in ([[TextShingles]]
    * `hashed`), equivalent to `transform(shingleSet(text, n), hash60)`.
    * For consumers that hash every gram anyway (the dedup shingle
    * index, 5-gram decontamination) this halves-or-better the per-gram
    * cost: no hex string, no substring, no base-16 conv parse.
    */
  def shingleSetHashed(text: Column, n: Int): Column =
    ColumnShim.column(TextShingles(ColumnShim.expression(text), n, hashed = true))

  /** NON-distinct word n-gram list (every occurrence, in order) —
    * the same native kernel with dedup off, equivalent to
    * `shingles(tokens(text), n)`. For frequency-sensitive consumers
    * (n-gram LM counts), where the distinct set would be wrong.
    */
  def shingleList(text: Column, n: Int): Column =
    ColumnShim.column(TextShingles(ColumnShim.expression(text), n, distinct = false))

  /** Per-doc adjacent character-pair occurrence counts as a
    * `map<pair, count>` — native [[graft.expressions.CharPairCounts]],
    * equivalent to counting `explode(charShingles(token, 2))` over
    * every whitespace token of length ≥ 2. The BPE merge-counting
    * pre-aggregate: one map row per doc instead of one row per
    * character position.
    */
  def charPairCounts(text: Column): Column =
    ColumnShim.column(CharPairCounts(ColumnShim.expression(text)))

  /** L2 norm via the same sequential fold. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Float-array column cast to double (parquet `array<float>` →
    * `array<double>`), so all products/sums run in double precision
    * exactly like DuckDB's `embedding::DOUBLE[]`.
    */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))
}
