package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle set in one native pass over the text.
  *
  * Equivalent to `array_distinct(shingles(tokens(text), n))` built from
  * `split`/`filter`/`transform`/`concat_ws` — but that chain evaluates
  * three interpreted higher-order functions per row and allocates the
  * full non-distinct shingle array (tokens × n strings) before
  * dedup'ing. On the sf0.1 documents table that recompute cost ~7 s
  * *per occurrence in the plan* (the jaccard self-join has three).
  * Here: single split, rolling window over the token array, dedup into
  * a LinkedHashSet — one eval call per row, ~50× cheaper, identical
  * output (first-occurrence order, which no consumer depends on — every
  * downstream op explodes then groups).
  *
  * Tokenization matches `TextFns.tokens` exactly: split on single
  * spaces, drop empty tokens (DuckDB
  * `list_filter(string_split(text, ' '), t -> t != '')`). Docs with
  * fewer than `n` tokens yield an empty array, matching the oracle's
  * `range()` producing an empty list.
  *
  * CodegenFallback: string-heavy, evaluated once per document row (not
  * per pair), so interpreted dispatch is negligible; the hot pairwise
  * paths stay in codegen.
  */
case class TextShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // Manual single-space split with empty-token drop — semantics of
    // Spark `split(text, " ")` + filter(_ != "").
    val toks = mutable.ArrayBuffer.empty[String]
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = mutable.ArrayBuffer.empty[Any]
    val seen = if (distinct) mutable.HashSet.empty[String] else null
    val sb = new java.lang.StringBuilder
    var j = 0
    val last = toks.length - n
    while (j <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      val s = sb.toString
      if (seen == null || seen.add(s)) out += UTF8String.fromString(s)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): TextShingles =
    copy(child = newChild)
}
