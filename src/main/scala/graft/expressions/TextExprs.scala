package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, MapType, StringType, StructField, StructType}
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
case class TextShingles(child: Expression, n: Int, distinct: Boolean = true,
    hashed: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  // `hashed = true` emits `hash60(gram)` longs instead of gram text —
  // equivalent to `transform(graft_shingles(text, n), hash60)` but
  // the md5 runs on the digest bytes directly inside this same pass
  // ([[HashKernel.hash60]]), skipping the hex-string materialization,
  // `substring` and base-16 `conv` parse the Column form pays per
  // gram. Consumers that immediately hash every gram (the dedup
  // shingle index, 5-gram decontamination) explode 16 B longs off the
  // scan instead of gram strings.
  override def dataType: DataType =
    if (hashed) ArrayType(LongType, containsNull = false)
    else ArrayType(StringType, containsNull = false)

  override def prettyName: String = if (hashed) "graft_shingles_h60" else "graft_shingles"

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
      if (seen == null || seen.add(s)) {
        out += (if (hashed) java.lang.Long.valueOf(HashKernel.hash60(s))
                else UTF8String.fromString(s))
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): TextShingles =
    copy(child = newChild)
}

/** Content fingerprint over character n-grams in ONE pass:
  * struct(fp60, n_distinct) = (min over hash60 of all n-grams, count
  * of distinct n-grams).
  *
  * Equivalent to
  * `array_min(transform(charShingles(text, n), hash60))` +
  * `size(array_distinct(charShingles(text, n)))` — but that pair
  * builds the gram array twice and md5s EVERY gram position
  * interpreted (~1k md5 + conv calls per doc, ~9 s at sf0.1). Here:
  * one sliding window, dedup into a HashSet, one `HashKernel.hash60`
  * per DISTINCT gram (the min is unaffected by duplicates), both
  * stats from the same pass.
  *
  * Gram semantics match `TextFns.charShingles`: texts shorter than
  * `n` contribute the whole text as the single gram (including the
  * empty string — md5("") is well-defined in both engines). Lengths
  * and gram boundaries are CODE POINTS, not UTF-16 units — Spark's
  * `length`/`substr` (and DuckDB's) count code points, so slicing by
  * Java char would miscount supplementary-plane text (emoji, CJK
  * extensions) and split surrogate pairs into broken grams whose
  * UTF-8 bytes md5 differently. BMP-only strings (code units ==
  * code points) keep the cheap char-indexed path.
  */
case class CharNgramFingerprint(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("fp60", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  override def prettyName: String = "graft_char_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val utf16Len = text.length
    val cpLen = text.codePointCount(0, utf16Len)
    var minHash = Long.MaxValue
    val seen = mutable.HashSet.empty[String]
    if (cpLen < n) {
      seen += text
      minHash = HashKernel.hash60(text)
    } else if (cpLen == utf16Len) {
      // BMP-only fast path: code units == code points, char indexing
      // is exact.
      var i = 0
      val last = utf16Len - n
      while (i <= last) {
        val g = text.substring(i, i + n)
        if (seen.add(g)) {
          val h = HashKernel.hash60(g)
          if (h < minHash) minHash = h
        }
        i += 1
      }
    } else {
      // Supplementary-plane text: window over code points so grams
      // match `substr` semantics and surrogate pairs never split.
      val cps = text.codePoints.toArray
      var i = 0
      val last = cpLen - n
      while (i <= last) {
        val g = new String(cps, i, n)
        if (seen.add(g)) {
          val h = HashKernel.hash60(g)
          if (h < minHash) minHash = h
        }
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](minHash, seen.size))
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramFingerprint =
    copy(child = newChild)
}

/** Per-document adjacent character-pair occurrence counts in ONE
  * native pass — the map-side pre-aggregation of BPE merge counting.
  *
  * Equivalent to exploding every whitespace token (length ≥ 2), then
  * every `charShingles(token, 2)` position, and counting occurrences —
  * but that chain materializes one row PER CHARACTER of the corpus
  * through two Generate stages (each with an interpreted
  * `transform`/`substr` allocation per position). Here: one pass over
  * the text, counts collapsed per document into a map<pair, count>, so
  * the downstream explode emits one row per DISTINCT pair per doc and
  * the global aggregate sums ready-made partial counts. Same totals,
  * orders-of-magnitude fewer rows through the pipeline.
  *
  * Tokenization matches `TextFns.tokens` (split on single spaces, drop
  * empties); pair boundaries are CODE POINTS, matching `substr`
  * semantics in both engines (see [[CharNgramFingerprint]]) — BMP-only
  * tokens keep the cheap char-indexed path.
  */
case class CharPairCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def prettyName: String = "graft_char_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = mutable.LinkedHashMap.empty[String, Long]
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i - start >= 2) {
          val tok = text.substring(start, i)
          val utf16Len = tok.length
          if (tok.codePointCount(0, utf16Len) == utf16Len) {
            var j = 0
            val last = utf16Len - 2
            while (j <= last) {
              val g = tok.substring(j, j + 2)
              counts.update(g, counts.getOrElse(g, 0L) + 1L)
              j += 1
            }
          } else {
            val cps = tok.codePoints.toArray
            var j = 0
            val last = cps.length - 2
            while (j <= last) {
              val g = new String(cps, j, 2)
              counts.update(g, counts.getOrElse(g, 0L) + 1L)
              j += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      counts.keysIterator.map(UTF8String.fromString).toArray[Any],
      counts.valuesIterator.map(java.lang.Long.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairCounts =
    copy(child = newChild)
}
