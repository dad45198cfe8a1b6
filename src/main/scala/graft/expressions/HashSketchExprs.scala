package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared native text-hash kernels. All arithmetic is the exact
  * integer pipeline of `TextFns.hash60` (first 60 bits of md5 as a
  * non-negative int64) so results are bit-identical to both the
  * DataFrame-builtin formulations and the DuckDB oracles.
  */
private[expressions] object HashKernel {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)` — 60 bits. */
  def hash60(s: String): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // First 15 hex digits = first 7.5 bytes.
    var h = 0L
    var i = 0
    while (i < 8) {
      val b = bytes(i) & 0xff
      if (i < 7) h = (h << 8) | b
      else h = (h << 4) | (b >>> 4) // 15th hex digit: high nibble
      i += 1
    }
    h
  }

  /** BOTH 60-bit halves of one md5 — hex digits [1,15] and [16,30] —
    * so two signature words cost ONE digest (md5 dominates the
    * per-token cost; the 128-bit digest was feeding only 60 bits).
    * `out(0)` is bit-identical to [[hash60]]; `out(1)` is DuckDB's
    * `CAST('0x' || substr(md5(s), 16, 15) AS BIGINT)`.
    */
  def hash120(s: String, out: Array[Long]): Unit = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) {
      val b = bytes(i) & 0xff
      if (i < 7) h = (h << 8) | b
      else h = (h << 4) | (b >>> 4)
      i += 1
    }
    out(0) = h
    // Hex digit 16 is the LOW nibble of byte 7; digits 17-30 are
    // bytes 8-14 — 4 + 56 = 60 bits.
    h = (bytes(7) & 0xfL)
    i = 8
    while (i < 15) { h = (h << 8) | (bytes(i) & 0xff); i += 1 }
    out(1) = h
  }

  /** Whitespace tokens, empties dropped (= `TextFns.tokens`). */
  def tokenize(text: String): mutable.ArrayBuffer[String] = {
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
    toks
  }

  /** Distinct word n-gram shingles (= `TextFns.shingleSet`). */
  def distinctShingles(text: String, n: Int): mutable.LinkedHashSet[String] = {
    val toks = tokenize(text)
    val out = mutable.LinkedHashSet.empty[String]
    if (toks.length < n) return out
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      out += sb.toString
      j += 1
    }
    out
  }

  // For a hex check in tests.
  def md5Hex15(s: String): String = {
    val md = digest.get()
    md.reset()
    md.digest(s.getBytes(StandardCharsets.UTF_8))
      .take(8).flatMap(b => Array(HexChars((b >> 4) & 0xf), HexChars(b & 0xf)))
      .mkString.substring(0, 15)
  }
}

/** 16-slot MinHash signature in ONE pass over the raw text.
  *
  * Equivalent to the DataFrame pipeline
  * `shingleIndex → withColumn(h) → groupBy(doc).agg(min₀..min₁₅)` but
  * with no explode, no shuffle, and each shingle hashed exactly once:
  * the per-doc signature is computed inside the scan projection. On a
  * 100 TB corpus this turns the MinHash index build into a pure
  * map-side pass whose only shuffle is the band-bucket join.
  *
  * Output: `array<long>` of NumHashes slots; `Long.MaxValue` slots for
  * docs with no shingles (the grouped formulation emits no row — the
  * caller filters on `size(tokens) >= n` to match; see Dedup).
  */
case class MinHashSignature(child: Expression, shingleN: Int,
    prime: Long, coefA: Seq[Long], coefB: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(coefA.length == coefB.length)
  private val numHashes = coefA.length
  @transient private lazy val as = coefA.toArray
  @transient private lazy val bs = coefB.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = HashKernel.distinctShingles(text, shingleN).iterator
    while (it.hasNext) {
      val h = HashKernel.hash60(it.next()) % prime
      var i = 0
      while (i < numHashes) {
        val v = (as(i) * h + bs(i)) % prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 60-bit frequency-weighted SimHash in ONE pass over the raw text.
  *
  * Equivalent to `explode(tokens) → groupBy(doc,tok).count →
  * groupBy(doc).agg(60 bit-sums) → pack` (two shuffles, 60 aggregate
  * columns) collapsed into a per-row kernel: token counts in a local
  * hash map, one `hash60` per distinct token, 60 signed sums, sign
  * bits packed into an int64.
  */
case class SimHash60(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = mutable.HashMap.empty[String, Long]
    HashKernel.tokenize(text).foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
    val sums = new Array[Long](bits)
    counts.foreach { case (tok, c) =>
      val h = HashKernel.hash60(tok)
      var j = 0
      while (j < bits) {
        sums(j) += c * (((h >>> j) & 1L) * 2L - 1L)
        j += 1
      }
    }
    var packed = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) packed |= 1L << j
      j += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** `words` independent 60-bit SimHash signatures in ONE pass over the
  * raw text — the signature source for scale-adaptive SimHash banding
  * (graft.operators.Dedup.simHashPairsOf), where band keys wider than
  * 15 bits need more than 60 signature bits to stay non-overlapping.
  *
  * Words come in PAIRS sharing one md5 digest ([[HashKernel.hash120]]:
  * a digest is 128 bits and a word consumes 60, so burning a fresh
  * digest per word — as the first adaptive cut did — doubles the
  * kernel's dominant cost exactly at the first ladder rung crossing,
  * which the r8 sf1→sf3 bench measured as a 3.13× step for 3× data).
  * Pair 0 hashes the raw token: word 0 is hex[1,15] of md5(tok) —
  * bit-identical to [[SimHash60]], so the reported hamming keeps its
  * historical meaning at every rung — and word 1 is hex[16,30]. Pair
  * k ≥ 1 salts the digest as `md5("simd<k>_" + tok)` (the DuckDB
  * oracle derives the same split digits from the same salted md5).
  * Tokenization and the frequency map are shared across words, so
  * cost is O(⌈words/2⌉ digests × distinct tokens).
  */
case class SimHashMulti(child: Expression, bits: Int, words: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_multi"

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val counts = mutable.HashMap.empty[String, Long]
    HashKernel.tokenize(text).foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1L))
    val sums = Array.ofDim[Long](words, bits)
    val nPairs = (words + 1) / 2
    val h2 = new Array[Long](2)
    counts.foreach { case (tok, c) =>
      var pair = 0
      while (pair < nPairs) {
        HashKernel.hash120(if (pair == 0) tok else "simd" + pair + "_" + tok, h2)
        var half = 0
        while (half < 2 && pair * 2 + half < words) {
          val h = h2(half)
          val s = sums(pair * 2 + half)
          var j = 0
          while (j < bits) {
            s(j) += c * (((h >>> j) & 1L) * 2L - 1L)
            j += 1
          }
          half += 1
        }
        pair += 1
      }
    }
    val packed = new Array[Long](words)
    var wd = 0
    while (wd < words) {
      var p = 0L
      var j = 0
      while (j < bits) {
        if (sums(wd)(j) > 0) p |= 1L << j
        j += 1
      }
      packed(wd) = p
      wd += 1
    }
    new GenericArrayData(packed)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMulti =
    copy(child = newChild)
}
