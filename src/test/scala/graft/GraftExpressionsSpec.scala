package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** The native expressions must be drop-in equivalent to the built-in
  * formulations they replaced (same values bit-for-bit, same nulls) —
  * that equivalence is what keeps the DuckDB oracles valid.
  * Randomized cases use a fixed seed (deterministic CI).
  */
class GraftExpressionsSpec extends SparkSpec {

  import spark.implicits._

  /** The original HOF formulation of dot(), kept as the test oracle. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** The original builtin-chain formulation of shingleSet(). */
  private def chainShingles(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(TextFns.shingles(TextFns.tokens(text), n))

  test("DotProduct matches the aggregate/zip_with fold bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 30).map { _ =>
      val len = 1 + rnd.nextInt(64)
      (Array.fill(len)(rnd.nextDouble() * 2e3 - 1e3),
        Array.fill(len)(rnd.nextDouble() * 2e3 - 1e3))
    }
    val df = cases.toDF("a", "b")
    df.select(TextFns.dot($"a", $"b"), hofDot($"a", $"b")).collect().foreach {
      case Row(native: Double, hof: Double) =>
        // Bit-identical, not approximately equal: same summation order.
        assert(java.lang.Double.doubleToLongBits(native) ==
          java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("DotProduct: null array yields null; empty arrays yield 0.0") {
    val df = Seq((Array(1.0, 2.0), Option.empty[Array[Double]], Array.empty[Double]))
      .toDF("a", "n", "e")
    val r = df.select(
      TextFns.dot($"a", $"n"), TextFns.dot($"e", $"e"), TextFns.dot($"a", $"a")).head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 5.0)
  }

  test("DotProduct folds the common prefix when lengths differ") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 20.0))).toDF("a", "b")
    assert(df.select(TextFns.dot($"a", $"b")).head().getDouble(0) == 50.0)
  }

  test("DotProduct on array<float> is bit-identical to the double-cast form") {
    // The embed verify join shuffles RAW float vectors and dots them
    // directly — per-element float→double widening is exact, so the
    // result must match casting the whole array first, bit-for-bit.
    val rnd = new scala.util.Random(91)
    val vecs = (0 until 30).map { _ =>
      (Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
        Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = vecs.toDF("a", "b")
    val viaDouble = TextFns.dot(
      transform($"a", _.cast("double")), transform($"b", _.cast("double")))
    df.select(TextFns.dot($"a", $"b"), viaDouble,
        TextFns.dot($"a", transform($"b", _.cast("double"))))
      .collect().foreach { case Row(f: Double, d: Double, m: Double) =>
        assert(java.lang.Double.doubleToLongBits(f) ==
          java.lang.Double.doubleToLongBits(d))
        assert(java.lang.Double.doubleToLongBits(m) ==
          java.lang.Double.doubleToLongBits(d))
      }
  }

  test("vector kernels reject non-floating-array inputs at analysis time") {
    import org.apache.spark.sql.graft.ColumnShim
    val df = Seq((Array(1L, 2L), "notavector")).toDF("ints", "s")
    def analyzed(c: org.apache.spark.sql.Column) =
      intercept[org.apache.spark.sql.AnalysisException] {
        df.select(c).queryExecution.analyzed
      }
    analyzed(TextFns.dot($"ints", $"ints"))
    analyzed(TextFns.dot($"s", $"s"))
    analyzed(ColumnShim.column(graft.expressions.HyperplaneBands(
      ColumnShim.expression($"ints"),
      (0 until 8).map(_ => (0 until 64).map(_ => 0.5)), 8)))
    analyzed(ColumnShim.column(
      graft.expressions.QuantizeStats(ColumnShim.expression($"s"), 64)))
  }

  test("TextShingles matches array_distinct(shingles(tokens(text)))") {
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "", " ")
    val texts = (0 until 40).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    } ++ Seq("", " ", "a", "a a a a a", "one  two   three")
    for (n <- Seq(1, 2, 3, 5)) {
      val df = texts.toDF("text")
        .select($"text", TextFns.shingleSet($"text", n).as("native"),
          chainShingles($"text", n).as("chain"),
          TextFns.shingleList($"text", n).as("native_all"),
          TextFns.shingles(TextFns.tokens($"text"), n).as("chain_all"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text='${r.getString(0)}'")
        assert(r.getSeq[String](3) == r.getSeq[String](4),
          s"non-distinct n=$n text='${r.getString(0)}'")
      }
    }
  }

  test("TextShingles hashed matches transform(shingleSet, hash60) bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "x", "", " ", "émoji🎈")
    val texts = (0 until 40).map { _ =>
      (0 until rnd.nextInt(15)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    } ++ Seq("", " ", "a", "a a a a a", "one  two   three")
    for (n <- Seq(1, 3, 5)) {
      val df = texts.toDF("text")
        .select($"text", TextFns.shingleSetHashed($"text", n).as("native"),
          transform(TextFns.shingleSet($"text", n),
            g => TextFns.hash60(g)).as("chain"))
      df.collect().foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n text='${r.getString(0)}'")
      }
    }
    // Null propagates like the string form.
    val rows = Seq(Option("one two three"), None).toDF("text")
      .select(TextFns.shingleSetHashed($"text", 3)).collect()
    assert(rows(0).getSeq[Long](0).nonEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("CharPairCounts matches the explode(charShingles(token, 2)) counts") {
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "aa", "x", "", "émoji🎈x", "🎈🎈")
    val texts = (0 until 40).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    } ++ Seq("", " ", "a", "ab ab ab", "one  two   three")
    val df = texts.toDF("text")
    // Chain oracle: per-text occurrence counts of every adjacent char
    // pair inside whitespace tokens of length >= 2.
    val chain = df.select($"text", explode(TextFns.tokens($"text")).as("t"))
      .filter(length($"t") >= 2)
      .select($"text", explode(TextFns.charShingles($"t", 2)).as("pair"))
      .groupBy("text", "pair").agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
    val native = df.select($"text", TextFns.charPairCounts($"text").as("m"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
    texts.distinct.foreach { t =>
      assert(native(t) == chain.getOrElse(t, Map.empty[String, Long]),
        s"text='$t'")
    }
    // Null propagates.
    val rows = Seq(Option("ab cd"), None).toDF("text")
      .select(TextFns.charPairCounts($"text")).collect()
    assert(rows(0).getMap[String, Long](0).nonEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("TextShingles: null text -> null, short text -> empty array") {
    val df = Seq(Option("one two"), None).toDF("text")
    val rows = df.select(TextFns.shingleSet($"text", 3)).collect()
    assert(rows(0).getSeq[String](0) == Seq.empty)
    assert(rows(1).isNullAt(0))
  }

  test("hash60 is non-negative and stable") {
    val df = Seq("a", "b", "tok tok").toDF("s")
      .select(TextFns.hash60($"s").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(_ >= 0))
    // md5("a") = 0cc175b9c0f1b6a8... -> first 15 hex digits as decimal
    assert(hs(0) == java.lang.Long.parseLong("0cc175b9c0f1b6a", 16))
  }

  test("SQL surface: all native kernels registered via extensions") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_shingles('a b c d', 3) AS s").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    val r2 = spark.sql(
      "SELECT graft_minhash('a b c d e', 3) AS mh, " +
        "graft_simhash('a b a') AS sh, " +
        "graft_char_fingerprint('abcdefghij', 8) AS fp, " +
        "graft_quantize_stats(array(0.5D, -1.0D), 2) AS qs").head()
    assert(r2.getSeq[Long](0).length == graft.operators.Dedup.NumHashes)
    assert(r2.getLong(1) != 0L)
    val fp = r2.getStruct(2)
    assert(fp.getInt(1) == 3) // 'abcdefghij' has 3 distinct 8-grams
    val qs = r2.getStruct(3)
    assert(qs.getLong(2) == -127L) // q_min: the max-abs element quantizes to ±127
  }

  test("MinHashSignature / SimHash60 match the grouped DataFrame formulations") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "ep", "ze", "x1", "77")
    val docs = (1L to 60L).map { id =>
      (id, (0 until rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")

    // Old MinHash formulation: explode shingles -> hash once -> 16 mins.
    val h = col("h")
    val mins = (0 until Dedup.NumHashes).map(i =>
      min((lit(Dedup.hashA(i)) * h + lit(Dedup.hashB(i))) % TextFns.MinHashPrime).as(s"m$i"))
    // The index stores the gram's hash60 (g60) — the permutation input
    // is g60 % p, identical to hashing the string directly.
    val oldMh = Dedup.shingleIndexOf(docs)
      .withColumn("h", col("g60") % TextFns.MinHashPrime)
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq).toMap
    val newMh = Dedup.minHashSignaturesOf(docs)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong).toSeq).toMap
    assert(newMh == oldMh)

    // Old SimHash formulation: tf -> 60 bit sums -> pack.
    val tf = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .withColumn("hh", TextFns.hash60(col("tok")))
    val bitSums = (0 until Dedup.SimHashBits).map { j =>
      sum(col("c") * (shiftright(col("hh"), j).bitwiseAND(1L) * 2L - 1L)).as(s"s$j")
    }
    val packed = (0 until Dedup.SimHashBits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val oldSh = tf.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newSh = Dedup.simHashSignaturesOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(newSh == oldSh)
  }

  test("QuantizeStats matches the HOF quantize chain bit-for-bit") {
    import org.apache.spark.sql.graft.ColumnShim
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 40).map(_ => Array.fill(64)(rnd.nextFloat() * 2f - 1f)) ++
      Seq(Array.fill(64)(0f)) // all-zero vector exercises the 1e-12 floor
    val df = vecs.toDF("embedding")
    // Original HOF formulation, kept as the test oracle.
    val v = transform($"embedding", _.cast("double"))
    val scale = greatest(array_max(transform(v, x => abs(x))), lit(1e-12)) / lit(127.0)
    val q = transform(v, x => floor(x / scale + lit(0.5)).cast("long"))
    val mse = aggregate(
      zip_with(v, q, (x, qq) => (x - qq.cast("double") * scale) * (x - qq.cast("double") * scale)),
      lit(0.0), (acc, e) => acc + e) / lit(64.0)
    val stats = ColumnShim.column(graft.expressions.QuantizeStats(
      ColumnShim.expression($"embedding"), 64))
    df.select(
      stats.getField("scale"), scale,
      stats.getField("q_sum"), aggregate(q, lit(0L), (acc, x) => acc + x),
      stats.getField("q_min"), array_min(q),
      stats.getField("q_max"), array_max(q),
      stats.getField("mse"), mse).collect().foreach { r =>
      def bits(i: Int) = java.lang.Double.doubleToLongBits(r.getDouble(i))
      assert(bits(0) == bits(1), "scale")
      assert(r.getLong(2) == r.getLong(3), "q_sum")
      assert(r.getLong(4) == r.getLong(5), "q_min")
      assert(r.getLong(6) == r.getLong(7), "q_max")
      assert(bits(8) == bits(9), "mse")
    }
    // Empty array -> null struct. Deliberately NOT the HOF behavior:
    // greatest(array_max(empty), 1e-12) skips the null and yields a
    // fictitious scale=1e-12/127 / q_sum=0 / mse=0 row; stats of a
    // zero-dim vector are undefined, so the kernel returns null (see
    // QuantizeStats scaladoc).
    val empty = Seq(Array.empty[Float]).toDF("embedding")
      .select(ColumnShim.column(graft.expressions.QuantizeStats(
        ColumnShim.expression($"embedding"), 64)))
    assert(empty.head().isNullAt(0))
  }

  test("SimHashMulti word pairing: both 60-bit md5 halves, salted digests per pair") {
    import org.apache.spark.sql.graft.ColumnShim
    // A one-token doc's signature word IS the token hash (a single
    // +1/-1 vote per bit), so the digest-split formula is directly
    // observable: word 2k = hex[1,15], word 2k+1 = hex[16,30] of
    // md5(pair-k string) — raw token for pair 0, "simd<k>_" salt after.
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def half(s: String, i: Int) = java.lang.Long.parseLong(md5hex(s).substring(15 * i, 15 * (i + 1)), 16)
    val words = Seq("zq1", "kx9")
    words.foreach { w =>
      val got = Seq(Tuple1(w)).toDF("text")
        .select(ColumnShim.column(graft.expressions.SimHashMulti(
          ColumnShim.expression($"text"), 60, 5)))
        .head().getSeq[Long](0)
      val want = Seq(half(w, 0), half(w, 1),
        half(s"simd1_$w", 0), half(s"simd1_$w", 1), half(s"simd2_$w", 0))
      assert(got == want, s"token $w: $got != $want")
    }
  }

  test("HyperplaneBands matches the declarative when(dot > 0) banding bit-for-bit") {
    import org.apache.spark.sql.graft.ColumnShim
    import graft.operators.Similarity
    val rnd = new scala.util.Random(57)
    // Include near-axis vectors (tiny components) so some plane dots
    // sit close to 0 — the strict `> 0` sign test must agree there too.
    val vecs = (0 until 40).map(_ => Array.fill(64)(rnd.nextDouble() * 2 - 1)) ++
      (0 until 10).map(_ => Array.fill(64)(rnd.nextDouble() * 2e-9 - 1e-9))
    val df = vecs.toDF("v")
    // The replaced declarative formulation, kept as the test oracle.
    def declarative(nBands: Int, planesPerBand: Int) =
      array((0 until nBands).map { b =>
        (0 until planesPerBand).map { p =>
          val plane = array((0 until Similarity.Dim).map(j =>
            lit(Similarity.planeValue(b * planesPerBand + p, j))): _*)
          when(TextFns.dot(plane, $"v") > 0, lit(1L << p)).otherwise(0L)
        }.reduce(_ + _)
      }: _*)
    // Floor rung (4×8) and an off-floor adaptive rung (6×12).
    Seq((4, 8), (6, 12)).foreach { case (nb, ppb) =>
      df.select(Similarity.bandedBuckets($"v", nb, ppb), declarative(nb, ppb))
        .collect().foreach { r =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"bands diverged at $nb×$ppb")
        }
    }
    // array<float> input widens per element exactly like toDoubleArray.
    val fdf = vecs.map(_.map(_.toFloat)).toDF("embedding")
    val fromFloat = fdf.select(ColumnShim.column(graft.expressions.HyperplaneBands(
      ColumnShim.expression($"embedding"),
      (0 until 32).map(i => (0 until 64).map(j => Similarity.planeValue(i, j))), 8)))
      .collect().map(_.getSeq[Long](0))
    val viaDouble = fdf
      .select(Similarity.bandedBuckets(transform($"embedding", _.cast("double")), 4, 8))
      .collect().map(_.getSeq[Long](0))
    fromFloat.zip(viaDouble).foreach { case (a, b) => assert(a == b) }
    // Null contract (a DELIBERATE divergence from the declarative
    // form, which banded a null vector into all-zero buckets): null
    // vector in → null bucket array out, so null vectors leave the
    // banding path at posexplode instead of forming a fake clique in
    // bucket 0 of every band.
    val ndf = Seq(Option.empty[Array[Double]], Some(Array.fill(64)(0.25)))
      .toDF("v")
    val nulls = ndf.select(Similarity.bandedBuckets($"v", 4, 8)).collect()
    assert(nulls(0).isNullAt(0))
    assert(!nulls(1).isNullAt(0))
  }

  test("CharNgramFingerprint matches the charShingles HOF pair, incl. short and non-BMP texts") {
    import org.apache.spark.sql.graft.ColumnShim
    val rnd = new scala.util.Random(31)
    val alphabet = "abcdefg hij"
    // Supplementary-plane stress: emoji (U+1F600) and mathematical
    // double-struck X (U+1D54F) are surrogate PAIRS in UTF-16 — a
    // char-indexed slicer miscounts them and splits pairs; `substr`
    // (the HOF side) counts code points.
    val nonBmp = Seq(
      "😀😀abcdefg😀hij",
      "abc𝕏defghij𝕏",
      "😀" * 12,         // pure emoji run
      "😀short")         // non-BMP and < n code points
    val texts = (0 until 40).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "short", "exactly8", "aaaaaaaaaaaa") ++ nonBmp
    val df = texts.toDF("text")
    val fp = ColumnShim.column(graft.expressions.CharNgramFingerprint(
      ColumnShim.expression($"text"), 8))
    df.select($"text",
      fp.getField("fp60"),
      array_min(transform(TextFns.charShingles($"text", 8), g => TextFns.hash60(g))),
      fp.getField("n_distinct"),
      size(array_distinct(TextFns.charShingles($"text", 8)))).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"fp60 for '${r.getString(0)}'")
      assert(r.getInt(3) == r.getInt(4), s"n_distinct for '${r.getString(0)}'")
    }
  }

  test("GraftExtensions registers its functions through the extensions hook") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must not throw
    assert(graft.plans.GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("graft_char_fingerprint", "graft_char_pairs", "graft_dot",
        "graft_minhash", "graft_quantize_stats", "graft_shingles",
        "graft_simhash"))
  }
}
