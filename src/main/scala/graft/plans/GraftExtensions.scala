package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{CharNgramFingerprint, CharPairCounts, DotProduct, MinHashSignature, QuantizeStats, SimHash60, TextShingles}
import graft.functions.TextFns
import graft.operators.Dedup

/** SQL-surface registration for the native graft expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * after which `graft_dot(a, b)` and `graft_shingles(text, n)` are
  * callable from `spark.sql(...)` exactly like built-ins — same
  * codegen, no UDF wrapping. For an already-running session (tests,
  * notebooks) use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples in the shape `injectFunction` and
    * `FunctionRegistry.registerFunction` share.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        { args =>
          require(args.length == 2, "graft_dot(arrayA, arrayB)")
          DotProduct(args(0), args(1))
        }),
      (FunctionIdentifier("graft_shingles"),
        new ExpressionInfo(classOf[TextShingles].getName, "graft_shingles"),
        { args =>
          require(args.length == 2, "graft_shingles(text, n)")
          TextShingles(args(0), intLit(args(1), "shingle size n"))
        }),
      (FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
        { args =>
          require(args.length == 2, "graft_minhash(text, shingleN)")
          // Library-default permutations — the same constants the Dedup
          // pipeline uses, so SQL users land on the identical index.
          MinHashSignature(args(0), intLit(args(1), "shingle size n"),
            TextFns.MinHashPrime,
            (0 until Dedup.NumHashes).map(Dedup.hashA),
            (0 until Dedup.NumHashes).map(Dedup.hashB))
        }),
      (FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash"),
        { args =>
          require(args.length == 1, "graft_simhash(text)")
          SimHash60(args(0), Dedup.SimHashBits)
        }),
      (FunctionIdentifier("graft_char_fingerprint"),
        new ExpressionInfo(classOf[CharNgramFingerprint].getName, "graft_char_fingerprint"),
        { args =>
          require(args.length == 2, "graft_char_fingerprint(text, n)")
          CharNgramFingerprint(args(0), intLit(args(1), "gram size n"))
        }),
      (FunctionIdentifier("graft_char_pairs"),
        new ExpressionInfo(classOf[CharPairCounts].getName, "graft_char_pairs"),
        { args =>
          require(args.length == 1, "graft_char_pairs(text)")
          CharPairCounts(args(0))
        }),
      (FunctionIdentifier("graft_quantize_stats"),
        new ExpressionInfo(classOf[QuantizeStats].getName, "graft_quantize_stats"),
        { args =>
          require(args.length == 2, "graft_quantize_stats(vector, dim)")
          QuantizeStats(args(0), intLit(args(1), "dim"))
        }))

  /** Imperative registration into a live session (the extensions hook
    * only runs at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, id, info, builder)
    }
}
