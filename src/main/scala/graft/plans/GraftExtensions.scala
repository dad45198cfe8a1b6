package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{DotProduct, TextShingles}

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
        }))

  /** Imperative registration into a live session (the extensions hook
    * only runs at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, id, info, builder)
    }
}
