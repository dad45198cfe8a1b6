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
    // Build the memoized index frames (shingle index, MinHash
    // signatures, LSH pairs, clusters) BEFORE timing starts and charge
    // them to a separate `index_build` line — otherwise the first
    // dedup-family query in run order pays the one-time build and
    // per-query numbers become order-dependent.
    val tIx0 = System.nanoTime()
    // A failed prewarm must be LOUD: it silently reverts per-query
    // numbers to order-dependent (the first dedup query re-absorbs the
    // index build) — surface it on stderr and in the record.
    val prewarmOk =
      try { operators.Dedup.prewarm(spark, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] prewarm FAILED, timings order-dependent: $e")
        false
      }
    val indexBuild = (System.nanoTime() - tIx0) / 1e9
    // Deterministic run order (sorted by name) so per-query timings are
    // comparable across rounds — Map iteration order is hash-dependent.
    //
    // Action: a noop-format write, NOT .count() — count() lets Catalyst
    // prune every projection (and drop the sort) of a non-aggregate
    // query, so projection-heavy queries would measure scan+count
    // instead of their declared work. The noop sink evaluates every
    // output row/column and discards it.
    //
    // Each query is timed THREE times: the per-query number is the MIN
    // (this VM sees bursty host-level CPU steal with 10-20x outliers on
    // trivial projections, and min rejects a stolen window) while the
    // headline total sums the per-query MEDIANS (a min-sum understates
    // sustained cost; a median tolerates one stolen window per query).
    // Every run re-executes the full plan — no result caching; only the
    // deliberately-persisted index frames above are warm, which is the
    // documented index-reuse behavior.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (t1, ok1) = once()
      if (!ok1) (name, -1.0, -1.0, false)
      else {
        val (t2, ok2) = once()
        val (t3, ok3) = if (ok2) once() else (t2, ok2)
        if (!(ok2 && ok3)) (name, -1.0, -1.0, false)
        else {
          val ts = Seq(t1, t2, t3).sorted
          (name, ts.head, ts(1), true)
        }
      }
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // which can emit comma decimal separators and break the JSON.
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Compact record, totals first: per-query values rounded to 3
    // decimals keep the whole line inside the driver's tail window
    // (round 3's full-precision line was truncated mid-JSON).
    val qs = results
      .map { case (k, mn, _, ok) => "\"" + k + "\":" + (if (ok) r3(mn) else "-1") }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val ok = results.filter(_._4)
    val totalMedian = ok.map(_._3).sum
    val totalMin = ok.map(_._2).sum
    println(s"""{"metric":"total","value":${r3(totalMedian)},"unit":"sec","sf":"$sfDir","action":"noop-write,median-of-3 total,min-of-3 per query","total_min":${r3(totalMin)},"index_build":${r3(indexBuild)},"prewarm_ok":$prewarmOk,"n_queries":${results.size},"errors":$errors,"queries":$qs}""")
    // Short summary repeated LAST: if the record above ever outgrows
    // the driver's tail window again, the totals still land intact.
    println(s"""{"metric":"total","value":${r3(totalMedian)},"unit":"sec","sf":"$sfDir","total_min":${r3(totalMin)},"index_build":${r3(indexBuild)},"prewarm_ok":$prewarmOk,"n_queries":${results.size},"errors":$errors}""")
    spark.stop()
  }
}
