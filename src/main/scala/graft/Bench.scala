package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Full per-query record (timings + shuffle/spill) goes to a SIDE
    // FILE: the driver's stdout tail window has truncated the head of
    // the inline per-query map two rounds running. Stdout keeps only
    // the compact summary lines.
    val sidePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_SIDE", "bench_queries.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new tools.StageMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    def drain(): Unit =
      try org.apache.spark.graft.ListenerShim.drain(spark.sparkContext)
      catch { case _: java.util.concurrent.TimeoutException => () }
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

    /** Per-query bench outcome. `runs` counts SUCCESSFUL timings (of 3
      * attempted): a transient single-run failure degrades the sample
      * (flagged via `runs < 3`) instead of erasing the query; `min`/
      * `median` are over the successful runs only. Shuffle/spill MB are
      * per-run averages over the successful runs — every run re-executes
      * the full plan, so the per-run volume is deterministic and the
      * average just cancels the counter's accumulation.
      */
    final case class QRes(name: String, min: Double, median: Double, runs: Int,
        shuffleWriteMb: Double, shuffleReadMb: Double, spillMb: Double)

    // Deterministic run order (sorted by name) so per-query timings are
    // comparable across rounds — Map iteration order is hash-dependent.
    //
    // Action: a noop-format write, NOT .count() — count() lets Catalyst
    // prune every projection (and drop the sort) of a non-aggregate
    // query, so projection-heavy queries would measure scan+count
    // instead of their declared work. The noop sink evaluates every
    // output row/column and discards it.
    //
    // Each query is timed up to THREE times: the per-query number is
    // the MIN of the successful runs (this VM sees bursty host-level
    // CPU steal with 10-20x outliers on trivial projections, and min
    // rejects a stolen window) while the headline total sums the
    // per-query MEDIANS (a min-sum understates sustained cost; a
    // median tolerates one stolen window per query). Every run
    // re-executes the full plan — no result caching; only the
    // deliberately-persisted index frames above are warm, which is the
    // documented index-reuse behavior.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One listener window PER ATTEMPT (reset → run → drain →
      // snapshot), and only SUCCESSFUL attempts contribute bytes: a
      // failed run still executes part of its plan, and folding those
      // partial bytes into an average over successful runs would
      // inflate the per-run shuffle/spill volumes.
      def once(): Option[(Double, (Long, Long, Long, Long))] = {
        drain(); metrics.reset()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              drain()
              Some((dt, metrics.snapshot())) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name run failed: $e"); None }
      }
      val attempts = (1 to 3).flatMap(_ => once())
      val ts = attempts.map(_._1).sorted
      if (ts.isEmpty) QRes(name, -1.0, -1.0, 0, -1, -1, -1)
      else {
        def mb(f: ((Long, Long, Long, Long)) => Long) =
          attempts.map(a => f(a._2)).sum / 1e6 / ts.size
        QRes(name, ts.head, ts(ts.size / 2), ts.size,
          mb(_._1), mb(_._2), mb(t => t._3 + t._4))
      }
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale,
    // which can emit comma decimal separators and break the JSON.
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val ok = results.filter(_.runs > 0)
    val errors = results.collect { case q if q.runs == 0 => s"\"${q.name}\"" }
      .mkString("[", ",", "]")
    val reduced = results.collect { case q if q.runs > 0 && q.runs < 3 => s"\"${q.name}\"" }
      .mkString("[", ",", "]")
    val totalMedian = ok.map(_.median).sum
    val totalMin = ok.map(_.min).sum
    // Side file: the complete per-query record, one pretty-printed
    // entry per query, timings AND shuffle/spill volumes.
    val side = results.map { q =>
      s"""  "${q.name}": {"min_s": ${r3(q.min)}, "median_s": ${r3(q.median)}, "runs": ${q.runs}, "shuffle_write_mb": ${r3(q.shuffleWriteMb)}, "shuffle_read_mb": ${r3(q.shuffleReadMb)}, "spill_mb": ${r3(q.spillMb)}}"""
    }.mkString(
      s"""{\n  "_meta": {"sf": "$sfDir", "cpus": $cpus, "action": "noop-write", "index_build_s": ${r3(indexBuild)}, "prewarm_ok": $prewarmOk, "total_median_s": ${r3(totalMedian)}, "total_min_s": ${r3(totalMin)}, "n_queries": ${results.size}, "errors": $errors, "reduced_sample": $reduced},\n""",
      ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(sidePath),
      side.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Compact stdout record, totals first; per-query MINs inline as
    // before (rounded to 3 decimals) so the record is self-contained
    // when the side file isn't collected.
    val qs = results
      .map { q => "\"" + q.name + "\":" + (if (q.runs > 0) r3(q.min) else "-1") }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(totalMedian)},"unit":"sec","sf":"$sfDir","action":"noop-write,median-of-3 total,min-of-3 per query","total_min":${r3(totalMin)},"index_build":${r3(indexBuild)},"prewarm_ok":$prewarmOk,"n_queries":${results.size},"errors":$errors,"reduced_sample":$reduced,"side_file":"$sidePath","queries":$qs}""")
    // Short summary repeated LAST: if the record above ever outgrows
    // the driver's tail window again, the totals still land intact.
    println(s"""{"metric":"total","value":${r3(totalMedian)},"unit":"sec","sf":"$sfDir","total_min":${r3(totalMin)},"index_build":${r3(indexBuild)},"prewarm_ok":$prewarmOk,"n_queries":${results.size},"errors":$errors,"side_file":"$sidePath"}""")
    spark.stop()
  }
}
