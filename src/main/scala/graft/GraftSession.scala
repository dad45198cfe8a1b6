package graft

import org.apache.spark.sql.SparkSession

/** One-time session-setup home for the SQL confs every graft entry
  * point needs — previously `Tables.events` set `nanosAsLong` inside
  * the accessor on every call (a global side effect in a reader).
  *
  * Why the confs exist:
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the harness
  *    `events.parquet` stores `ts` as TIMESTAMP(NANOS) in one data
  *    generation, which the vectorized reader otherwise rejects
  *    ([PARQUET_TYPE_ILLEGAL]); with the flag the column reads as raw
  *    int64 nanos and [[Tables.normalizeTs]] divides down to micros.
  *  - `spark.sql.session.timeZone=UTC`: the other generation stores
  *    TIMESTAMP(MICROS) without UTC adjustment (read as
  *    TIMESTAMP_NTZ), and its cast to TimestampType is a pure
  *    reinterpretation only under UTC — [[Tables.normalizeTs]]
  *    asserts this rather than assuming it.
  */
object GraftSession {
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  /** Apply the graft session confs at build time. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config(NanosAsLong, "true")
      // Propagate the per-bucket sort order of the bucketed-silver
      // tables (VendasMart.bucketedSilver writes one sorted file per
      // bucket) into join planning — SPARK-28113 made the propagation
      // opt-in, and without it a bucketed SMJ is exchange-free but
      // re-sorts every bucket on every mart build, forfeiting half the
      // layout's win. Harmless for non-bucketed reads.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // The AQE broadcast threshold stays at Spark's default. A raised
      // 48 MB bound shipped briefly to fix the sf10 mart pivot spill,
      // but the mart now pins its pivot and dimension joins with
      // explicit broadcast/SHUFFLE_HASH hints sized from counted
      // bounds (VendasMart), so the global raise had exactly one
      // remaining effect in the whole 83-query registry: it flipped a
      // ~40 MB measured stage inside q_dedup_jaccard's prefix-filter
      // join to a broadcast-hash join (shuffle 15,059→14,574 MB) that
      // is SLOWER — the single-process hash relation inflates to
      // ~200 MB and every probe thread contends on it, losing the
      // sort-merge join's streaming locality. Isolated same-window A/B
      // at sf10/local[32]: SMJ min 51.5 s / median 55.9 s vs BHJ
      // 58.1 s / 70.0 s (3 runs each, probe floors 70/75 ms, mem
      // probes quiet; tools/run_bench.sh with SPARK_GRAFT_AQE_BROADCAST
      // isolating the conf). Lesson recorded in SCALE.md: a measured
      // broadcast is safe against OOM but not automatically faster —
      // raise the bound only per-plan, with hints, from an A/B.

  /** Idempotent guard for sessions built OUTSIDE the library's entry
    * points (the driver smoke-checks `SparkEntry.entry` with its own
    * session): reading `events.parquet` of the nanos generation fails
    * at schema time without the flag, so accessors that touch events
    * call this first. No-op when the conf is already set.
    */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    if (!spark.conf.getOption(NanosAsLong).contains("true"))
      spark.conf.set(NanosAsLong, "true")
}
