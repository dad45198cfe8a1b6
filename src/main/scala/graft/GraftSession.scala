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
      // Runtime (AQE) broadcast threshold, raised above the 10 MB
      // static default. The static threshold guards against broadcasts
      // planned from ESTIMATES (a wrong estimate OOMs the driver); the
      // adaptive one applies to MEASURED stage outputs, where Spark's
      // own guidance is that a higher bound is safe. The motivating
      // plan is the sf10 vendas_mart: the events-pivot side shuffles
      // 12 MB (150 k users x 6 cols) — just past 10 MB — so AQE kept a
      // sort-merge join whose fact-side Sort of 60 M rows spilled
      // 6.4 GB disk under the 8 GiB harness; at 48 MB the measured
      // 12 MB side broadcasts and the sort disappears. Sizing: a 48 MB
      // compressed stage inflates to a ~200 MB hash relation, well
      // inside an 8 GiB executor — and a pivot side that genuinely
      // outgrows the bound at 100 TB (e.g. 100 M users ~ 5 GB) is
      // MEASURED over it, so AQE falls back to the SMJ by itself;
      // nothing is hand-scheduled on a guess.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "48m")

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
