package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins [[Tables.normalizeTs]] across BOTH harness data generations of
  * `events.parquet` — int64 TIMESTAMP(NANOS) (read as LongType under
  * `nanosAsLong`) and TIMESTAMP(MICROS) without UTC adjustment (read
  * as TIMESTAMP_NTZ). The harness only ever ships one generation at a
  * time, so whichever branch the live testdata doesn't exercise is
  * covered here by fixture.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // Two instants, microsecond precision (what both generations carry).
  private val micros = Seq(1700000000123456L, 1712345678000001L)

  private def writeFixture(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events: NTZ-micros generation normalizes equal to the nanos generation") {
    // Nanos generation: under nanosAsLong the physical TIMESTAMP(NANOS)
    // column arrives as raw int64 nanos, i.e. LongType — the fixture
    // writes that post-read shape directly.
    val nanosDir = writeFixture(tmpDir("ev_nanos"),
      micros.map(_ * 1000L).toDF("ts").withColumn("user_id", lit(1L)))
    // NTZ generation: micros without UTC adjustment.
    val ntzDir = writeFixture(tmpDir("ev_ntz"),
      micros.toDF("us")
        .select(expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"),
          lit(1L).as("user_id")))

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val av = a.select(unix_micros(col("ts"))).as[Long].collect().sorted
    val bv = b.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(av.toSeq == micros.sorted, av.toSeq)
    assert(bv.toSeq == micros.sorted, bv.toSeq)
  }

  test("events: NTZ normalization refuses a non-UTC session instead of shifting") {
    val ntzDir = writeFixture(tmpDir("ev_ntz_tz"),
      micros.toDF("us")
        .select(expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"),
          lit(1L).as("user_id")))
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/Sao_Paulo")
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, ntzDir).collect()
      }
      assert(e.getMessage.contains("UTC"), e.getMessage)
    } finally spark.conf.set(tzKey, saved)
  }
}
