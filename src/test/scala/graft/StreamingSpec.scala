package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.sources.OlistCatalog
import graft.streaming.Streaming
import graft.streaming.Streaming.Event

/** Structured Streaming paths: AvailableNow file ingest equals the
  * batch ingest (the @once generalization claim, SURVEY.md §2.7),
  * watermarked windows aggregate correctly, and the stateful
  * sessionizer closes sessions on gap boundaries.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("AvailableNow CSV ingest stream writes the same silver as batch") {
    val bronze = tmpDir("sbronze")
    val silver = tmpDir("ssilver")
    val ckpt = tmpDir("sckpt")
    val p = Paths.get(bronze, "olist/customers", "a.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state\n" +
        "c1,u1,01310,sao paulo,SP\nc2,u2,20040,rio,RJ")

    val q = Streaming.ingestStream(spark, OlistCatalog.customers, bronze, silver, ckpt)
    q.awaitTermination(60000)
    val out = spark.read.parquet(s"$silver/olist/customers")
    assert(out.count() == 2)
    assert(out.columns.sorted.toSeq ==
      OlistCatalog.customers.schema.fieldNames.sorted.toSeq)

    // Incremental restart: a new bronze object is picked up exactly once.
    Files.writeString(Paths.get(bronze, "olist/customers", "b.csv"),
      "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state\n" +
        "c3,u3,30110,bh,MG")
    val q2 = Streaming.ingestStream(spark, OlistCatalog.customers, bronze, silver, ckpt)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$silver/olist/customers").count() == 3)
  }

  test("watermarked tumbling window aggregates by hour and type") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streaming.windowedCounts(df, "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    mem.addData(
      (Timestamp.valueOf("2024-05-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-05-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-05-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_agg").orderBy("window_start", "event_type").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2)      // both clicks in 10:00 window
    assert(rows(0).getAs[Double]("total_value") == 3.0)
    assert(rows(1).getAs[String]("event_type") == "view")
  }

  test("flatMapGroupsWithState sessionizer closes sessions on the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = Streaming.sessionize(mem.toDS())
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // User 1: two events 5 min apart (one session), then a 2h gap, then
    // another event (second session). A later watermark-advancing event
    // from user 2 forces the first session's timeout to fire.
    mem.addData(
      Event(1L, Timestamp.valueOf("2024-05-01 10:00:00"), "click", 1.0),
      Event(1L, Timestamp.valueOf("2024-05-01 10:05:00"), "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(1L, Timestamp.valueOf("2024-05-01 12:05:00"), "click", 4.0))
    q.processAllAvailable()
    mem.addData(Event(2L, Timestamp.valueOf("2024-05-01 15:00:00"), "click", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").orderBy("session_start").collect()
    q.stop()
    assert(rows.nonEmpty)
    val first = rows(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Timestamp]("session_start") == Timestamp.valueOf("2024-05-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == Timestamp.valueOf("2024-05-01 10:05:00"))
    assert(first.getAs[Long]("n_events") == 2)
    assert(first.getAs[Double]("total_value") == 3.0)
  }

  test("streaming exact dedup: dropDuplicates within watermark emits each key once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "doc_key")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = df.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    mem.addData(
      (Timestamp.valueOf("2024-05-01 10:00:00"), "a"),
      (Timestamp.valueOf("2024-05-01 10:01:00"), "a"),
      (Timestamp.valueOf("2024-05-01 10:02:00"), "b"))
    q.processAllAvailable()
    mem.addData((Timestamp.valueOf("2024-05-01 10:03:00"), "a"))
    q.processAllAvailable()
    val keys = spark.table("stream_dedup").collect().map(_.getString(1)).sorted
    q.stop()
    assert(keys.toSeq == Seq("a", "b"))
  }
}
