package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the harness star-schema tables (see TESTDATA.md /
  * FIXTURES.md §A). One parquet file per table under `sfDir`.
  *
  * Mirrors the reference's dataset catalog (SURVEY.md §1): the silver
  * layer is "one Parquet object per table" (reference
  * `scripts/bronze_to_silver/ingestion_customer_bronze_to_silver.py:74-78`);
  * here the scale-factor directory plays the role of the silver bucket.
  *
  * Scans stay lazy `spark.read.parquet` handles — Catalyst prunes columns
  * and pushes predicates into the vectorized parquet reader, so callers
  * should `.select`/`.filter` directly on these frames rather than
  * materializing them. At cluster scale the same accessors work on
  * `s3a://` paths unchanged.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the
    * raw int64 nanos and integer-divide down to microseconds — the same
    * truncation DuckDB applies when it reads the file — so both engines
    * see identical values.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
