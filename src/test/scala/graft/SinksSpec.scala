package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Partitioned-sink semantics: dynamic overwrite replaces only the
  * partitions present in the incoming frame, and reads with a
  * partition-key predicate prune to those directories (the scan shows
  * PartitionFilters and reads a subset of files).
  */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("dynamic partition overwrite replaces only incoming partitions") {
    val path = tmpDir("gold_part") + "/mart"
    val day1 = Seq((1L, "2024-05-01", 10.0), (2L, "2024-05-01", 20.0))
    val day2 = Seq((3L, "2024-05-02", 30.0))
    Sinks.partitionedParquet(
      (day1 ++ day2).toDF("id", "d", "v"), path, Seq("d"))
    assert(spark.read.parquet(path).count() == 3)

    // Rebuild ONLY day2 with corrected values.
    Sinks.partitionedParquet(
      Seq((3L, "2024-05-02", 99.0), (4L, "2024-05-02", 1.0)).toDF("id", "d", "v"),
      path, Seq("d"))
    val back = spark.read.parquet(path)
    assert(back.count() == 4) // day1's 2 rows untouched + day2's new 2
    assert(back.filter($"d" === "2024-05-01").count() == 2)
    assert(back.filter($"d" === "2024-05-02" && $"v" === 99.0).count() == 1)
  }

  test("partition-key predicates prune at the scan (PartitionFilters)") {
    val path = tmpDir("gold_part2") + "/mart"
    Sinks.partitionedParquet(
      (1 to 100).map(i => (i.toLong, f"2024-05-${i % 4 + 1}%02d", i * 1.0))
        .toDF("id", "d", "v"),
      path, Seq("d"))
    val q = spark.read.parquet(path).filter($"d" === "2024-05-01")
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), scan)
    // Spark planned partition pruning; the filter appears as a
    // partition filter (not a data filter) on the scan node.
    assert(scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("d"), scan)
    assert(q.count() == 25)
  }
}
