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

  test("jdbcReplace round-trips through embedded Derby, replace drops old rows") {
    // Derby ships in /opt/spark/jars (Spark's Hive-metastore
    // dependency), so the reference's MySQL full-replace sink
    // (`s2g/vendas.py:173-180`, to_sql if_exists='replace') is
    // exercisable end-to-end without network: same DataSource JDBC
    // code path, different driver URL.
    val dbPath = tmpDir("derby_db") + "/graftdb"
    val t = Sinks.JdbcTarget(s"jdbc:derby:$dbPath;create=true", "TB_VENDAS", "", "")
    Sinks.jdbcReplace(
      Seq((1L, "ana", 10.5), (2L, "bia", 20.0)).toDF("id", "nome", "total"), t,
      numPartitions = 2)
    val back1 = spark.read.format("jdbc")
      .option("url", t.url).option("dbtable", t.table).load()
    assert(back1.count() == 2)
    assert(back1.columns.toSet == Set("id", "nome", "total"))

    // Full replace: the second write must drop the first load's rows,
    // exactly like pandas to_sql(if_exists='replace').
    Sinks.jdbcReplace(Seq((9L, "carla", 1.0)).toDF("id", "nome", "total"), t)
    val back2 = spark.read.format("jdbc")
      .option("url", t.url).option("dbtable", t.table).load()
    assert(back2.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("schema evolution: mergeSchema unions evolving silver files; old rows null-fill") {
    // A silver table that gained a column mid-life — the standard
    // lakehouse evolution case. mergeSchema reconciles the footers;
    // rows from the pre-evolution files surface the new column as
    // null (exactly the by-name alignment semantics IngestJob gives
    // drifting CSV).
    val path = tmpDir("evolve") + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(path)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2_added").write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", true).parquet(path)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2_added"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("v2_added")))
    assert(byId(2L).getDouble(merged.columns.indexOf("v2_added")) == 9.5)
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
