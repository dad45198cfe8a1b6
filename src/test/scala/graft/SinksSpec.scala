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

  test("jsonl corpus interchange: gzipped shards round-trip the documents table") {
    val src = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val path = tmpDir("jsonl") + "/docs"
    Sinks.jsonl(src, path)
    // Shards are gzip, per the interchange convention.
    val files = new java.io.File(path).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = Sinks.readJsonl(spark, path, src.schema)
    assert(back.schema == src.schema)
    val a = src.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"jsonl round-trip lost rows: ${a.size} vs ${b.size}")

    // A corrupt line in a shard must fail the read loudly (FAILFAST),
    // not dissolve into an all-null row.
    val badDir = tmpDir("jsonl_bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(badDir, "shard.json"),
      """{"doc_id": 1, "lang": "en", "text": "ok", "n_chars": 2}
        |this is not json
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      Sinks.readJsonl(spark, badDir, src.schema).collect()
    }
  }

  test("MySQL dialect maps the TB_VENDAS gold schema to the expected DDL types") {
    // The reference's real sink is MySQL (`s2g/vendas.py:173-180`,
    // BD_STACK.TB_VENDAS); no MySQL server or driver exists offline,
    // but the DDL Spark would generate is decided locally by the
    // registered MySQLDialect + the common JDBC fallback — pin that
    // type mapping for the actual gold mart schema so the one
    // environment-blocked surface is still contract-tested.
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val dialect = JdbcDialects.get("jdbc:mysql://db:3306/BD_STACK")
    // Mirrors JdbcUtils.getJdbcType: dialect override, else the common
    // JDBC type (the exact pairs Spark uses for these Catalyst types).
    def ddl(dt: DataType): String =
      dialect.getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse(dt match {
        case LongType => "BIGINT"
        case IntegerType => "INTEGER"
        case DoubleType => "DOUBLE PRECISION"
        case DateType => "DATE"
        case other => fail(s"unexpected gold mart type $other")
      })
    val schema = graft.operators.VendasMart.mart(spark, "/root/testdata/sf0.001").schema
    val m = schema.fields.map(f => f.name -> ddl(f.dataType)).toMap
    assert(m("PEDIDO") == "BIGINT")
    assert(m("DATA_VENDA") == "DATE") // to_date cast survives as SQL DATE
    // Money columns land as DOUBLE PRECISION (MySQL accepts the ANSI
    // alias), matching pandas to_sql's DOUBLE for float64.
    Seq("VALOR_VENDA", "VALOR_DESCONTO", "VALOR_CLICK", "VALOR_ERROR",
      "VALOR_PURCHASE", "VALOR_SIGNUP", "VALOR_VIEW").foreach { c =>
      assert(m(c) == "DOUBLE PRECISION", c)
    }
    // SPARK-34333: the MySQL dialect maps StringType to LONGTEXT.
    Seq("CATEGORIA_PRODUTO", "SEGMENTO_CLIENTE").foreach { c =>
      assert(m(c) == "LONGTEXT", c)
    }
    // Beyond the per-type pins above (which mirror JdbcUtils),
    // generate the actual CREATE TABLE column list through Spark's own
    // JdbcUtils.schemaString — the exact string a
    // `df.write.jdbc("jdbc:mysql://...", "TB_VENDAS")` would execute —
    // and assert every column lands with its pinned MySQL type and the
    // dialect's backtick quoting.
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    val createCols = JdbcUtils.schemaString(dialect, schema, true, None)
    schema.fields.foreach { f =>
      assert(createCols.contains(s"`${f.name}` ${m(f.name)}"),
        s"${f.name}: expected `${f.name}` ${m(f.name)} in $createCols")
    }
    // Count backtick-quoted column-name occurrences rather than
    // splitting on commas — a future DECIMAL(p,s)/VARCHAR(n) column
    // type would embed a comma and silently skew a comma-split count.
    val colOccurrences = schema.fields.map { f =>
      val needle = s"`${f.name}`"
      createCols.sliding(needle.length).count(_ == needle)
    }
    assert(colOccurrences.forall(_ == 1) &&
      colOccurrences.length == schema.fields.length, createCols)
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
