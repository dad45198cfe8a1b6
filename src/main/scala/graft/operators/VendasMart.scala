package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Flagship denormalized sales mart — the reference's silver→gold
  * "vendas" job re-expressed Spark-first over the harness star schema.
  *
  * Reference lineage (`/root/reference/scripts/silver_to_gold/
  * ingestion_vendas_silver_to_gold.py`):
  *   - scan 5 silver tables + project (`:44-104`)          → pruned parquet scans
  *   - pivot-sum payments by payment_type (`:91-92`)       → events pivot by event_type
  *   - 4-way left join onto the item grain (`:107-111`)    → lineitem ⟕ orders ⟕ part ⟕ customer ⟕ pivot
  *   - fillna(0) on money columns (`:114-120`)             → na.fill(0.0, ...)
  *   - to-date cast (`:123`), upper (`:126-127`),
  *     replace "_"↔" " (`:130`)                            → to_date / upper / translate
  *   - Portuguese rename map (`:133-149`)                  → aliased select
  *
  * Scale notes (100 TB design):
  *   - The pivot is a partial-aggregating hash aggregate on the grouping
  *     key (map-side combine), shuffled once on `user_id`; the explicit
  *     value list pins the output schema so no extra distinct-values job
  *     runs (Spark would otherwise launch one to discover pivot columns).
  *   - All joins are declarative equi-joins: Catalyst/AQE picks
  *     broadcast-hash for dimension sides under the threshold and
  *     sort-merge beyond it; nothing is hand-scheduled.
  *   - Only referenced columns are selected, so the parquet scans read
  *     5/11, 3/6, 2/6 and 3/5 columns respectively (visible as ReadSchema
  *     in `.explain("formatted")`).
  */
object VendasMart {

  /** Pivot event amounts per user into one column per event type.
    * Mirror of the payments pivot-sum (reference `s2g/vendas.py:91-92`).
    * The explicit value list keeps the schema stable even when a type is
    * absent at a given scale factor — same reason the reference's fillna
    * lists all five payment types (`s2g/vendas.py:116-120`).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def pivotEvents(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .sum("value")

  def eventsPivot(spark: SparkSession, sfDir: String): DataFrame =
    pivotEvents(Tables.events(spark, sfDir))

  def mart(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    martFrom(spark, sfDir, li, ord)
  }

  /** Silver-layout bucketing option for the mart's one at-scale SMJ.
    *
    * Past the broadcast thresholds the lineitem⟕orders join is a
    * sort-merge join whose both sides exchange on the order key
    * (measured 1,115 MB of shuffle at sf3 — SCALE.md). A silver layer
    * that WRITES the two fact tables bucketed+sorted on that key pays
    * that shuffle once at ingest; every downstream mart build then
    * sort-merge-joins bucket-to-bucket with no exchange and no sort —
    * the standard warehouse layout for a join key that every gold job
    * reuses. At 100 TB this is the difference between re-shuffling two
    * fact tables per mart build and never shuffling them again.
    *
    * The writer repartitions onto the bucket column FIRST (same
    * murmur3-pmod hash as the bucket id), so every bucket lands in
    * exactly ONE file: Spark only trusts (and reuses) the `sortBy`
    * ordering when a bucket is a single file — multiple part-files per
    * bucket would keep a SortExec under the downstream SMJ even though
    * the exchange is gone. Sort elision additionally requires
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * (SPARK-28113 made ordering propagation opt-in in Spark 3.0);
    * without the flag the join is exchange-free but re-sorts each
    * bucket locally — a streaming pass over already-sorted data.
    * BucketingSpec pins both regimes: no exchange always, and no sort
    * with the flag set.
    *
    * Bucket metadata lives in the session catalog (`saveAsTable` —
    * path-only parquet has nowhere to record it), so the tables land
    * in the warehouse under the given names.
    */
  def bucketedSilver(spark: SparkSession, sfDir: String, nBuckets: Int,
      liTable: String = "graft_silver_lineitem_b",
      ordTable: String = "graft_silver_orders_b"): Unit = {
    // `mode("overwrite")` only overwrites a table the CATALOG knows.
    // With the default in-memory catalog, a warehouse directory left
    // by a previous JVM (killed run, fresh session over the same repo)
    // is stale data with no catalog entry, and saveAsTable fails with
    // LOCATION_ALREADY_EXISTS instead of overwriting. Clear such
    // orphaned locations first; a table the catalog DOES know follows
    // the normal overwrite path untouched.
    clearStaleLocation(spark, liTable)
    clearStaleLocation(spark, ordTable)
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_discount")
      .repartition(nBuckets, col("l_orderkey"))
      .write.bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").format("parquet").saveAsTable(liTable)
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate")
      .repartition(nBuckets, col("o_orderkey"))
      .write.bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").format("parquet").saveAsTable(ordTable)
  }

  /** Delete a managed-table location that exists on disk but has no
    * catalog entry (see [[bucketedSilver]]). Default-database managed
    * tables live at `<warehouse.dir>/<name lowercase>`.
    */
  private def clearStaleLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) dropLocation(spark, table)

  /** Unconditionally delete a table's default warehouse location —
    * the rebuild-path companion to a `DROP TABLE IF EXISTS` (dropping
    * an EXTERNAL table leaves its files; the subsequent managed CTAS
    * into the non-empty location would throw).
    */
  private def dropLocation(spark: SparkSession, table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** The mart over a bucketed silver layout (see [[bucketedSilver]]):
    * identical dataflow, fact sides read from the bucketed catalog
    * tables so the l_orderkey=o_orderkey SMJ plans exchange-free.
    */
  def martBucketed(spark: SparkSession, sfDir: String,
      liTable: String = "graft_silver_lineitem_b",
      ordTable: String = "graft_silver_orders_b"): DataFrame =
    martFrom(spark, sfDir, spark.table(liTable), spark.table(ordTable))

  /** Default bucket count for [[ensureBucketedSilver]]. 32 matches the
    * local harness's cores — a bucketed join runs one task per bucket,
    * so fewer buckets than cores idles the difference in every
    * downstream mart build (measured: 16 buckets on 32 cores gave the
    * bucketed mart no wall-clock win at sf10 despite the elided
    * exchange). A real deployment sizes it to executors × target file
    * size, the same knob as any warehouse bucketing DDL.
    */
  val SilverBuckets = 32

  /** One-time per-(session, corpus) bucketed-silver build backing
    * `q_vendas_mart_bucketed` — the [[graft.operators.Dedup]]
    * index-memo contract applied to the layout: repeated invocations
    * return the same catalog table names without re-writing. Table
    * names carry a corpus tag so two scale dirs never collide in one
    * warehouse; a concurrent double-build is benign (`overwrite`,
    * idempotent). Stopped-session keys are swept like the Dedup
    * caches.
    */
  private val silverCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, String)]
  /** Test hook: forget memoized layouts so a spec can exercise the
    * re-register / rebuild paths within one JVM.
    */
  private[graft] def resetSilverCache(): Unit = silverCache.clear()
  def ensureBucketedSilver(spark: SparkSession, sfDir: String): (String, String) = {
    silverCache.keySet.foreach { k =>
      if (k._1.sparkContext.isStopped) silverCache.remove(k)
    }
    silverCache.getOrElseUpdate((spark, sfDir), {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_|_$", "")
      val li = s"graft_silver_lineitem_b_$tag"
      val ord = s"graft_silver_orders_b_$tag"
      val liSrc = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_discount")
      val ordSrc = Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val reused =
        reRegisterSilver(spark, sfDir, li, "l_orderkey", liSrc.schema) &&
        reRegisterSilver(spark, sfDir, ord, "o_orderkey", ordSrc.schema)
      if (!reused) {
        // The reuse attempt may have half-succeeded (lineitem
        // re-registered as an EXTERNAL table, orders refused — e.g. a
        // prior session died between the two stamp writes). Rebuilding
        // through that state breaks: saveAsTable(Overwrite) DROPS an
        // external table but leaves its files, and the managed CTAS
        // into the non-empty warehouse location then throws. So the
        // rebuild path first drops BOTH names from the catalog and
        // deletes BOTH warehouse locations unconditionally.
        Seq(li, ord).foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          dropLocation(spark, t)
        }
        // Fingerprint the source corpus BEFORE the build reads it: a
        // corpus regenerated between the build's read and a post-build
        // listing would stamp the NEW listing onto buckets built from
        // the OLD data — the exact staleness the stamp exists to catch.
        val src = sourceStamp(spark, sfDir)
        bucketedSilver(spark, sfDir, SilverBuckets, li, ord)
        // Stamp only on a fresh build: re-stamping on the reuse path
        // would re-date a layout built from an OLDER corpus if the
        // source were regenerated mid-session.
        stampSilverWith(spark, li, src)
        stampSilverWith(spark, ord, src)
      }
      (li, ord)
    })
  }

  /** Re-attach a bucketed-silver layout left by a PREVIOUS session.
    *
    * The layout lives in the warehouse directory, but the bucket/sort
    * metadata lives in the session catalog — and the default catalog
    * is in-memory, so a new JVM sees the files with no table entry and
    * [[bucketedSilver]] would delete and rebuild them (75 s of every
    * sf10 bench leg's index_build for a layout that production
    * amortizes exactly once). Spark's own answer to "files already
    * bucketed, catalog empty" is external-table DDL: `CREATE TABLE …
    * USING PARQUET CLUSTERED BY … SORTED BY … INTO n BUCKETS
    * LOCATION path` re-registers the existing bucket files (bucket
    * ids are carried in the writer's file names) without touching a
    * byte.
    *
    * Staleness guard: a `_graft_src_stamp` file written next to the
    * bucket files records the SOURCE corpus's (path, length, mtime)
    * listing at build time. Reuse happens only when the current
    * source listing matches byte-for-byte — a regenerated corpus
    * under the same dir (the scale-ladder workflow: gen_scale.py
    * overwrites /tmp/graft_sfN) mismatches and triggers a rebuild,
    * never a silent read of stale buckets.
    *
    * @return true iff the existing layout was re-registered.
    */
  private[graft] def reRegisterSilver(spark: SparkSession, sfDir: String,
      table: String, bucketCol: String,
      schema: org.apache.spark.sql.types.StructType): Boolean = {
    if (spark.catalog.tableExists(table)) return true
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = new org.apache.hadoop.fs.Path(path, "_graft_src_stamp")
    if (!fs.exists(path) || !fs.exists(stamp)) return false
    val recorded =
      try {
        val in = fs.open(stamp)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: Throwable => return false }
    // The stamp records BOTH sides of the contract: the source corpus
    // it was built from AND the layout's own bucket-file count. The
    // second check catches a directory whose stamp survived but whose
    // bucket files were partially deleted — Spark would silently scan
    // whatever files remain and return fewer rows.
    if (recorded != s"${sourceStamp(spark, sfDir)}\n${layoutLine(fs, path)}")
      return false
    spark.sql(
      s"""CREATE TABLE $table (${schema.toDDL}) USING PARQUET
         |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
         |INTO $SilverBuckets BUCKETS
         |LOCATION '${path.toString}'""".stripMargin)
    true
  }

  /** The source-corpus listing the stamp records: every regular file
    * under the sf dir's lineitem/orders parquet, as (path, length,
    * mtime) lines — the cheapest fingerprint that still catches a
    * regenerated corpus (gen_scale.py rewrites both files).
    */
  private def sourceStamp(spark: SparkSession, sfDir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    (s"buckets=$SilverBuckets" +:
    Seq("lineitem.parquet", "orders.parquet").flatMap { name =>
      val p = new org.apache.hadoop.fs.Path(sfDir, name)
      val fs = p.getFileSystem(conf)
      def files(s: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
        if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(files)
        else Seq(s)
      if (fs.exists(p)) files(fs.getFileStatus(p))
        .sortBy(_.getPath.toString)
        .map(s => s"${s.getPath} ${s.getLen} ${s.getModificationTime}")
      else Nil
    }).mkString("\n")
  }

  /** The layout's own fingerprint line: count of data files directly
    * under the table directory (bucket part-files; `_`/`.`-prefixed
    * metadata excluded). Recorded at stamp time and re-checked at
    * re-register so a partially-deleted layout never silently reuses.
    */
  private def layoutLine(fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path): String = {
    val n = fs.listStatus(path).count { s =>
      val name = s.getPath.getName
      s.isFile && !name.startsWith("_") && !name.startsWith(".")
    }
    s"layoutFiles=$n"
  }

  private[graft] def stampSilver(spark: SparkSession, sfDir: String, table: String): Unit =
    stampSilverWith(spark, table, sourceStamp(spark, sfDir))

  /** Stamp a freshly-built layout with a PRE-BUILD source fingerprint
    * (see [[ensureBucketedSilver]]) plus the layout's own file count.
    */
  private[graft] def stampSilverWith(spark: SparkSession, table: String, src: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_graft_src_stamp"), true)
    try out.write(s"$src\n${layoutLine(fs, path)}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Measured pivot-side join-strategy ladder (r12, closing the sf10
    * spill diagnosis). The mart's one residual at-scale spill was the
    * SORT of the 60 M-row fact frame feeding a sort-merge join whose
    * OTHER side is the events pivot — 150 k rows / 12 MB shuffled at
    * sf10 (6.4 GB disk spill for a 12 MB build side; SpillProfile
    * attribution in SCALE.md). AQE cannot rescue this join by itself:
    * its runtime-size broadcast threshold applies only to plans whose
    * stats are marked runtime, and that flag does not survive
    * propagation through the final pivot Aggregate sitting between
    * the materialized shuffle stage and the join — measured A/B at
    * 48 MB and 200 MB adaptive thresholds left the SMJ in place while
    * the stage read 34.2 MB. So the library carries the decision where
    * the knowledge lives, the same occupancy-ladder discipline as
    * `Dedup.simHashBandBits`: the pivot frame is one fixed-width row
    * per active user (~[[PivotRowBytes]]), so a one-scan
    * `approx_count_distinct` over `events.user_id` (memoized per
    * (session, corpus); charged to index_build by Bench's prewarm)
    * bounds it exactly, and the mart broadcasts the pivot side iff
    * that bound fits [[PivotBroadcastMaxBytes]]. Past the bound — a
    * corpus with hundreds of millions of active users — the hint is
    * withheld and the join degrades to the shuffled form by design,
    * with the fact-side sort as the documented price.
    */
  val PivotRowBytes: Long = 64L
  val PivotBroadcastMaxBytes: Long = 256L << 20

  private val userEstCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Long]
  def pivotUserEstimate(spark: SparkSession, sfDir: String): Long = {
    userEstCache.keySet.foreach { k =>
      if (k._1.sparkContext.isStopped) userEstCache.remove(k)
    }
    userEstCache.getOrElseUpdate((spark, sfDir),
      Tables.events(spark, sfDir)
        .agg(approx_count_distinct("user_id")).head().getLong(0))
  }

  /** The dimension-side twin of the pivot ladder (r12, closing the
    * sf30 frontier the pivot fix exposed). Catalyst's STATIC broadcast
    * decision for part/customer runs on a pruned-size estimate
    * (file bytes × pruned-column ratio) against the 10 MB default —
    * which holds through sf10 but flips customer to a sort-merge join
    * at sf30 (est ~14 MB), re-introducing the exact pathology the
    * pivot ladder removed: a re-shuffle + sort of the WIDE fact frame
    * against a dimension that measures a few hundred MB as a hash
    * relation. The library again carries the decision where the
    * knowledge lives: these dims are one fixed-width row per key
    * ([[DimRowBytes]], calibrated against the measured sf10 broadcast
    * — customer's BroadcastExchange dataSz 146.2 MB / 1.5 M rows
    * ≈ 97 B/row), a memoized metadata-only count bounds the relation
    * exactly, and the dim broadcasts iff the bound fits
    * [[DimBroadcastMaxBytes]]. The budget is wider than the pivot's
    * (512 MB vs 256 MB) because a plain dimension's bound is a COUNT,
    * not an approx-distinct estimate — no sketch error margin to
    * absorb.
    *
    * Past the broadcast budget the ladder does NOT fall straight to a
    * sort-merge join: a dimension that outgrows per-executor broadcast
    * but still hashes per PARTITION gets a `SHUFFLE_HASH` hint
    * ([[DimShuffleHashMaxBytes]]). The asymmetry is the whole point —
    * SMJ's cost at this shape is the SORT of the enormous fact frame
    * (the sf10 spill diagnosis all over again), while shuffled-hash
    * pays the same exchange but builds its hash on the dimension side
    * only: at sf30, part is 6 M rows ≈ 576 MB — over broadcast, yet
    * ~18 MB per shuffle partition as a build side, trivially
    * memory-resident. The budget is per-PARTITION build feasibility
    * (bytes / shuffle partitions ≲ execution-memory share, with AQE
    * free to split further on a real cluster); only a dimension so
    * large that even its partitioned hash build would thrash — i.e.
    * genuinely fact-sized, where sort-spill robustness is the right
    * tool — falls through to SMJ. At 100 TB: customer in the billions
    * (hundreds of GB) → SMJ by design; customer in the tens of
    * millions (a few GB) → SHJ; anything under half a GB → broadcast.
    */
  val DimRowBytes: Long = 96L
  val DimBroadcastMaxBytes: Long = 512L << 20
  val DimShuffleHashMaxBytes: Long = 8L << 30

  private val dimCountCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Long]
  def dimCount(spark: SparkSession, sfDir: String, dim: String): Long = {
    dimCountCache.keySet.foreach { k =>
      if (k._1.sparkContext.isStopped) dimCountCache.remove(k)
    }
    dimCountCache.getOrElseUpdate((spark, sfDir, dim), dim match {
      case "part"     => Tables.part(spark, sfDir).count()
      case "customer" => Tables.customer(spark, sfDir).count()
      // Not a dimension, but the same counted-bound role (r20): orders'
      // row count bounds the BUILD side of the orderkey-grouped joins
      // (q_join_left_fill's aggregate, q_join_anti's distinct keys —
      // both emit at most one row per orderkey), so the SHJ-vs-SMJ
      // rung of the ladder can be decided from a metadata-cheap count
      // exactly like part/customer. count() over parquet is a
      // footer-statistics job — no data pages are read.
      case "orders"   => Tables.orders(spark, sfDir).count()
      case other => throw new IllegalArgumentException(s"unknown dim: $other")
    })
  }

  /** Force-materialize the mart's join-strategy statistics (pivot user
    * estimate + dim counts) so Bench's prewarm charges them to
    * index_build alongside the dedup indexes they behave like.
    */
  def martJoinStats(spark: SparkSession, sfDir: String): Unit = {
    pivotUserEstimate(spark, sfDir)
    dimCount(spark, sfDir, "part")
    dimCount(spark, sfDir, "customer")
  }

  /** The counted dim ladder as a reusable building block (r18): any
    * big-fact ⋈ dimension join in the registry walks broadcast →
    * shuffled-hash → sort-merge on the counted bound, not Catalyst's
    * static file-size estimate. Extracted from the mart when the
    * q_join_inner SpillProfile walk attributed its entire 7.1 GB sf30
    * spill to the SORT of the 180M-row fact side feeding a
    * SortMergeJoin whose dim side was ~100 MB — the exact pathology
    * the mart's ladder already removed; the A/B
    * (`bench_sf30_joinInnerAB_{smj,shj}_r18.json`) measured the
    * shuffled-hash form at 12.1 vs 14.6 s min with spill 7.1 GB → 0
    * at identical shuffle volume. `spark.graft.mart.dimBroadcast`
    * ("on"/"off"/"shj") pins a regime for A/Bs.
    */
  def dimLadderHint(spark: SparkSession, sfDir: String, dim: String,
      df: DataFrame): DataFrame =
    spark.conf.getOption("spark.graft.mart.dimBroadcast")
      .getOrElse("auto") match {
      case "on"  => broadcast(df)
      case "off" => df
      case "shj" => df.hint("SHUFFLE_HASH")
      case _ =>
        val bytes = dimCount(spark, sfDir, dim) * DimRowBytes
        if (bytes <= DimBroadcastMaxBytes) broadcast(df)
        else if (bytes <= DimShuffleHashMaxBytes) df.hint("SHUFFLE_HASH")
        else df
    }

  private def martFrom(spark: SparkSession, sfDir: String,
      li: DataFrame, ord: DataFrame): DataFrame = {
    // Dim ladder (see [[DimRowBytes]]): "auto" walks broadcast →
    // shuffled-hash → sort-merge on the counted bound; "on"/"off"/
    // "shj" pin a regime for A/Bs.
    def dimLadder(dim: String, df: DataFrame): DataFrame =
      dimLadderHint(spark, sfDir, dim, df)
    val prt = dimLadder("part", Tables.part(spark, sfDir)
      .select("p_partkey", "p_type"))
    val cst = dimLadder("customer", Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_nationkey"))
    val evpRaw = eventsPivot(spark, sfDir)
    // Session conf for the ladder, mirroring Spark's own tuning-conf
    // idiom: "auto" (default) applies the measured user-count bound
    // above; "on"/"off" pin the regime for controlled A/Bs (the r12
    // sf10 regime legs) or for clusters whose memory envelope differs
    // from the bound's assumptions.
    val evp = spark.conf.getOption("spark.graft.mart.pivotBroadcast")
      .getOrElse("auto") match {
      case "on"  => broadcast(evpRaw)
      case "off" => evpRaw
      case _ =>
        if (pivotUserEstimate(spark, sfDir) * PivotRowBytes <= PivotBroadcastMaxBytes)
          broadcast(evpRaw)
        else evpRaw
    }

    // A/B knob (r16, default ABSENT = byte-identical plan): widen the
    // two fact-carrying sort exchanges — the SMJ's orderkey exchange
    // and the item-grain custkey exchange — to a pinned width, the
    // resample counted-fan-out playbook applied to the plain mart's
    // 18 GB sf30 sort spill. Set spark.graft.mart.factParts for the
    // SpillProfile A/B; promoted to a counted auto only if the leg
    // shows the spill is the sorts' (and not the SHJ builds') to shave.
    val factParts = spark.conf.getOption("spark.graft.mart.factParts").map(_.toInt)
    val liW = factParts.fold(li)(n => li.repartition(n, li("l_orderkey")))
    val base = liW
      .join(ord, li("l_orderkey") === ord("o_orderkey"), "left")
      .join(prt, li("l_partkey") === prt("p_partkey"), "left")
    val based = factParts.fold(base)(n => base.repartition(n, ord("o_custkey")))
    based
      .join(cst, ord("o_custkey") === cst("c_custkey"), "left")
      .join(evp, ord("o_custkey") === evp("user_id"), "left")
      .na.fill(0.0, EventTypes)
      .select(
        li("l_orderkey").as("PEDIDO"),
        li("l_linenumber").as("ITEM"),
        li("l_partkey").as("ID_PRODUTO"),
        ord("o_custkey").as("ID_CLIENTE"),
        to_date(ord("o_orderdate")).as("DATA_VENDA"),
        round(li("l_extendedprice"), 4).as("VALOR_VENDA"),
        round(li("l_extendedprice") * li("l_discount"), 4).as("VALOR_DESCONTO"),
        upper(translate(prt("p_type"), " ", "_")).as("CATEGORIA_PRODUTO"),
        upper(cst("c_mktsegment")).as("SEGMENTO_CLIENTE"),
        cst("c_nationkey").as("ESTADO_CLIENTE"),
        round(col("click"), 4).as("VALOR_CLICK"),
        round(col("error"), 4).as("VALOR_ERROR"),
        round(col("purchase"), 4).as("VALOR_PURCHASE"),
        round(col("signup"), 4).as("VALOR_SIGNUP"),
        round(col("view"), 4).as("VALOR_VIEW"))
  }
  // NB: no trailing orderBy. A global sort of the output mart was half
  // the query's cost under the honest noop-write action (profiled at
  // sf0.1: ~4.9 s with, ~2.3 s without — one full extra exchange +
  // sort of 60 k×15 rows) and buys nothing: the reference's gold job
  // writes unsorted, the correctness driver sorts rows before hashing,
  // and at 100 TB nobody globally sorts a mart to write it.

  /** The inverse of the pivot: melt the wide per-user event matrix
    * back to long (user_id, event_type, total) form — Spark's native
    * `unpivot` (no UNION-ALL re-scan per column; one pass, codegen'd
    * Expand). Null cells (user never produced that event type) drop
    * out, so unpivot∘pivot round-trips to the plain groupBy aggregate
    * — which is exactly what the oracle states.
    */
  def eventsUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    eventsPivot(spark, sfDir)
      .unpivot(Array(col("user_id")), EventTypes.map(col(_)).toArray, "event_type", "total")
      .filter(col("total").isNotNull)
      .select(col("user_id"), col("event_type"), round(col("total"), 4).as("total"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vendas_mart" -> ((s, dir) => mart(s, dir)),
    // The same mart over the bucketed silver layout — identical output
    // by construction (BucketingSpec pins row parity and the
    // exchange-free fact join); registering it makes the layout claim
    // correctness-gated, not just spec-gated. The one-time bucketed
    // write is memoized per (session, corpus) and charged to
    // index_build by Bench's prewarm, the same contract as the Dedup
    // index frames.
    "q_vendas_mart_bucketed" -> ((s, dir) => {
      val (li, ord) = ensureBucketedSilver(s, dir)
      martBucketed(s, dir, li, ord)
    }),
    "q_unpivot_events" -> (eventsUnpivot _),
    "q_pivot_events" -> ((s, dir) =>
      eventsPivot(s, dir)
        .na.fill(0.0, EventTypes)
        .select(
          col("user_id") +:
            EventTypes.map(t => round(col(t), 4).as(s"sum_$t")): _*)
        ))

  private val pivotCase: String = EventTypes
    .map(t => s"sum(CASE WHEN event_type = '$t' THEN value END) AS $t")
    .mkString(", ")

  /** One oracle statement for BOTH mart registrations: the bucketed
    * layout is a physical re-organization, so its oracle is the plain
    * mart's SQL verbatim — identical output is the whole claim.
    */
  private val martOracle: String =
    s"""WITH evp AS (SELECT user_id, $pivotCase FROM events GROUP BY user_id)
         |SELECT l.l_orderkey AS "PEDIDO",
         |       l.l_linenumber AS "ITEM",
         |       l.l_partkey AS "ID_PRODUTO",
         |       o.o_custkey AS "ID_CLIENTE",
         |       CAST(o.o_orderdate AS DATE) AS "DATA_VENDA",
         |       round(l.l_extendedprice, 4) AS "VALOR_VENDA",
         |       round(l.l_extendedprice * l.l_discount, 4) AS "VALOR_DESCONTO",
         |       upper(replace(p.p_type, ' ', '_')) AS "CATEGORIA_PRODUTO",
         |       upper(c.c_mktsegment) AS "SEGMENTO_CLIENTE",
         |       c.c_nationkey AS "ESTADO_CLIENTE",
         |       round(coalesce(e.click, 0), 4) AS "VALOR_CLICK",
         |       round(coalesce(e.error, 0), 4) AS "VALOR_ERROR",
         |       round(coalesce(e.purchase, 0), 4) AS "VALOR_PURCHASE",
         |       round(coalesce(e.signup, 0), 4) AS "VALOR_SIGNUP",
         |       round(coalesce(e.view, 0), 4) AS "VALOR_VIEW"
         |FROM lineitem l
         |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         |LEFT JOIN part p ON l.l_partkey = p.p_partkey
         |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         |LEFT JOIN evp e ON o.o_custkey = e.user_id
         |ORDER BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_unpivot_events" ->
      """SELECT user_id, event_type, round(sum(value), 4) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "vendas_mart" -> martOracle,
    "q_vendas_mart_bucketed" -> martOracle,
    "q_pivot_events" ->
      s"""SELECT user_id,
         |${EventTypes.map(t => s"round(coalesce(sum(CASE WHEN event_type = '$t' THEN value END), 0), 4) AS sum_$t").mkString(",\n")}
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
