package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (`array<float>`, 64-dim) — absent from the reference (its data model
  * is flat scalar tables, SURVEY.md §1) but core to a training-data
  * pipeline (near-dup mining, retrieval curation).
  *
  * Two tiers:
  *
  *   - brute-force top-k: queries × corpus nested-loop with a windowed
  *     row_number ≤ k. Exact; cost O(|Q|·|C|·d). The right baseline
  *     when |Q| is small (Spark broadcasts the query side — no
  *     shuffle of the corpus at all).
  *
  *   - hyperplane-LSH top-k: 8 signed random hyperplanes bucket every
  *     vector into one of 256 cells; search only within the query's
  *     cell. Cost per query drops to O(|C|/256 · d) expected. The
  *     plane matrix is derived from md5 (`TextFns.hash60`) so the
  *     DuckDB oracle regenerates the identical planes — and on the
  *     Spark side the matrix is constant-folded into the plan as a
  *     literal array, evaluated once per row with zero joins. At
  *     cluster scale, bucketing is a plain narrow projection; the
  *     bucket-equi-join replaces the quadratic pair space the same way
  *     the MinHash bands do in Dedup.
  *
  * All dot products fold left-to-right in double precision on both
  * engines (TextFns.dot ≡ DuckDB list_reduce), so scores — and
  * therefore ranks, with vec_id tiebreak — are bit-identical.
  */
object Similarity {

  val NumPlanes = 8
  val Dim = 64
  val TopK = 10
  val LshTopK = 3
  /** vec_id < NumQueries are the query set. */
  val NumQueries = 10

  /** Deterministic pseudo-random hyperplane component in [-1, 1]:
    * ((hash60("plane<i>_<j>") mod 2001) - 1000) / 1000 — the same
    * value the oracle derives in SQL from the same md5 string.
    */
  def planeValue(i: Int, j: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"plane${i}_$j".getBytes(StandardCharsets.UTF_8))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
  }

  /** The 8×64 plane matrix as a plan literal (built once on the
    * driver, shipped in the plan — the Spark analogue of a broadcast
    * small side).
    */
  private def planesLit: Column =
    array((0 until NumPlanes).map(i =>
      array((0 until Dim).map(j => lit(planeValue(i, j))): _*)): _*)

  /** 8-bit LSH bucket: bit i set iff plane_i · v > 0. */
  def bucketCol(v: Column): Column =
    (0 until NumPlanes)
      .map(i => when(dot(element_at(planesLit, i + 1), v) > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** Banded hyperplane buckets: `nBands` independent sign-buckets of
    * `planesPerBand` planes each (global plane index `band *
    * planesPerBand + p`, same md5-derived matrix as [[bucketCol]] —
    * band 0 with 8 planes IS `bucketCol`). Two vectors are LSH
    * candidates iff they collide in ≥ 1 band; with r planes per band
    * and b bands the collision probability is 1-(1-(1-θ/π)^r)^b — the
    * near-dup amplification MinHash bands give Jaccard, applied to
    * cosine. Used by [[graft.operators.Dedup.embeddingPairs]] to turn
    * the all-pairs cosine join into a bucket equi-join.
    */
  def bandedBuckets(v: Column, nBands: Int, planesPerBand: Int): Column = {
    // One native kernel call per row instead of bands × planes
    // interpreted `when(dot(lit_plane, v) > 0, …)` roots: the wide
    // declarative form disabled whole-stage codegen for the banding
    // projection and went super-linear at the adaptive rungs (r8 sf1:
    // 12.65× time for 10× data at the 8→12-plane step). The kernel
    // preserves the exact fold order and strict `> 0` sign test, so
    // buckets stay bit-identical (GraftExpressionsSpec pins parity
    // against this declarative form).
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(graft.expressions.HyperplaneBands(
      ColumnShim.expression(v),
      (0 until nBands * planesPerBand).map(i =>
        (0 until Dim).map(j => planeValue(i, j))),
      planesPerBand))
  }

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Exact cosine top-k for each query vector (vec_id < 10). The query
    * side is tiny — Spark broadcast-joins it, so the corpus streams
    * through map-side; the only shuffle is the per-query window, keyed
    * by 10 values.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vectors(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cosine"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** LSH-bucketed top-k: both sides bucketed by the plane signs, join
    * restricted to equal buckets. Approximate (recall < 1), but the
    * candidate set per query is |C|/256 expected instead of |C|.
    */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vectors(spark, sfDir).withColumn("bucket", bucketCol(col("v")))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("v").as("nv"),
        col("nrm").as("nn"), col("bucket").as("nb"))
      .join(broadcast(q), col("nb") === col("qb") && col("n_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= LshTopK)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cosine"), 4).as("cosine"), col("qb").cast("long").as("bucket"))
      .orderBy("q_id", "rank")
  }

  /** Exact cosine top-k via the bounded [[graft.functions.TopK]]
    * aggregator instead of a window sort: candidates partial-aggregate
    * map-side to ≤ k per partition before the shuffle (see TopK
    * scaladoc for the 100 TB argument). Same results, same order, same
    * oracle as [[bruteForceTopK]].
    */
  def topKAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val e = vectors(spark, sfDir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    e.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
      .join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"),
        (dot(col("qv"), col("nv")) / (col("qn") * col("nn"))).as("cosine"),
        col("n_id"))
      .groupBy("q_id")
      .agg(graft.functions.TopK.column(TopK, col("cosine"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("n_id"),
        round(col("s.score"), 4).as("cosine"))
      .orderBy("q_id", "rank")
  }

  /** IVF parameters: 16 coarse centroids, taken deterministically from
    * the corpus (vec_ids [NumQueries, NumQueries+NList) — a
    * training-free quantizer both engines can reproduce; production
    * would k-means these).
    */
  val NList = 16
  val IvfTopK = 3

  /** IVF (inverted-file) top-k — the other classic ANN scale path
    * next to hyperplane LSH:
    *
    *   1. assignment: every vector joins the BROADCAST 16-centroid
    *      table and keeps its best-cosine centroid (one narrow
    *      map-side pass, O(|C|·nlist·d), no shuffle of the corpus);
    *   2. search: nprobe=1 — each query scans only its own cell,
    *      an equi-join on cell id (expected |C|/nlist candidates).
    *
    * At 100 TB the assignment is a one-off index build persisted as a
    * `cell`-partitioned table; queries then touch 1/nlist of the data.
    */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vectors(spark, sfDir)
    val cent = v.filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NList)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("c_cos").desc, col("cent_id"))
    val assigned = v.crossJoin(broadcast(cent))
      .withColumn("c_cos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    assigned
      .select(col("vec_id").as("n_id"), col("v").as("nv"),
        col("nrm").as("nn"), col("cell"))
      .join(broadcast(q), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= IvfTopK)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cosine"), 4).as("cosine"), col("cell"))
      .orderBy("q_id", "rank")
  }

  /** nprobe for the multi-probe IVF variant. */
  val NProbe = 2

  /** IVF top-k with nprobe=2 — the recall/cost knob every IVF index
    * exposes: the corpus assignment is unchanged (rn=1 cell per
    * vector), but each query probes its TWO closest cells, doubling
    * the candidate set (expected 2·|C|/nlist) and recovering
    * neighbors that fell just across a cell boundary. Same plan shape
    * as nprobe=1 — the probe table is still broadcast, the corpus
    * still equi-joins on `cell` — so the knob changes candidate
    * volume, never the join strategy.
    */
  def ivfProbeTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val v = vectors(spark, sfDir)
    val cent = v.filter(col("vec_id") >= NumQueries && col("vec_id") < NumQueries + NList)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("c_cos").desc, col("cent_id"))
    val scoredCells = v.crossJoin(broadcast(cent))
      .withColumn("c_cos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(wAssign))
    val assigned = scoredCells.filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("cell"))
    val probes = scoredCells.filter(col("vec_id") < NumQueries && col("rn") <= NProbe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("cell"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("n_id"))
    assigned
      .select(col("vec_id").as("n_id"), col("v").as("nv"),
        col("nrm").as("nn"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= IvfTopK)
      .select(col("q_id"), col("rank"), col("n_id"),
        round(col("cosine"), 4).as("cosine"), col("cell"))
      .orderBy("q_id", "rank")
  }

  /** Symmetric int8 quantization of the embedding column — the ANN
    * index memory-reduction step (4× smaller than float32, 8× smaller
    * than the double working type; at 100 TB of vectors the index
    * either quantizes or doesn't fit). Per-vector max-abs scaling;
    * q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]. Emits audit stats
    * (quantized sum/min/max and reconstruction MSE) rather than the
    * array itself so the oracle compare stays scalar.
    */
  def quantize(spark: SparkSession, sfDir: String): DataFrame = {
    // One-pass native kernel: the HOF formulation re-evaluated the
    // interpreted quantize chain once per output column (5× per row);
    // QuantizeStats computes all five stats in a single pass directly
    // over the float array (see its scaladoc for the exactness
    // contract).
    import org.apache.spark.sql.graft.ColumnShim
    val stats = ColumnShim.column(graft.expressions.QuantizeStats(
      ColumnShim.expression(col("embedding")), Dim))
    Tables.embeddings(spark, sfDir)
      .withColumn("s", stats)
      .select(
        col("vec_id"),
        round(col("s.scale"), 8).as("scale"),
        col("s.q_sum").as("q_sum"),
        col("s.q_min").cast("int").as("q_min"),
        col("s.q_max").cast("int").as("q_max"),
        round(col("s.mse"), 6).as("mse"))
  }

  /** ANN recall audit — the approximation-quality "stats page" next
    * to [[bucketStats]]: per query vector, how many of the exact
    * top-[[LshTopK]] neighbors each approximate method (hyperplane
    * LSH, IVF nprobe=1, IVF nprobe=2) actually returned, plus the
    * per-method mean. The audit every production ANN deployment runs
    * on a sampled query set to tune planes/nlist/nprobe — here it is
    * a first-class query: two small joins per method over the top-k
    * outputs, nothing beyond the already-planned pipelines.
    *
    * Reading the numbers on THIS data: the synthetic vectors are
    * near-orthogonal (cosine ≈ 0 everywhere), so no locality-based
    * method can beat its candidate-fraction baseline — recall ≈
    * |candidates|/|corpus| (IVF ≈ 1/nlist, doubled by nprobe=2; LSH ≈
    * 1/2^planes ≈ 0). That is the audit working, not failing: on a
    * real embedding corpus with actual neighbors the same query
    * reports the meaningful recall that drives plane/nlist/nprobe
    * tuning.
    */
  def recallAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val truth = bruteForceTopK(spark, sfDir)
      .filter(col("rank") <= LshTopK)
      .select(col("q_id"), col("n_id"))
    // mean recall = total hits / (k × queries) — one integer count,
    // ONE division, so the float result is bit-identical across
    // engines (a mean-of-per-query-recalls would sum inexact k/3
    // doubles in engine-dependent order). Equivalent because every
    // query has exactly k truth rows.
    def hitRate(approx: DataFrame, method: String): DataFrame =
      truth.join(approx.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
        .agg(round(count(lit(1)).cast("double") / (LshTopK * NumQueries), 4)
          .as("mean_recall"))
        .select(lit(method).as("method"), col("mean_recall"))
    hitRate(lshTopK(spark, sfDir), "lsh")
      .unionByName(hitRate(ivfTopK(spark, sfDir), "ivf_nprobe1"))
      .unionByName(hitRate(ivfProbeTopK(spark, sfDir), "ivf_nprobe2"))
      .orderBy("method")
  }

  /** Bucket occupancy histogram — the ANN index "stats page"; also a
    * cheap skew check (a hot bucket ⇒ add planes or re-salt).
    */
  def bucketStats(spark: SparkSession, sfDir: String): DataFrame =
    vectors(spark, sfDir)
      .withColumn("bucket", bucketCol(col("v")).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (bruteForceTopK _),
    "q_sim_topk_agg" -> (topKAgg _),
    "q_sim_lsh_topk" -> (lshTopK _),
    "q_sim_ivf_topk" -> (ivfTopK _),
    "q_sim_ivf_probe2" -> (ivfProbeTopK _),
    "q_sim_quantize" -> (quantize _),
    "q_sim_recall" -> (recallAudit _),
    "q_sim_buckets" -> (bucketStats _))

  // ---- DuckDB oracles -------------------------------------------------

  /** Plane CTE regenerating the identical matrix from md5 in SQL. */
  private val planesCte =
    s"""planes AS (
       |  SELECT i,
       |         list_transform(range(0, $Dim), j ->
       |           ((CAST('0x' || substr(md5('plane' || i || '_' || j), 1, 15) AS BIGINT)
       |             % 2001) - 1000) / 1000.0) AS p
       |  FROM range(0, $NumPlanes) t(i)),
       |vecs AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE),
       |              (x, y) -> x + y)) AS nrm
       |  FROM embeddings),
       |bucketed AS (
       |  SELECT vec_id, v, nrm,
       |         sum(CASE WHEN list_reduce(list_transform(range(1, ${Dim + 1}), k -> p[k] * v[k]),
       |                       (x, y) -> x + y) > 0
       |                  THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
       |  FROM vecs, planes GROUP BY vec_id, v, nrm)""".stripMargin

  private val dotAB =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), k -> q.v[k] * n.v[k]), (x, y) -> x + y)"

  private val bruteTopKSql =
    s"""WITH vecs AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE),
       |              (x, y) -> x + y)) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |         $dotAB / (q.nrm * n.nrm) AS cosine
       |  FROM vecs q JOIN vecs n ON q.vec_id < $NumQueries AND n.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT q_id, n_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, n_id, round(cosine, 4) AS cosine
       |FROM ranked WHERE rank <= $TopK ORDER BY 1, 2""".stripMargin

  private lazy val baseOracles: Map[String, String] = Map(
    "q_sim_quantize" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT vec_id, v,
         |         greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS scale
         |  FROM e),
         |q AS (
         |  SELECT vec_id, v, scale,
         |         list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
         |  FROM s)
         |SELECT vec_id,
         |       round(scale, 8) AS scale,
         |       list_reduce(qv, (a, b) -> a + b) AS q_sum,
         |       CAST(list_min(qv) AS INT) AS q_min,
         |       CAST(list_max(qv) AS INT) AS q_max,
         |       round(list_reduce(list_transform(range(1, ${Dim + 1}),
         |               i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)),
         |             (a, b) -> a + b) / ${Dim}.0, 6) AS mse
         |FROM q ORDER BY vec_id""".stripMargin,
    "q_sim_ivf_topk" ->
      s"""WITH vecs AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE),
         |              (x, y) -> x + y)) AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM vecs
         |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NList}),
         |assign0 AS (
         |  SELECT vecs.vec_id, vecs.v, vecs.nrm, cent.cent_id,
         |         list_reduce(list_transform(range(1, ${Dim + 1}), k -> vecs.v[k] * cent.cv[k]),
         |                     (x, y) -> x + y) / (vecs.nrm * cent.cn) AS c_cos
         |  FROM vecs CROSS JOIN cent),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_cos DESC, cent_id) AS rn
         |    FROM assign0) WHERE rn = 1),
         |scored AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, q.cell AS cell,
         |         $dotAB / (q.nrm * n.nrm) AS cosine
         |  FROM assigned q JOIN assigned n
         |    ON q.vec_id < $NumQueries AND n.cell = q.cell AND n.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, n_id, cell, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, round(cosine, 4) AS cosine, cell
         |FROM ranked WHERE rank <= $IvfTopK ORDER BY 1, 2""".stripMargin,
    "q_sim_ivf_probe2" ->
      s"""WITH vecs AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_reduce(list_transform(range(1, ${Dim + 1}), k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE),
         |              (x, y) -> x + y)) AS nrm
         |  FROM embeddings),
         |cent AS (
         |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM vecs
         |  WHERE vec_id >= $NumQueries AND vec_id < ${NumQueries + NList}),
         |cells AS (
         |  SELECT vecs.vec_id, vecs.v, vecs.nrm, cent.cent_id,
         |         row_number() OVER (PARTITION BY vecs.vec_id ORDER BY
         |           list_reduce(list_transform(range(1, ${Dim + 1}), k -> vecs.v[k] * cent.cv[k]),
         |                       (x, y) -> x + y) / (vecs.nrm * cent.cn) DESC, cent.cent_id) AS rn
         |  FROM vecs CROSS JOIN cent),
         |assigned AS (
         |  SELECT vec_id, v, nrm, cent_id AS cell FROM cells WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id, v, nrm, cent_id AS cell FROM cells
         |  WHERE rn <= $NProbe AND vec_id < $NumQueries),
         |scored AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, n.cell AS cell,
         |         $dotAB / (q.nrm * n.nrm) AS cosine
         |  FROM probes q JOIN assigned n
         |    ON n.cell = q.cell AND n.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, n_id, cell, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, round(cosine, 4) AS cosine, cell
         |FROM ranked WHERE rank <= $IvfTopK ORDER BY 1, 2""".stripMargin,
    "q_sim_topk" -> bruteTopKSql,
    // The aggregator variant computes the identical result by
    // construction — same oracle.
    "q_sim_topk_agg" -> bruteTopKSql,
    "q_sim_lsh_topk" ->
      s"""WITH $planesCte,
         |scored AS (
         |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, q.bucket AS bucket,
         |         $dotAB / (q.nrm * n.nrm) AS cosine
         |  FROM bucketed q JOIN bucketed n
         |    ON q.vec_id < $NumQueries AND n.bucket = q.bucket AND n.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, n_id, bucket, cosine,
         |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
         |  FROM scored)
         |SELECT q_id, rank, n_id, round(cosine, 4) AS cosine, bucket
         |FROM ranked WHERE rank <= $LshTopK ORDER BY 1, 2""".stripMargin,
    "q_sim_buckets" ->
      s"""WITH $planesCte
         |SELECT bucket, count(*) AS n_vecs
         |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin)

  /** The recall audit composes the three approximate-method oracles as
    * subqueries against the brute-force truth — same exact-count /
    * one-division formulation as the Spark side.
    */
  val oracleSql: Map[String, String] = baseOracles + ("q_sim_recall" -> {
    def sub(sql: String) = sql.replace("\n", "\n  ")
    def leg(name: String, sql: String) =
      s"""SELECT '$name' AS method,
         |       round(count(*) * 1.0 / ${LshTopK * NumQueries}, 4) AS mean_recall
         |FROM truth t JOIN (
         |  ${sub(sql)}) m ON t.q_id = m.q_id AND t.n_id = m.n_id""".stripMargin
    s"""WITH truth AS (SELECT q_id, n_id FROM (
       |  ${sub(bruteTopKSql)}) WHERE rank <= $LshTopK)
       |SELECT * FROM (
       |${leg("lsh", baseOracles("q_sim_lsh_topk"))}
       |UNION ALL
       |${leg("ivf_nprobe1", baseOracles("q_sim_ivf_topk"))}
       |UNION ALL
       |${leg("ivf_nprobe2", baseOracles("q_sim_ivf_probe2"))})
       |ORDER BY method""".stripMargin
  })
}
