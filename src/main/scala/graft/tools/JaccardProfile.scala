package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only stage-by-stage volume decomposition of the exact-Jaccard
  * prefix/verify pipeline — the instrument behind the round-15
  * adjudication of the sf10→sf30 super-linear flag (SCALE.md r14:
  * 40.3 s → 415.1 s, 10.3× for 3× data, spill 4.4 → 90.2 GB).
  *
  * The corpus generator builds disjoint-vocabulary shards, so every
  * LOGICAL volume below (postings, kept/prefix rows, candidate
  * multiset, distinct candidates, participants, output pairs) must
  * scale EXACTLY linearly in the shard count. If a measured count
  * deviates, the super-linearity is structural (prefix selectivity
  * degrading); if all counts are linear, the defect is in EXECUTION
  * (per-task sort/hash state, spill regime) and the fix is plan
  * shape, not algorithm. This prints both the counts and their
  * per-1k-docs normalizations so two sfDirs can be compared directly:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 tools/run_bench.sh \
  *     graft.tools.JaccardProfile
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    def stamp(name: String, v: Long): Unit =
      println(f"$name%-22s $v%14d   t=${(System.nanoTime() - t0) / 1e9}%.1f s")

    val nDocs = Dedup.documentCount(spark, sfDir)
    stamp("docs", nDocs)
    val ex = Dedup.shingleIndex(spark, sfDir)
    stamp("postings", ex.count())
    val ranked = Dedup.jaccardPrefixIndex(spark, sfDir)
    stamp("kept_postings", ranked.count())
    val pref = ranked
      .filter(col("rn") <= col("k") - expr("(3 * k + 4) DIV 5") + 1)
      .select(col("doc_id"), col("g60"), col("rn"), col("k"))
    stamp("prefix_rows", pref.count())
    // Candidate MULTISET (join output before distinct) — the volume the
    // distinct exchange and its sort actually carry. Counted twice:
    // with the shipped length filter only, and with the PPJoin
    // positional filter stacked on top, to price what the positional
    // filter would remove before committing it to the operator.
    val joined = pref.as("x").join(pref.as("y"),
      col("x.g60") === col("y.g60") && col("x.doc_id") < col("y.doc_id") &&
        greatest(col("x.k"), col("y.k")) * 3 <= least(col("x.k"), col("y.k")) * 5)
    stamp("cand_multiset", joined.count())
    val positional = joined.filter(
      (least(col("x.k") - col("x.rn"), col("y.k") - col("y.rn")) + 1) * 8 >=
        (col("x.k") + col("y.k")) * 3)
    stamp("cand_multiset_pos", positional.count())
    val cand = joined.select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    stamp("cand_distinct", cand.count())
    stamp("cand_distinct_pos", positional
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct().count())
    // The r16-REJECTED accumulated ubound (see the rejection note in
    // Dedup.jaccardCandidatesOf), kept here as a measurement: its gap
    // below cand_distinct_pos is all the pruning positional
    // information has left beyond the shipped per-row test (measured
    // 3.4% at sf10 — not worth the untruncated-multiset agg cost).
    stamp("cand_grouped_rej", joined
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.rn").as("rna"), col("y.rn").as("rnb"),
        col("x.k").as("ka"), col("y.k").as("kb"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("pov"),
        max(col("rna")).as("rna_last"), max(col("rnb")).as("rnb_last"),
        max(col("ka")).as("ka"), max(col("kb")).as("kb"))
      .filter((col("pov") +
          least(col("ka") - col("rna_last"), col("kb") - col("rnb_last"))) * 8 >=
        (col("ka") + col("kb")) * 3)
      .count())
    val parts = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    stamp("participants", parts.count())
    stamp("participant_rows", ranked.join(parts, Seq("doc_id"), "left_semi").count())
    stamp("out_pairs", graft.SparkEntry.queries("q_dedup_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
