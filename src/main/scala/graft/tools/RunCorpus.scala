package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Sinks

/** CLI entry running the corpus-preparation pipeline end-to-end over a
  * documents directory — the operational twin of [[RunPipeline]] for
  * the training-data surface:
  *
  *   sbt "runMain graft.tools.RunCorpus <docsDir> <outRoot>"
  *
  * `<docsDir>` must contain `documents.parquet` (and, for the ANN
  * stages, `embeddings.parquet`); `<outRoot>` receives one parquet
  * dataset per stage:
  *
  *   survivors/   exact+near-dup canonical corpus (Dedup.survivors)
  *   quality/     per-doc quality scores (TextAnalysis.qualityScore)
  *   packs/       per-shard sequence-pack manifest of the cleaned,
  *                quality-gated corpus (TextAnalysis.corpusPipeline)
  *   audit/       split/contamination stats
  *   funnel/      the one-row dedup funnel (docs → exact groups →
  *                near pairs → clusters → survivors, Dedup.funnelStats)
  *
  * Every stage is the same oracle-verified operator the library
  * exposes; this entry only sequences and persists them. Roots may be
  * local paths or object-store URIs — identical code path.
  */
object RunCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: RunCorpus <docsDir> <outRoot>")
    val Array(docsDir, outRoot) = args
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .appName("graft-corpus-pipeline")
      .config("spark.master", sys.props.getOrElse("spark.master", "local[*]")))
      .getOrCreate()
    try {
      Sinks.parquet(Dedup.survivors(spark, docsDir), s"$outRoot/survivors")
      Sinks.parquet(TextAnalysis.qualityScore(spark, docsDir), s"$outRoot/quality")
      Sinks.parquet(TextAnalysis.corpusPipeline(spark, docsDir), s"$outRoot/packs")
      val audit = TextAnalysis.corpusSplit(spark, docsDir)
        .selectExpr("sum(n_docs) AS n_docs_total")
        .crossJoin(TextAnalysis.contamination(spark, docsDir)
          .selectExpr("count(*) AS contaminated_test_docs"))
      Sinks.parquet(audit, s"$outRoot/audit")
      Sinks.parquet(Dedup.funnelStats(spark, docsDir), s"$outRoot/funnel")
      println(s"CORPUS OK docs=$docsDir out=$outRoot")
    } finally spark.stop()
  }
}
