package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{IngestJob, OlistVendas}

/** CLI entry running the reference's entire pipeline end-to-end:
  * all eight bronze→silver ingest jobs, then the silver→gold vendas
  * mart — the spark-submit job an Airflow DAG would launch per
  * BASELINE.json's "spark_approach" (one `SparkSubmitOperator` replaces
  * each reference DAG's extract/transform/load/clean task chain).
  *
  *   sbt "runMain graft.tools.RunPipeline <bronzeRoot> <silverRoot> <goldRoot>"
  *
  * Roots may be local paths or s3a:// URIs (MinIO: set fs.s3a.endpoint
  * + path-style access in spark-defaults); the code path is identical.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: RunPipeline <bronzeRoot> <silverRoot> <goldRoot>")
    val Array(bronze, silver, gold) = args
    val spark = SparkSession.builder()
      .appName("graft-olist-pipeline")
      // spark-submit provides spark.master; default for direct runs.
      .config("spark.master", sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      IngestJob.runAll(spark, bronze, silver)
      OlistVendas.run(spark, silver, gold)
      println(s"PIPELINE OK bronze=$bronze silver=$silver gold=$gold")
    } finally spark.stop()
  }
}
