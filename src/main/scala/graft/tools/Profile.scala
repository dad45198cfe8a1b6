package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Ad-hoc per-query profiler:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.Profile q_sort_limit q_dedup_jaccard"
  *
  * Same noop-write action as Bench (a count() would let Catalyst prune
  * projections); unknown names are reported, not fatal.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"PROF $name t=${(System.nanoTime() - t0) / 1e9}%.2f sf=$sfDir")
        case None =>
          println(s"PROF $name UNKNOWN (not in SparkEntry.queries)")
      }
    }
    spark.stop()
  }
}
