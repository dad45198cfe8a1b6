package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.TextFns._
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = Tables.documents(spark, sfDir)
    time("tokens")(docs.select(col("doc_id"), tokens(col("text")).as("tk")).count())
    time("shingles")(docs.select(col("doc_id"), shingles(tokens(col("text")),3).as("sh")).count())
    time("shingle_explode")(Dedup.shingleIndexOf(docs).count())
    val ex = Dedup.shingleIndexOf(docs).cache()
    time("shingle_cached")(ex.count())
    val a = ex.select(col("doc_id").as("a_id"), col("s"))
    val b = ex.select(col("doc_id").as("b_id"), col("s"))
    time("selfjoin_cached")(a.join(b, Seq("s")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id","b_id").agg(count(lit(1))).count())
    time("jaccard_full")(Dedup.ngramJaccard(spark, sfDir).count())
    spark.stop()
  }
}
