import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ProfileApprox extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val sf = "/root/testdata/sf0.1"
  def time(name: String)(df: DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  val li = graft.Tables.lineitem(spark, sf)
  li.count() // warm
  time("full")(graft.operators.Analytics.approxStats(spark, sf))
  time("no_percentile")(li.groupBy("l_returnflag").agg(count(lit(1)).as("n"),
    approx_count_distinct(col("l_orderkey"), 0.02).as("a"), countDistinct(col("l_orderkey")).as("e")))
  time("only_percentile")(li.groupBy("l_returnflag").agg(
    percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m")))
  time("only_hll")(li.groupBy("l_returnflag").agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a")))
  time("pct_and_hll")(li.groupBy("l_returnflag").agg(
    approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
    percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("m")))
  spark.stop()
}
