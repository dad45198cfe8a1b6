package graft

import org.apache.spark.sql.functions._

/** AQE skew-join defense: at 100 TB a single hot join key turns one
  * shuffle partition into the whole job's critical path. With
  * adaptive skew-join splitting, the runtime detects the oversized
  * partition at the shuffle boundary and splits it into parallel
  * sub-partitions (the join's other side is replicated for those
  * splits). This spec pins that the engine's sessions actually get
  * that behavior — a skewed sort-merge join replans with `skew=true`
  * on the join node — so the salting template (q_salted_agg) is only
  * needed for AGGREGATIONS, where AQE has no equivalent rescue.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true in the plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      // The session pins a runtime (AQE) broadcast threshold too
      // (GraftSession, the mart spill fix) — without disabling it the
      // tiny right side broadcasts at replan time and the skew path
      // never runs.
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // Keep AQE from first coalescing the skew away at this tiny scale.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Left: one hot key (0) carrying ~200k rows with a fat payload,
      // 100 cold keys with 10 rows each. Right: uniform.
      val hot = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("x" * 64), col("id").cast("string")).as("pay"))
      val cold = spark.range(1000)
        .select((col("id") % 100 + 1).as("k"), col("id").cast("string").as("pay"))
      val left = hot.unionByName(cold)
      val right = spark.range(101).select(col("id").as("k"), (col("id") * 2).as("v"))

      val joined = left.join(right, Seq("k"))
      // collect() drives THIS DataFrame's QueryExecution (count() would
      // plan a separate aggregate QE and leave this one unexecuted, so
      // the adaptive plan would never finalize).
      assert(joined.collect().length == 200000 + 1000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        "expected AQE to mark the skewed join for splitting:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
