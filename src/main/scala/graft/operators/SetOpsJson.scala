package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operators (SURVEY.md §2.5 — absent from the reference, part of
  * the engine's relational surface) and the JSON scalar family.
  *
  * Scale notes: INTERSECT/EXCEPT compile to aggregate + left-semi /
  * left-anti joins — one shuffle each, broadcastable when one side is
  * small. JSON work is per-row codegen'd string processing, no shuffle.
  */
object SetOpsJson {

  /** Nation keys present in BOTH the customer and supplier bases —
    * `INTERSECT` (distinct semantics).
    */
  def intersectKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
      .intersect(
        Tables.supplier(spark, sfDir).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** Nations with no supplier — `EXCEPT` (distinct semantics). */
  def exceptKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.nation(spark, sfDir).select(col("n_nationkey").as("nationkey"))
      .except(
        Tables.supplier(spark, sfDir).select(col("s_nationkey").cast("long").as("nationkey")))
      .orderBy("nationkey")

  /** JSON round-trip: serialize per-order fields with `to_json`, read
    * them back with `get_json_object` path extraction. Integer and
    * string fields only — float JSON formatting differs across
    * engines, a divergence the test pins by exclusion.
    */
  def jsonFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") <= 1000)
      .withColumn("payload",
        to_json(struct(
          col("o_orderkey").as("k"),
          col("o_orderstatus").as("s"),
          col("o_orderpriority").as("p"))))
      .select(
        col("o_orderkey"),
        col("payload"),
        get_json_object(col("payload"), "$.k").cast("long").as("k_back"),
        get_json_object(col("payload"), "$.s").as("s_back"),
        get_json_object(col("payload"), "$.p").as("p_back"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_intersect" -> (intersectKeys _),
    "q_except" -> (exceptKeys _),
    "q_json_funcs" -> (jsonFuncs _))

  val oracleSql: Map[String, String] = Map(
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
        |EXCEPT
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_json_funcs" ->
      """WITH j AS (
        |  SELECT o_orderkey,
        |         to_json(struct_pack(k := o_orderkey, s := o_orderstatus,
        |                             p := o_orderpriority)) AS payload
        |  FROM orders WHERE o_orderkey <= 1000)
        |SELECT o_orderkey, payload,
        |       CAST(json_extract_string(payload, '$.k') AS BIGINT) AS k_back,
        |       json_extract_string(payload, '$.s') AS s_back,
        |       json_extract_string(payload, '$.p') AS p_back
        |FROM j ORDER BY o_orderkey""".stripMargin)
}
