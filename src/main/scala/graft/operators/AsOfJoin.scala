package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join: for every left row, attach the most recent
  * right row whose time is `<=` the left row's time, matched per key.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.t <= l.t` + windowed max) explodes into a
  * per-key cross product — quadratic per key, hopeless at 100 TB.
  *
  * This implementation uses the union + last_value sweep instead:
  * tag both sides, union them, and run a single window partitioned by
  * key and ordered by (time, side-tag):
  *
  *   - ONE shuffle on the key (the window partition), no join at all;
  *   - per-partition work is a sort + linear scan — the cost profile of
  *     a sort-merge join without the pair explosion;
  *   - right rows sort before left rows at equal timestamps, giving
  *     inclusive (`<=`) semantics;
  *   - the whole right payload travels as one struct, so right columns
  *     that are legitimately NULL survive (the null-vs-missing marker is
  *     the struct itself).
  *
  * Ties inside the right side (same key, same time) are broken by
  * `rightTieBreak` ascending with the LAST one winning, i.e. the highest
  * tie-break value — deterministic output.
  *
  * At cluster scale the window shuffle hash-partitions by key; a skewed
  * key can be pre-split by salting both sides with the same salt.
  */
object AsOfJoin {

  /** @param rightValues right-side payload columns to carry onto matches
    * @param rightTieBreak column ordering right-side ties at equal
    *                      (key, time); highest wins
    */
  def leftAsOf(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightValues: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightValues.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType
    val tieType = right.schema(rightTieBreak).dataType

    val taggedRight = right.select(
      Seq(col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(rightTieBreak).as("__tie"),
        payload.as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val taggedLeft = left.select(
      Seq(col(leftKey).as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__rv")) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValues.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
