package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator — the scale-correct alternative to
  * `row_number().over(Window.partitionBy(q).orderBy(score.desc)) <= k`
  * for top-k-per-group:
  *
  *   - the window formulation SORTS every group's full candidate list
  *     (O(n log n) per group) after shuffling ALL candidates of a
  *     group to one task;
  *   - this aggregator keeps a ≤ k-element buffer per group and —
  *     because it's an `Aggregator` run through `udaf` — Spark applies
  *     partial aggregation: each map task reduces its slice to ≤ k
  *     candidates BEFORE the shuffle, so shuffle volume is
  *     O(partitions × k), not O(candidates).
  *
  * At 100 TB with millions of scored candidates per query vector, that
  * map-side combine is the difference between shuffling kilobytes and
  * re-shuffling the scored corpus.
  *
  * Ordering is (score desc, id asc), ties deterministic — identical
  * survivors and order to the window/oracle formulation.
  */
object TopK {

  final case class ScoredId(score: Double, id: Long)

  /** true iff a ranks strictly after b under (score desc, id asc). */
  private def worse(a: ScoredId, b: ScoredId): Boolean =
    a.score < b.score || (a.score == b.score && a.id > b.id)

  final class TopKAgg(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

    override def zero: Seq[ScoredId] = Vector.empty

    override def reduce(b: Seq[ScoredId], v: ScoredId): Seq[ScoredId] =
      if (b.size < k) b :+ v
      else {
        // Replace the current worst iff v beats it. O(k) per row with
        // tiny constants; k is small by construction.
        var wi = 0
        var i = 1
        while (i < b.size) { if (worse(b(i), b(wi))) wi = i; i += 1 }
        if (worse(v, b(wi))) b else b.updated(wi, v)
      }

    override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      b.foldLeft(a)(reduce)

    /** Best-first: (score desc, id asc). */
    override def finish(b: Seq[ScoredId]): Seq[ScoredId] =
      b.sortBy(s => (-s.score, s.id))

    override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  }

  /** DataFrame form: `groupBy(q).agg(TopK.column(k, score, id))` →
    * `array<struct<score:double, id:bigint>>`, best-first.
    */
  def column(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())(score, id)
}
