package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed partial top-k aggregator: keeps the k best (score, id) pairs
  * per group, ordered score DESC then id ASC.
  *
  * Why an Aggregator instead of the window-rank idiom
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`): the
  * window form shuffles EVERY row of the group to one partition and
  * sorts it; this aggregator runs inside partial aggregation, so each
  * map task forwards at most k rows per group key and the shuffle
  * carries O(groups × k) instead of O(rows) — the difference between
  * feasible and not when one stratum holds a billion rows. Buffers
  * merge associatively (concat + re-take), so Catalyst can combine
  * partials in any order or tree shape.
  *
  * Cost model honesty: this is ObjectHashAggregate territory (opaque
  * buffer, no whole-stage codegen), so per-row overhead is higher than
  * the codegen'd window path. It wins when rows-per-group ≫ k — the
  * shuffle/sort savings dominate — and loses on small groups; both
  * forms are declared (p3 window, p5 aggregator) with the same oracle
  * family so the trade is measured, not asserted.
  */
object TopKAgg {

  /** One contending row: score to maximize, id as the deterministic
    * tiebreak AND payload pointer.
    */
  final case class Scored(score: Long, id: Long)

  /** Buffer/output wrapper: `Encoders.product` needs a case class at
    * the top level (there is no public stand-alone Seq encoder), so
    * the sorted top-k rows ride in one struct field. Callers unwrap
    * with `.getField("rows")`.
    */
  final case class TopBuf(rows: Seq[Scored])

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  final class TopK(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: TopBuf = TopBuf(Vector.empty)

    /** Insert one row, keeping the buffer sorted and ≤ k. The common
      * fast path — row no better than the current k-th — is a single
      * comparison, no allocation.
      */
    override def reduce(buf: TopBuf, a: Scored): TopBuf =
      if (buf.rows.size >= k && ord.lteq(buf.rows.last, a)) buf
      else TopBuf((buf.rows :+ a).sorted(ord).take(k))

    override def merge(b1: TopBuf, b2: TopBuf): TopBuf =
      TopBuf((b1.rows ++ b2.rows).sorted(ord).take(k))

    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Column-API entry: `topK(3)(col("n_chars"), col("doc_id"))` yields
    * a struct whose `rows` field is the sorted top-k array.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopK(k), Encoders.product[Scored])
    (score, id) => f(score, id)
  }
}
