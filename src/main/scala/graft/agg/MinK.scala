package graft.agg

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact bounded min-k: the k smallest values of a long column, sorted
  * ascending — the posting-list-sample / per-key-head primitive.
  *
  * The buffer never exceeds k elements, so partials are map-side
  * combined and a SKEWED key (a stopword term with a billion postings)
  * costs each partial at most an O(k) merge — where the obvious
  * alternatives melt at scale: an unbounded `collect_list` holds the hot
  * key's every value in one agg buffer, and a `row_number` window drags
  * the hot key's full row set through one task before truncating.
  * Min-k of a set is order-independent, so the result is deterministic
  * and exact under any partitioning.
  *
  * Lawfulness: reduce/merge keep the invariant "buffer = sorted k
  * smallest of everything folded in"; merge of two such buffers is the
  * sorted k-smallest of the union — associative and commutative.
  */
class MinKLongsAgg(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], a: java.lang.Long): Seq[Long] =
    if (a == null) b
    else if (b.length >= k && a.longValue() >= b.last) b // fast path: can't enter
    else ((b :+ a.longValue()).sorted: Seq[Long]).take(k)
  override def merge(l: Seq[Long], r: Seq[Long]): Seq[Long] =
    ((l ++ r).sorted: Seq[Long]).take(k)
  override def finish(s: Seq[Long]): Seq[Long] = s
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinK {
  /** `minKLongs(c, k)`: sorted k smallest longs as an array column. */
  def minKLongs(c: Column, k: Int): Column = {
    val fn = udaf(new MinKLongsAgg(k), ExpressionEncoder[java.lang.Long]())
    fn(c)
  }
}
