package graft.agg

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summary: a bounded map of at most `m`
  * (item → lower-bound count) entries, mergeable across partitions — the
  * heavy-hitter candidate miner for unbounded-vocabulary streams.
  *
  * Why this and not groupBy-count at 100 TB: counting every distinct
  * n-gram shuffles the full (term, count) space — billions of distinct
  * keys, the classic straggler aggregate. The MG buffer is O(m) per
  * partial regardless of vocabulary, map-side combined like any other
  * aggregate, and its merged output is a GUARANTEED superset of every
  * item with true frequency > N/(m+1) (Misra & Gries 1982; merge bound
  * per Agarwal et al., "Mergeable Summaries", PODS 2012). A cheap exact
  * recount of the ≤ m candidates then turns the sketch into exact top-k
  * — see [[graft.ops.TextAnalysis.heavyHitters]].
  *
  * Guarantees (deterministic, any partitioning / merge order):
  *   - estimate(x) ≤ true(x)                          (undercount only)
  *   - true(x) − estimate(x) ≤ N/(m+1)                (N = stream size)
  *   - true(x) > N/(m+1) ⇒ x survives in the summary  (superset property)
  *
  * reduce: classic MG — increment if present; insert if room; else
  * decrement every counter by 1 and drop zeros (amortized O(1) counter
  * work: each decrement event retires ≥ m+1 units of total mass).
  * merge: sum counters pointwise; if over capacity, subtract the
  * (m+1)-largest count from all and keep the positive remainder — the
  * PODS'12 merge whose errors ADD to the same N/(m+1) total bound.
  */
class MisraGriesAgg(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m > 0, s"capacity must be positive, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else b.get(a) match {
      case Some(c)            => b.updated(a, c + 1L)
      case None if b.size < m => b.updated(a, 1L)
      case None =>
        // decrement-all; the incoming item's +1 cancels against it too
        b.collect { case (k, c) if c > 1L => k -> (c - 1L) }
    }

  override def merge(l: Map[String, Long], r: Map[String, Long]): Map[String, Long] = {
    val combined =
      if (l.size >= r.size) r.foldLeft(l) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      else l.foldLeft(r) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
    if (combined.size <= m) combined
    else {
      // (m+1)-th largest count; subtract it everywhere, keep positives
      val cut = combined.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(m)
      combined.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** `misraGries(c, m)`: bounded frequent-items summary of a string column
    * as a map<string,bigint> column (item → lower-bound count).
    */
  def misraGries(c: Column, m: Int): Column = {
    val fn = udaf(new MisraGriesAgg(m), ExpressionEncoder[String]())
    fn(c)
  }
}
