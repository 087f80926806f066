package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact Kaufman-Adaptive-Moving-Average recursion as a lawful
  * `Aggregator`: KAMA_t = KAMA_{t−1} + sc_t·(p_t − KAMA_{t−1}) with a
  * PER-ROW smoothing constant — the varying-α recursion no fixed-decay
  * trick ([[EwmaAgg]]'s (num, den, decay) buffer) can express.
  *
  * The step x ↦ (1−sc)·x + sc·p is an AFFINE map, and affine maps
  * compose associatively: the buffer (firstP, firstSc, a, b, seeded)
  * represents "the segment's first price + the composite map
  * x ↦ a·x + b over the rows after it". The series seed is the first
  * price itself (KAMA_0 = p_0, its sc unused — but the segment-local
  * first sc is CARRIED so a merge can replay it as an ordinary step
  * when the segment turns out not to start the series). Merge is map
  * composition, which is ASSOCIATIVE but NOT COMMUTATIVE: any split of
  * the ordered series into contiguous segments merges back exactly —
  * windowable over a growing frame, chunk-mergeable over pre-sorted
  * chunks — but the rows must reach reduce/merge in SERIES ORDER. A
  * plain `groupBy(...).agg(...)` gives no such ordering (Spark feeds
  * partials in scan/shuffle order), so a grouped series-final KAMA
  * through this aggregator would be order-nondeterministic; use it
  * only over an ordered window frame or explicitly ordered chunks
  * (the two shipped usages).
  *
  * Long-series numerics: a = Π(1−sc) only ever SHRINKS (sc ∈ (0, 1));
  * gradual underflow to 0 is the genuine "initial value forgotten"
  * limit, not an error. Null price rows are the identity map (carry
  * forward, the [[EwmaAgg]] convention).
  */
class KamaAgg extends Aggregator[(java.lang.Double, java.lang.Double),
    (Double, Double, Double, Double, Boolean), Double] {

  override def zero: (Double, Double, Double, Double, Boolean) =
    (0.0, 0.0, 1.0, 0.0, false)

  override def reduce(s: (Double, Double, Double, Double, Boolean),
                      in: (java.lang.Double, java.lang.Double)):
      (Double, Double, Double, Double, Boolean) = {
    val (p, sc) = (in._1, in._2)
    if (p == null || sc == null) s
    else if (!s._5) (p.doubleValue(), sc.doubleValue(), 1.0, 0.0, true)
    else {
      val keep = 1.0 - sc.doubleValue()
      (s._1, s._2, keep * s._3, keep * s._4 + sc.doubleValue() * p.doubleValue(), true)
    }
  }

  override def merge(l: (Double, Double, Double, Double, Boolean),
                     r: (Double, Double, Double, Double, Boolean)):
      (Double, Double, Double, Double, Boolean) =
    if (!l._5) r
    else if (!r._5) l
    else {
      // r's local first row was held back as a potential seed; l comes
      // before it, so replay it as an ordinary step, then r's tail map.
      val keep = 1.0 - r._2
      val a1 = keep * l._3
      val b1 = keep * l._4 + r._2 * r._1
      (l._1, l._2, r._3 * a1, r._3 * b1 + r._4, true)
    }

  // empty segment → NaN (the windowed "no value yet", EwmaAgg precedent)
  override def finish(s: (Double, Double, Double, Double, Boolean)): Double =
    if (!s._5) Double.NaN else s._3 * s._1 + s._4

  override def bufferEncoder: Encoder[(Double, Double, Double, Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaBoolean)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Kama {
  /** `kama(price, sc)` as a Column — windowed over a growing per-series
    * frame for the per-row KAMA line, or grouped for the series-final
    * value.
    */
  def kama(p: Column, sc: Column): Column =
    udaf(new KamaAgg, Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE))(p, sc)
}
