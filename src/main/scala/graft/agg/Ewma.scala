package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact exponential moving average — pandas `ewm(alpha)` (the default
  * `adjust=True` form): E_t = Σ (1−α)^(t−i)·v_i / Σ (1−α)^(t−i), the
  * exponentially-weighted mean of everything seen so far.
  *
  * The recursion looks inherently sequential, but both accumulators are
  * linear: num_t = (1−α)·num_{t−1} + v_t and den_t = (1−α)·den_{t−1} + 1.
  * Carrying the segment's total decay A = (1−α)^n alongside makes the
  * buffer (num, den, A) a LAWFUL three-Double `Aggregator` — merge is
  * (A_r·num_l + num_r, A_r·den_l + den_r, A_r·A_l), associative with no
  * order-dependent special cases, so it is correct under any partial
  * split (grouped partials included), windowable over a growing frame,
  * and chunk-mergeable. No `pow(1−α, −t)` overflow (the naive
  * closed-form trick): the carried decay only ever SHRINKS. E_1 = v_1
  * falls out automatically (num = v, den = 1); nulls are the identity
  * map, matching pandas' null skip (EMA carries forward).
  */
class EwmaAgg(alpha: Double) extends Aggregator[java.lang.Double, (Double, Double, Double), Double] {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha outside (0, 1]")
  private val keep = 1.0 - alpha
  override def zero: (Double, Double, Double) = (0.0, 0.0, 1.0)
  override def reduce(b: (Double, Double, Double),
                      a: java.lang.Double): (Double, Double, Double) =
    if (a == null) b
    else (keep * b._1 + a.doubleValue(), keep * b._2 + 1.0, keep * b._3)
  override def merge(l: (Double, Double, Double),
                     r: (Double, Double, Double)): (Double, Double, Double) =
    (r._3 * l._1 + r._1, r._3 * l._2 + r._2, r._3 * l._3)
  // all-null / empty segment → den = 0 → NaN, the windowed analogue of
  // "no value yet" (events fixtures are non-null; pandas yields NaN too)
  override def finish(s: (Double, Double, Double)): Double = s._1 / s._2
  override def bufferEncoder: Encoder[(Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** [[EwmaAgg]] with the raw (num, den, decay) buffer as the OUTPUT — the
  * chunked twin needs the components (to merge a cross-chunk carry into
  * each row's within-chunk state), not the finished ratio.
  */
class EwmaStateAgg(alpha: Double) extends Aggregator[java.lang.Double, (Double, Double, Double), (Double, Double, Double)] {
  private val inner = new EwmaAgg(alpha)
  override def zero: (Double, Double, Double) = inner.zero
  override def reduce(b: (Double, Double, Double),
                      a: java.lang.Double): (Double, Double, Double) =
    inner.reduce(b, a)
  override def merge(l: (Double, Double, Double),
                     r: (Double, Double, Double)): (Double, Double, Double) =
    inner.merge(l, r)
  override def finish(s: (Double, Double, Double)): (Double, Double, Double) = s
  override def bufferEncoder: Encoder[(Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Double, Double, Double)] =
    bufferEncoder
}

/** Order-faithful running merge of EMA states — the cross-chunk prefix
  * aggregate of the chunked twin (reduce IS [[EwmaAgg]]'s merge). Over an
  * empty exclusive frame it yields the identity map (0, 0, 1): "no prior
  * chunks".
  */
object EwmaMergeAgg extends Aggregator[(Double, Double, Double), (Double, Double, Double), (Double, Double, Double)] {
  override def zero: (Double, Double, Double) = (0.0, 0.0, 1.0)
  override def reduce(b: (Double, Double, Double),
                      a: (Double, Double, Double)): (Double, Double, Double) =
    (a._3 * b._1 + a._1, a._3 * b._2 + a._2, a._3 * b._3)
  override def merge(l: (Double, Double, Double),
                     r: (Double, Double, Double)): (Double, Double, Double) =
    reduce(l, r)
  override def finish(s: (Double, Double, Double)): (Double, Double, Double) = s
  override def bufferEncoder: Encoder[(Double, Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
      Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Double, Double, Double)] =
    bufferEncoder
}

object Ewma {
  /** `ewma(c)` as a Column (windowed over a growing frame for the
    * per-row series, or grouped — then the result is the series-final
    * EMA).
    */
  def ewma(c: Column, alpha: Double): Column =
    udaf(new EwmaAgg(alpha), Encoders.DOUBLE)(c)

  /** Running (num, den, decay) state as a struct column. */
  def state(c: Column, alpha: Double): Column =
    udaf(new EwmaStateAgg(alpha), Encoders.DOUBLE)(c)

  /** Running order-faithful merge of (num, den, decay) states — call
    * with the three component columns.
    */
  def mergeStates(num: Column, den: Column, decay: Column): Column =
    udaf(EwmaMergeAgg,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
        Encoders.scalaDouble))(num, den, decay)
}
