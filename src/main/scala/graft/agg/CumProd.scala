package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact cumulative product — the equity-curve aggregate.
  *
  * The reference computes `(1 + returns).cumprod()` driver-side in pandas
  * (`/root/reference/notebooks/explore_datasets.ipynb` cell 16). Spark has
  * no product aggregate; the common `exp(sum(log(x)))` rewrite loses
  * exactness and breaks on zeros/negatives (SURVEY §7.3). This typed
  * `Aggregator` multiplies exactly, handles any sign, and is usable both as
  * a grouped aggregate and as a window function (over a growing
  * `rowsBetween(unboundedPreceding, currentRow)` frame Spark evaluates it
  * incrementally — one multiply per row, no re-scan).
  *
  * Scale note: the buffer is a single Double, so partial aggregation /
  * merge is trivially cheap and the window use stays O(n) per partition.
  */
object CumProdAgg extends Aggregator[java.lang.Double, Double, Double] {
  override def zero: Double = 1.0
  // NULL input is the multiplicative identity — matches how built-in SQL
  // aggregates skip NULLs (and DuckDB's product()).
  override def reduce(b: Double, a: java.lang.Double): Double =
    if (a == null) b else b * a.doubleValue()
  override def merge(b1: Double, b2: Double): Double = b1 * b2
  override def finish(r: Double): Double = r
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object CumProd {
  /** `product(c)` as a Column-producing function (aggregate or windowed). */
  private lazy val fn = udaf(CumProdAgg, Encoders.DOUBLE)
  def product(c: Column): Column = fn(c)
}
