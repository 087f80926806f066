package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_entropy(text)`: Shannon entropy (bits per character) of a
  * string's character distribution, as a native Catalyst expression with
  * whole-stage codegen.
  *
  * Why a native expression: character entropy is the standard cheap
  * gibberish/boilerplate detector in web-corpus quality pipelines (a
  * run of one repeated character scores 0 bits; natural prose scores
  * ~4 bits) — it runs once per document over the full text, i.e. it is
  * byte-bandwidth-bound at 100 TB. The SQL spelling (explode one row per
  * character → count → entropy aggregate) multiplies the shuffled row
  * count by the document LENGTH — catastrophic at scale — while this
  * expression computes the whole statistic inside the scan's codegen
  * stage: no explode, no shuffle, one pass over the string per row.
  *
  * Determinism: terms are accumulated in SORTED code-point order (the
  * string is code-point-sorted, then run-length scanned), so the sum
  * order is a function of the VALUE, not of partitioning. Each term is
  * `-(k/n)·log2(k/n)` — the same per-term doubles a SQL oracle computes
  * from its (char, count) groups.
  */
@ExpressionDescription(
  usage = "graft_entropy(s) - Shannon entropy in bits of the character distribution of s.")
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_entropy expects STRING, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  // The loop lives in a static helper rather than inlined Janino source:
  // the run-length scan needs an int[] sort, and calling one static
  // method keeps eval and codegen on literally the same bytecode (no
  // dual-maintenance drift), while still participating in whole-stage
  // codegen (no interpreted-expression fallback for the surrounding plan).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropy {

  private val Ln2 = math.log(2.0)

  /** Entropy in bits over the string's Unicode code points. Empty string
    * (and a string of one repeated code point) scores 0.0.
    */
  def compute(s: UTF8String): Double = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(cps)
    val nd = n.toDouble
    var h = 0.0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && cps(j) == cps(i)) j += 1
      val p = (j - i).toDouble / nd
      h -= p * (math.log(p) / Ln2)
      i = j
    }
    h
  }
}
