package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpressionDescription, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(text)`: canonical web-text cleanup as ONE native
  * codegen'd pass — NFC normalization (UAX #15), Unicode space
  * separators (Zs) and ASCII vertical/horizontal whitespace mapped to
  * plain spaces, C0/C1 control characters stripped, space runs
  * collapsed, ends trimmed.
  *
  * Why a native expression: normalization runs once per document over
  * the FULL text — byte-bandwidth-bound at 100 TB, exactly like
  * [[CharEntropyExpr]] — and the SQL spelling is a four-deep
  * regexp_replace chain that materializes three intermediate strings
  * per row. This pass allocates one builder, reads each code point
  * once, and stays inside whole-stage codegen.
  *
  * Deliberate scope: format characters (Cf — ZWJ, bidi marks) are
  * PRESERVED: stripping them corrupts emoji sequences and RTL text; a
  * pipeline that wants them gone should say so explicitly. Case is
  * untouched (`lower` composes). The transform is idempotent:
  * normalize(normalize(s)) == normalize(s) (spec-pinned property).
  *
  * Oracle equivalence (the `normalize_text` DuckDB mirror): NFC via
  * `nfc_normalize`, then the regexp_replace chain
  * `[\p{Zs}\t\n\x0B\f\r]` → ' ', strip `[\x00-\x1f\x7f-\x9f]`,
  * collapse ' +', trim — the same function by construction because a
  * control char between two produced spaces is stripped BEFORE the
  * collapse in both formulations.
  */
@ExpressionDescription(
  usage = "graft_normalize(s) - NFC + whitespace/control cleanup of s in one pass.")
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects STRING, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  // Same static-helper pattern as CharEntropy: eval and codegen share
  // one JIT-compiled method, and the expression still participates in
  // whole-stage codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeText {

  private def isSpaceLike(cp: Int): Boolean =
    cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r' ||
      Character.getType(cp) == Character.SPACE_SEPARATOR

  private def isControl(cp: Int): Boolean =
    (cp >= 0x00 && cp <= 0x1F) || (cp >= 0x7F && cp <= 0x9F)

  /** One pass over the NFC'd code points: space-likes become a pending
    * single space (emitted only before the next solid char — collapse
    * and right-trim for free), controls vanish, everything else copies.
    */
  def compute(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val out = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isSpaceLike(cp)) {
        if (out.length > 0) pendingSpace = true
      } else if (!isControl(cp)) {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(out.toString)
  }
}
