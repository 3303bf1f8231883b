package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of the character (code-point) distribution of a string —
  * the classic gibberish/compression signal: natural prose sits ~2.5-3.2
  * nats, base64/hex blobs and keyboard mash run higher, repeated-character
  * padding collapses toward 0.
  *
  *   H = Σ over distinct code points c of  cnt(c) · ln(N / cnt(c)) / N
  *
  * (N = total code points; empty string → 0.0 by convention.)
  *
  * A native expression because the Column-only alternative is explode-one-
  * row-per-CHARACTER + groupBy — a corpus-of-characters shuffle for what is
  * a per-row narrow computation. This stays one codegen'd pass with a small
  * per-row histogram. Code POINTS, not UTF-16 units, so supplementary-plane
  * text (emoji, rare CJK) counts one character per glyph — the same unit
  * DuckDB's `string_split(text, '')` produces, which is what lets the
  * oracle replay it.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.CharEntropyExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropyExpr {

  /** Shared by interpreted eval and generated code (`compute`, not `eval` —
    * docs/ROUND1.md: an `eval`-named helper gets no static forwarder and
    * Janino falls back silently).
    */
  def compute(text: UTF8String): Double = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0.0
    val hist = new java.util.HashMap[Integer, Int]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      hist.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = hist.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()
      acc += cnt * math.log(n.toDouble / cnt)
    }
    acc / n
  }

  def charEntropy(c: Column): Column =
    GraftColumnBridge.column(CharEntropyExpr(GraftColumnBridge.expression(c)))
}
