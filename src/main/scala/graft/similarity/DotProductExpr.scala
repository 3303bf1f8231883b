package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns.
  *
  * Value-identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`:
  * a strict left fold of `acc + a(i)*b(i)` in index order (bit-exact same
  * doubles), null if either array is null, any element is null, or lengths
  * differ (zip_with pads with null, which nulls the whole sum). But where
  * the HOF form is `CodegenFallback` — per-element lambda dispatch through
  * interpreted closures, per-row array allocation for the zipped products —
  * this is one fused JVM loop inside whole-stage codegen. The dot product
  * is the inner loop of every similarity operator (norms, cosine top-k, SRP
  * signatures, IVF, near-dup verify), evaluated per candidate PAIR, so at
  * billions of pairs this is the difference between a compute-bound scan
  * and a lambda-dispatch bottleneck.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product requires numeric arrays, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  private lazy val leftCode = DotProductExpr.typeCode(elemType(left).get)
  private lazy val rightCode = DotProductExpr.typeCode(elemType(right).get)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftCode, rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
      java.lang.Double $tmp =
        graft.similarity.DotProductExpr.compute($a, $b, $leftCode, $rightCode);
      if ($tmp == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $tmp.doubleValue();
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProductExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProductExpr {

  final val FloatCode = 0
  final val DoubleCode = 1
  final val IntCode = 2
  final val LongCode = 3

  def typeCode(t: DataType): Int = t match {
    case FloatType => FloatCode
    case DoubleType => DoubleCode
    case IntegerType => IntCode
    case LongType => LongCode
    case other => throw new IllegalArgumentException(other.catalogString)
  }

  private def get(arr: ArrayData, i: Int, code: Int): Double = code match {
    case FloatCode => arr.getFloat(i).toDouble
    case DoubleCode => arr.getDouble(i)
    case IntCode => arr.getInt(i).toDouble
    case LongCode => arr.getLong(i).toDouble
  }

  /** Shared by interpreted eval and generated code; null mirrors the HOF
    * null semantics (length mismatch or any null element).
    */
  def compute(a: ArrayData, b: ArrayData, ac: Int, bc: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ac) * get(b, i, bc)
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductExpr(
        GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
