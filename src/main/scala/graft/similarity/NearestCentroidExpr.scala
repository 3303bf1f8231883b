package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as a native expression: the k x dim centroid
  * matrix rides inside the expression (serialized with the plan, shipped to
  * executors once — a broadcast literal), and each row's argmin over the k
  * squared distances is one fused loop.
  *
  * This is the Lloyd's-iteration shape that scales: the alternative
  * (crossJoin vectors x centroids + window argmin) materializes and
  * SHUFFLES n*k rows per iteration, which at a billion vectors and k=4096
  * is 4 trillion rows of intermediate state; here assignment is a narrow
  * map-only pass with no shuffle at all (MLlib's KMeans broadcasts centers
  * the same way).
  *
  * Distance fold and tie-break mirror the DataFrame formulation it
  * replaced: sum of (a_i - c_i)^2 in index order; strict less-than keeps
  * the lowest centroid id on exact ties.
  *
  * Returns struct(centroid_id int, dist double); null for null input.
  */
case class NearestCentroidExpr(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)
  ))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires array<float|double> and non-empty centroids, " +
          s"got ${child.dataType.catalogString} with ${centroids.size} centroids")
  }

  private lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // the matrix is registered as a codegen reference object so generated
  // code closes over the same array the interpreted path uses
  override def nullSafeEval(input: Any): Any =
    NearestCentroidExpr.compute(
      input.asInstanceOf[ArrayData], matrix, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroidMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.similarity.NearestCentroidExpr.compute($c, $matRef, $childIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroidExpr {

  /** Shared by interpreted eval and generated code.
    *
    * Fails loudly on malformed input instead of guessing: a vector whose
    * length differs from the centroids', or one carrying NULL elements,
    * would silently produce a wrong assignment if truncated/skipped (and
    * reading a null slot through ArrayData returns garbage, not null).
    */
  def compute(vec: ArrayData, matrix: Array[Array[Double]], isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    // validation hoisted OUT of the k x dim distance loops: one O(n)
    // pre-pass per row instead of per-centroid/per-element checks in the
    // scaling-critical assignment kernel
    var v = 0
    while (v < n) {
      if (vec.isNullAt(v))
        throw new IllegalArgumentException(
          s"nearest_centroid: vector element $v is NULL")
      v += 1
    }
    var best = 0
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      if (n != cent.length)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector has $n elements but centroid $c has ${cent.length}")
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val d = x - cent(i)
        acc += d * d
        i += 1
      }
      if (acc < bestDist) { bestDist = acc; best = c }
      c += 1
    }
    InternalRow(best, bestDist)
  }

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroidExpr(GraftColumnBridge.expression(vec), centroids))
}
