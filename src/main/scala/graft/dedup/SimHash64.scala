package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a 64-bit SimHash of a token array.
  *
  * SimHash (Charikar random-hyperplane sketch over feature hashes): each
  * token hashes to 64 bits; bit j of the result is 1 iff the sum over tokens
  * of (+1 when token-hash bit j is set else -1) is positive. Near-duplicate
  * documents land within a small Hamming distance.
  *
  * Implemented as a custom `Expression` (not a UDF) with `doGenCode`, so it
  * fuses into whole-stage codegen with zero serialization overhead — the
  * preferred extension path when built-in functions can't express an
  * operator (here: a 64-lane bit-counting fold).
  *
  * The per-token 64-bit hash is two murmur3_32 lanes (Spark's built-in
  * Murmur3_x86_32 over the UTF-8 bytes with seeds 0x9747b28c and 0x85ebca6b),
  * deterministic across partitions/JVMs.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Column-API entry point. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  private final val Seed1 = 0x9747b28c
  private final val Seed2 = 0x85ebca6b

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s: UTF8String = arr.getUTF8String(i)
        val lo = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed1)
        val hi = Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed2)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
