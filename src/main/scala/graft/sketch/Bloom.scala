package graft.sketch

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter (Bloom, CACM 1970) over string values, built as a custom
  * [[TypedImperativeAggregate]] (OR-mergeable bitset state, map-side
  * combined) and probed by a codegen'd expression — the broadcast-membership
  * primitive for 100 TB prefilters.
  *
  * Why a bitset and not a broadcast string set: a benchmark of 10^7
  * distinct shingles is ~400 MB of strings but a 2^24-bit filter is 2 MB —
  * small enough to ship inside the plan as a literal reference and test
  * per row inside whole-stage codegen with zero shuffles on the probe side.
  * False positives are bounded (~(1−e^{−kn/m})^k); false negatives are
  * impossible, which is the property exactness arguments build on (see
  * [[graft.text.Decontaminate.overlapStatsBloom]]: bloom prefilter + exact
  * confirm ≡ exact join, bit-for-bit).
  *
  * Hash contract: bit j of value v is `hash60("j|" + v) mod mBits`, where
  * `hash60` is the first 15 hex chars of md5 — the SAME function
  * [[Hll]]/[[Cms]] use, so a spec (or an engine twin) can replay every set
  * bit with `cast('0x' || substr(md5(j || '|' || v), 1, 15) as bigint)`.
  */
object Bloom {

  /** 2^21 bits = 256 KiB default; ~0.1% FP at ~200k members with k=7. */
  val DefaultBits = 1 << 21
  val DefaultK = 7

  private val hexDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** JVM twin of [[Hll.hash60]]: first 15 hex chars of md5 as a 60-bit
    * long == the first 8 digest bytes, big-endian, dropping the low nibble.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = hexDigest.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def bitPositions(value: UTF8String, mBits: Int, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val payload = (j.toString + "|").getBytes(
        java.nio.charset.StandardCharsets.UTF_8) ++ value.getBytes
      out(j) = java.lang.Long.remainderUnsigned(hash60(payload), mBits.toLong)
      j += 1
    }
    out
  }

  /** Shared by interpreted eval and generated code. */
  def contains(bits: Array[Long], mBits: Int, k: Int, value: UTF8String): Boolean = {
    val ps = bitPositions(value, mBits, k)
    var j = 0
    while (j < k) {
      val p = ps(j)
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) return false
      j += 1
    }
    true
  }

  def setBits(bits: Array[Long], mBits: Int, k: Int, value: UTF8String): Unit = {
    val ps = bitPositions(value, mBits, k)
    var j = 0
    while (j < k) {
      val p = ps(j)
      bits((p >>> 6).toInt) |= (1L << (p & 63L))
      j += 1
    }
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  /** Builds the filter over one string column; ONE bounded driver collect
    * of mBits/8 bytes (256 KiB at the default) — the build side is meant
    * to be the SMALL set (benchmark, blocklist, seen-ids batch).
    */
  def build(df: DataFrame, value: Column, mBits: Int = DefaultBits,
      k: Int = DefaultK): Array[Long] = {
    val bytes = df
      .select(GraftColumnBridge.column(BloomBuildAgg(
        GraftColumnBridge.expression(value.cast("string")), mBits, k)
        .toAggregateExpression()).as("f"))
      .head().getAs[Array[Byte]](0)
    fromBytes(bytes)
  }

  /** Membership probe column: stays inside whole-stage codegen; the filter
    * rides along as a plan reference object (broadcast with the task
    * binary, not re-serialized per row).
    */
  def mightContain(bits: Array[Long], mBits: Int, k: Int)(value: Column): Column =
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expression(value.cast("string")), bits, mBits, k))
}

/** OR-mergeable bloom build: state is the mBits-bit set itself, constant
  * size regardless of input cardinality; partials combine map-side.
  */
case class BloomBuildAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && (mBits & 63) == 0,
    s"bloom: mBits must be a positive multiple of 64, got $mBits")
  require(mBits <= (1 << 28), s"bloom: mBits over 2^28 (32 MiB) — size the " +
    s"filter for broadcast, got $mBits")
  require(k >= 1 && k <= 16, s"bloom: k must be in [1,16], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, mBits, k, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_build"
}

/** Codegen'd probe: one static call per row against the referenced bitset. */
case class BloomMightContain(
    child: Expression,
    bits: Array[Long],
    mBits: Int,
    k: Int
) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Bloom.contains(bits, mBits, k, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.sketch.Bloom.contains($ref, $mBits, $k, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
