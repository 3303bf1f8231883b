package graft.text

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a [[TypedImperativeAggregate]] —
  * the mergeable-summaries formulation (Misra & Gries 1982; Agarwal et al.
  * PODS'12): a capacity-c counter map where an unmatched arrival decrements
  * every counter, and two sketches merge by keywise addition followed by
  * subtracting the (c+1)-largest count. State is c (token, count) pairs
  * per partition REGARDLESS of vocabulary size, with map-side partial
  * aggregation under `ObjectHashAggregateExec` — the full `groupBy(token)`
  * it replaces shuffles one row per DISTINCT token (billions at 100 TB).
  *
  * Guarantee (holds under ANY merge order): every token with true
  * frequency > n/(c+1) is present in the final sketch, and each retained
  * estimate is within n/(c+1) below its true count. The retained SET near
  * the threshold may vary with partition merge order — which is why
  * [[HeavyHitters.heavyHitterTokens]] treats the sketch as a CANDIDATE
  * stage and recounts exactly.
  *
  * Result: `struct(total: long, candidates: array<struct<token, est>>)`,
  * candidates ordered (est desc, token asc).
  */
case class MisraGriesSketch(
    tokExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MisraGriesSketch.Buffer] {

  require(capacity > 0, s"misra-gries requires capacity > 0, got $capacity")

  import MisraGriesSketch.Buffer

  override def children: Seq[Expression] = Seq(tokExpr)

  override def nullable: Boolean = false

  override def dataType: org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("total", LongType, nullable = false),
      StructField("candidates", ArrayType(
        StructType(Seq(
          StructField("token", StringType, nullable = false),
          StructField("est", LongType, nullable = false))),
        containsNull = false), nullable = false)))
  }

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val t = tokExpr.eval(input)
    if (t != null) {
      buf.total += 1L
      val key = t.asInstanceOf[UTF8String].toString
      val cur = buf.counts.getOrElse(key, 0L)
      if (cur > 0L || buf.counts.size < capacity) buf.counts.update(key, cur + 1L)
      else {
        // unmatched arrival at capacity: decrement everyone, drop zeros
        val dead = mutable.ArrayBuffer.empty[String]
        buf.counts.keysIterator.foreach { k =>
          val v = buf.counts(k) - 1L
          if (v == 0L) dead += k else buf.counts.update(k, v)
        }
        dead.foreach(buf.counts.remove)
      }
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.total += other.total
    other.counts.foreach { case (k, v) =>
      buf.counts.update(k, buf.counts.getOrElse(k, 0L) + v)
    }
    if (buf.counts.size > capacity) {
      // subtract the (c+1)-largest count from everyone (Agarwal et al.)
      val cut = buf.counts.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counts.keysIterator.foreach { k =>
        val v = buf.counts(k) - cut
        if (v <= 0L) dead += k else buf.counts.update(k, v)
      }
      dead.foreach(buf.counts.remove)
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val sorted = buf.counts.toArray.sortBy { case (k, v) => (-v, k) }
    val rows: Array[Any] = sorted.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v)
    }
    InternalRow(buf.total, new GenericArrayData(rows))
  }

  // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws for tokens
  // over 65535 encoded bytes, and an unbroken >64KB run (base64 blob,
  // minified JS) is exactly the adversarial web-corpus input a 100 TB
  // sketch must survive
  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.total)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer()
    buf.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(
        new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): MisraGriesSketch = copy(tokExpr = newChildren(0))

  override def prettyName: String = "misra_gries"
}

object MisraGriesSketch {

  /** Mutable sketch state: capped counter map + exact instance total. */
  final class Buffer {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var total: Long = 0L
  }

  /** Column-API entry point: `sketch(token, capacity)` inside `agg(...)`. */
  def sketch(token: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGriesSketch(
        GraftColumnBridge.expression(token.cast("string")),
        capacity
      ).toAggregateExpression())
}

/** Exact heavy-hitter tokens at 100 TB: a two-pass scheme where the
  * sketch only ever PROPOSES.
  *
  *  1. **Candidate pass** — one [[MisraGriesSketch]] aggregation over the
  *     token instances with capacity `ceil(1/minFrac)`. The MG guarantee
  *     makes the retained set a SUPERSET of every token with frequency
  *     >= minFrac, no matter how partitions merged; at most `capacity`
  *     strings reach the driver.
  *  2. **Exact pass** — recount ONLY the candidates (an `isin` filter the
  *     scan can push down) and keep those at or above the exact
  *     threshold `ceil(total * minFrac)`.
  *
  * The final output is therefore EXACT and deterministic — merge-order
  * jitter in the sketch cannot reach it — while the full
  * `groupBy(token)` over a billion-token vocabulary never happens.
  */
object HeavyHitters {

  /** @param minFrac minimum instance share, in (0, 1]
    * @return (token, cnt): exact counts, (cnt desc, token asc)
    */
  def heavyHitterTokens(
      df: DataFrame,
      textCol: Column,
      minFrac: Double
  ): DataFrame = {
    require(minFrac > 0 && minFrac <= 1, s"heavy hitters: minFrac in (0,1], got $minFrac")
    val capacity = math.ceil(1.0 / minFrac).toInt
    // the candidate set is collected AND becomes an isin filter — both are
    // only sane while it stays small; a tighter threshold needs a keyed
    // join of candidates instead (and is no longer a "heavy" hitter ask)
    require(capacity <= 65536,
      s"heavy hitters: minFrac $minFrac implies $capacity candidates; " +
        "use minFrac >= 2e-5 or a plain groupBy for rare-token censuses")
    val inst = df.select(
      explode(TextAnalysis.tokens(coalesce(textCol, lit("")))).as("_tok"))
    // bounded driver payload: total + <= capacity candidate strings
    val sk = inst
      .agg(MisraGriesSketch.sketch(col("_tok"), capacity).as("s"))
      .select(col("s.total").as("total"), col("s.candidates.token").as("cands"))
      .head()
    val total = sk.getLong(0)
    val cands = sk.getSeq[String](1)
    val minCount = math.ceil(total * minFrac).toLong
    if (total == 0L || cands.isEmpty)
      inst.sparkSession.createDataFrame(
        inst.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("token",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType))))
    else
      inst
        .filter(col("_tok").isin(cands: _*))
        .groupBy(col("_tok").as("token"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("token"))
  }
}
