package graft.similarity

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k (id, score) pairs with the
  * highest score (ties broken by smaller id) in a fixed-size binary heap.
  *
  * This replaces the `row_number() OVER (PARTITION BY src ORDER BY score
  * DESC) <= k` idiom for per-group top-k. The window form shuffles and sorts
  * EVERY candidate row; as a `TypedImperativeAggregate` this runs inside
  * `ObjectHashAggregateExec` with map-side partial aggregation — each
  * partition forwards at most k pairs per group, so the shuffle volume drops
  * from O(candidates) to O(groups * k) and no sort happens at all. At the
  * 100 TB design point (billions of candidate edges from the LSH self-join)
  * that is the difference between a sort-spill stage and a streaming pass.
  *
  * Result: `array<struct<dst:long, score:double, rank:int>>`, ordered by
  * (score desc, dst asc) with rank 1..k — `inline()` it to get one row per
  * neighbor.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dst", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("rank", IntegerType, nullable = false)
    )),
    containsNull = false
  )

  /** Heap head = the entry to evict first = lowest score, then larger id.
    * Scores compare via java.lang.Double.compare so NaN ranks GREATEST —
    * exactly how `ORDER BY score DESC` ranks it in the window form this
    * aggregate replaces (an (-s, id) tuple ordering would flip that: -NaN
    * is still NaN and would be evicted first).
    */
  private val evictionOrder: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictionOrder)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow
  ): mutable.PriorityQueue[(Double, Long)] = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      insert(buf, (score.asInstanceOf[Double], id.asInstanceOf[Long]))
    }
    buf
  }

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)
  ): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (evictionOrder.compare(e, buf.head) < 0) { // e outranks current worst
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]
  ): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending eviction order = best first (score desc, NaN first, id asc)
    val sorted = buf.toArray.sorted(evictionOrder)
    val rows: Array[Any] = sorted.zipWithIndex.map { case ((s, id), i) =>
      InternalRow(id, s, i + 1)
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, id) => out.writeDouble(s); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {

  /** Column-API entry point: `topK(id, score, k)` inside an `agg(...)`.
    * `id` must be numeric (it is cast to long — a non-numeric id would
    * throw under ANSI mode, or null out and drop rows under legacy mode).
    */
  def topK(id: Column, score: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(
        GraftColumnBridge.expression(id.cast("long")),
        GraftColumnBridge.expression(score.cast("double")),
        k
      ).toAggregateExpression()
    )
}
