package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-minimum-values aggregate: the k smallest DISTINCT values of a long
  * column, as a sorted array. State is a capped sorted set — at most k
  * longs per partition regardless of input cardinality, map-side combined
  * under `ObjectHashAggregateExec` — vs the `groupBy(value)` a distinct
  * build would shuffle (one row per DISTINCT value; billions at 100 TB).
  *
  * Merge = set union + trim, which is associative/commutative, so the
  * result is EXACTLY the k smallest distinct values under any partition
  * merge order — deterministic, hence oracle-replayable by a plain SQL
  * `row_number() over (order by h) <= k` on the distinct values.
  */
case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"kmv requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow
  ): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]
  ): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): KmvMinHashes = copy(child = newChildren(0))

  override def prettyName: String = "kmv_min_hashes"
}

/** K-minimum-values distinct sketch (Bar-Yossef et al., RANDOM 2002; the
  * theta-sketch bottom-k formulation of Dasgupta et al., "Theta sketch
  * framework", 2016): keep the k smallest distinct 60-bit hashes per group.
  *
  * Why it exists beside [[Hll]]: HLL estimates the cardinality of ONE set
  * (and unions merge losslessly), but it cannot estimate INTERSECTIONS —
  * the cross-source overlap question. KMV can: the k smallest hashes of
  * the union are a uniform distinct-value sample of the union, so the
  * fraction of them present in both sides estimates Jaccard, and
  * `Jaccard x |union|` estimates the intersection — the scale twin of the
  * exact [[graft.operators.SourceOverlap]] matrix, whose distinct
  * `(source, shingle)` shuffle is corpus-sized at 100 TB while this one
  * moves at most k longs per partition.
  *
  * Like the other sketches, the artifact is relational — `(group...,  h)`
  * rows, at most k per group — and every build/merge step is exactly
  * replayable: the hash is [[Hll.hash60]] (15 hex chars of md5) and
  * "k smallest distinct" is a SQL `row_number` over distinct hashes. Only
  * the final estimates divide.
  */
object Kmv {

  val DefaultK = 256

  /** `agg(...)` entry point over a precomputed long hash column. */
  def minHashes(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvMinHashes(GraftColumnBridge.expression(h), k).toAggregateExpression())

  /** Builds the sketch: at most k `(groupCols..., h)` rows per group, the
    * k smallest distinct [[Hll.hash60]] hashes of `value`. One narrow pass
    * + one map-side-combined aggregation; the explode is sketch-sized.
    */
  def sketch(
      df: DataFrame,
      value: Column,
      groupCols: Seq[String] = Nil,
      k: Int = DefaultK
  ): DataFrame = {
    require(k > 0, s"kmv: k must be > 0, got $k")
    df.filter(value.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(minHashes(Hll.hash60(value), k).as("_hs"))
      .select((groupCols.map(col) :+ explode(col("_hs")).as("h")): _*)
  }

  /** Merges sketches over the same key space: union + re-trim to the k
    * smallest distinct — associative, so merge-of-parts equals the sketch
    * of the union exactly. Input and output are sketch-sized.
    */
  def merge(sketches: DataFrame, groupCols: Seq[String] = Nil, k: Int = DefaultK): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"))
    sketches
      .select((groupCols.map(col) :+ col("h")): _*)
      .distinct()
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Distinct-count estimate per group from a sketch: exact when the
    * sketch holds fewer than k hashes (it IS the distinct set), else the
    * classic `(k-1) * 2^60 / h_k` with `h_k` the largest kept hash. The
    * single floating-point step; callers round for display.
    */
  def distinctEstimate(
      sk: DataFrame,
      groupCols: Seq[String] = Nil,
      k: Int = DefaultK
  ): DataFrame =
    sk.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hk"))
      .select((groupCols.map(col) :+
        when(col("_n") < k, col("_n").cast("double"))
          .otherwise(
            lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
              col("_hk").cast("double"))
          .as("est_distinct")): _*)

  /** Pairwise overlap estimates between per-`srcCol` sketches: for every
    * source pair (a < b), the k smallest distinct hashes of the pair's
    * UNION form the comparison window; hashes present in BOTH sketches
    * estimate Jaccard, and `jaccard x union estimate` estimates the
    * intersection cardinality.
    *
    * Everything operates on sketch rows: the pair grid is |S|^2/2 and each
    * pair sees at most 2k hashes. Output: `(src_a, src_b, kmv_window,
    * kmv_matches, est_jaccard, est_overlap)`.
    */
  def pairwiseOverlap(
      sk: DataFrame,
      srcCol: String = "source",
      k: Int = DefaultK
  ): DataFrame = {
    val srcs = sk.select(col(srcCol)).distinct()
    // source-pair grid: a broadcast cross of the SOURCE ALPHABET with
    // itself — |S|^2/2 rows where |S| is the (small, bounded) source list,
    // never anything corpus-sized. The full matrix is the ask; a caller
    // with thousands of sources should filter the pair grid first.
    val pairs = srcs
      .select(col(srcCol).as("src_a"))
      .crossJoin(broadcast(srcs.select(col(srcCol).as("src_b"))))
      .filter(col("src_a") < col("src_b"))
    // each sketch row fans out to the pairs its source participates in —
    // two broadcast EQUI-joins (one per pair side), not an OR-condition
    // nested loop; the fan-out |S|-1 per row is inherent to a full matrix
    def side(me: String) = sk
      .join(broadcast(pairs), col(srcCol) === col(me))
      .select(
        col("src_a"), col("src_b"), col("h"),
        lit(if (me == "src_a") 1 else 0).as("_ina"),
        lit(if (me == "src_b") 1 else 0).as("_inb"))
    val rows = side("src_a")
      .unionByName(side("src_b"))
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("_ina")).as("_ina"), max(col("_inb")).as("_inb"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    val windowed = rows
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
    windowed
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("kmv_window"),
        sum(col("_ina") * col("_inb")).as("kmv_matches"),
        max(col("h")).as("_hk"))
      .select(
        col("src_a"),
        col("src_b"),
        col("kmv_window"),
        col("kmv_matches"),
        (col("kmv_matches").cast("double") / col("kmv_window").cast("double"))
          .as("est_jaccard"),
        (col("kmv_matches").cast("double") / col("kmv_window").cast("double") *
          when(col("kmv_window") < k, col("kmv_window").cast("double"))
            .otherwise(
              lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
                col("_hk").cast("double")))
          .as("est_overlap"))
  }

  /** DuckDB twin fragments. The sketch replay over a relation with a
    * distinct-value hash column: `row_number() over (... order by h) <= k`.
    */
  object duck {
    def hash60(v: String): String = Hll.duck.hash60(v)

    /** est_distinct over aggregated `(n, hk)` per group. */
    def estimateExpr(k: Int, n: String = "n", hk: String = "hk"): String =
      s"(case when $n < $k then cast($n as double) " +
        s"else ($k - 1.0) * ${math.pow(2.0, 60)} / cast($hk as double) end)"
  }
}
