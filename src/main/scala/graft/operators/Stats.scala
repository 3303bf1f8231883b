package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise numeric statistics over wide tables.
  *
  * The correlation matrix is computed from explicit sum moments (n, Sx, Sxx,
  * Sxy) gathered in ONE aggregation pass for every column pair — map-side
  * combined, single-row result exploded to one row per pair. The
  * moment-formula route (vs calling an engine's `corr` aggregate) keeps the
  * arithmetic portable: both engines fold plain sums and apply the same
  * closed form, instead of each running its own streaming-covariance
  * recurrence.
  */
object Stats {

  /** (col_a, col_b, n, corr) for every unordered column pair, col_a <
    * col_b in the given order; rows with a null in ANY of `cols` are
    * excluded so every pair sees the same n. `corr` is a raw double (null
    * when a side has zero variance) for callers to canonicalize.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val clean = df.na.drop(cols).select(cols.map(c => col(c).cast("double")): _*)
    val pairs = for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val moments =
      Seq(count(lit(1)).as("_n")) ++
        cols.flatMap(c =>
          Seq(sum(col(c)).as(s"_s_$c"), sum(col(c) * col(c)).as(s"_ss_$c"))) ++
        pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"_sp_${a}_$b") }
    val rows = pairs.map { case (a, b) =>
      val n   = col("_n").cast("double")
      val va  = n * col(s"_ss_$a") - col(s"_s_$a") * col(s"_s_$a")
      val vb  = n * col(s"_ss_$b") - col(s"_s_$b") * col(s"_s_$b")
      val cov = n * col(s"_sp_${a}_$b") - col(s"_s_$a") * col(s"_s_$b")
      struct(
        lit(a).as("col_a"),
        lit(b).as("col_b"),
        col("_n").as("n"),
        when(va > 0 && vb > 0, cov / (sqrt(va) * sqrt(vb)))
          .otherwise(lit(null).cast("double")).as("corr")
      )
    }
    clean
      .agg(moments.head, moments.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.n"), col("r.corr"))
  }
}
