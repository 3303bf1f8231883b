package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-rule LEARNING at corpus scale (Sennrich, Haddow & Birch,
  * "Neural machine translation of rare words with subword units", ACL
  * 2016 — the marker-free variant): [[Bpe]] APPLIES a bundled merge
  * table; this derives one from the corpus, which is how a tokenizer is
  * actually trained over 100 TB of text.
  *
  * Loop shape (the k-means/pagerank convention: a driver loop whose per-
  * iteration spark work is declarative and whose only driver action is
  * ONE bounded collect):
  *   1. the word-frequency table is computed ONCE (the only corpus-sized
  *      aggregation) and each word's symbol state is carried as a
  *      separator-encoded string `␟c1␟␟c2␟...`;
  *   2. per iteration: adjacent-pair counts (explode + map-side-combined
  *      sum over the VOCABULARY, not the corpus), argmax by
  *      (count desc, pair asc) collected — one row — and the winning
  *      pair merged EVERYWHERE via `replace('␟a␟␟b␟' -> '␟ab␟')`.
  *
  * `replace` scans left-to-right non-overlapping in both engines, which
  * IS greedy BPE merging ([a,a,a] + (a,a) -> [aa,a]); the DuckDB twin
  * unrolls the same iterations as a CTE chain with scalar-subquery
  * patterns, so the learned table is replayed rule-for-rule.
  *
  * The separator is U+241F (symbol for unit separator) — the [[Bpe]]
  * convention: it must not occur in the corpus.
  */
object BpeLearn {

  val Sep = "␟"

  /** Symbol-state decode: `␟a␟␟bc␟` -> [a, bc]. */
  private def decode(enc: org.apache.spark.sql.Column) =
    split(expr(s"substring(enc, 2, length(enc) - 2)"), s"$Sep$Sep")

  /** Word-frequency table with initial per-character symbol encoding:
    * (enc, cnt). The one corpus-sized pass.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        concat(
          lit(Sep),
          array_join(split(col("w"), ""), s"$Sep$Sep"),
          lit(Sep)
        ).as("enc"),
        col("cnt")
      )

  /** Adjacent-pair counts over the symbol states, weighted by word
    * frequency: (p1, p2, n).
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = decode(col("enc"))
    words
      .select(syms.as("s"), col("cnt"))
      .filter(size(col("s")) >= 2)
      .select(
        explode(
          zip_with(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1),
            (a, b) => struct(a.as("p1"), b.as("p2"))
          )
        ).as("p"),
        col("cnt")
      )
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum(col("cnt")).as("n"))
  }

  /** Learn the top `numMerges` merge rules. Returns (rank, p1, p2, n) —
    * rank 1 is the first (most frequent) merge. Each iteration's driver
    * action is the single argmax row.
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 64,
      s"bpe learn: numMerges must be in [1, 64], got $numMerges")
    val spark = df.sparkSession
    var words = wordTable(df, textCol)
    // each state is derived from the previous by a narrow projection;
    // localCheckpoint per iteration keeps the lineage flat so iteration
    // k does not replay k-1 replaces over the vocabulary scan
    words = words.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to numMerges) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, n))
        words = words
          .withColumn(
            "enc",
            call_function("replace", col("enc"),
              lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep")))
          .localCheckpoint(true)
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "p1", "p2", "n")
  }
}
