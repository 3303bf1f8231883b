package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Shards
import graft.text.CorpusPipeline

/** End-to-end corpus-curation CLI — the training-data counterpart of
  * [[PipelineCli]]: documents parquet -> quality/language gates + PII
  * redaction + dedup ([[CorpusPipeline.prepare]]) -> deterministic
  * training shards ([[Shards.write]]) -> read-back audit
  * ([[Shards.readBackAudit]]), with a machine-readable stats report.
  * Exit code 0 iff the audit holds (every input row accounted for, one
  * file per shard, contiguous within-shard positions).
  *
  * Usage: CurateCli <documents.parquet> <outDir> [nShards]
  */
object CurateCli {

  final case class Summary(
      nIn: Long,
      nKept: Long,
      nShards: Int,
      auditOk: Boolean)

  /** JSON string escape (backslash, quote, control chars) — free-form
    * source/lang values must not corrupt the machine-readable report.
    */
  private def jstr(v: Any): String =
    if (v == null) "null"
    else "\"" + v.toString.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def run(
      spark: SparkSession,
      input: String,
      outDir: String,
      nShards: Int,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()
  ): Summary = {
    val docs = spark.read.parquet(input)
    val nIn = docs.count()
    // cache: the curation gates are the expensive stage and three actions
    // read the result (shard write, audit comparison, stats report)
    val kept = CorpusPipeline.prepare(docs, cfg = cfg)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("quality_score"), col("n_tokens"))
      .cache()
    val nKept = kept.count()
    val shardDir = s"$outDir/shards"
    // report the number of shards that EXIST: zero when nothing was kept,
    // so a consumer keying on the stats file never expects missing files
    val nShardsOut = if (nKept == 0) 0 else nShards
    val auditOk =
      if (nKept == 0) {
        // nothing survived the gates: no shard files to write or audit —
        // an EMPTY corpus is a valid (if alarming) outcome, not a crash
        true
      } else {
        Shards.write(kept, "doc_id", shardDir, nShards, orderCols = Seq("source"))
        // audit the FILES, not the plan: every kept row present exactly
        // once, one file per shard, 0-based contiguous DISTINCT positions
        // (min/max alone would accept a duplicated+dropped row pair)
        val audit = Shards.readBackAudit(spark, shardDir).cache()
        val nBack = audit.count()
        val filesOk = audit.agg(max(col("files_in_shard"))).head().getLong(0) <= 1L
        val posOk = audit
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"), countDistinct(col("shard_pos")).as("nd"),
            min(col("shard_pos")).as("lo"), max(col("shard_pos")).as("hi"))
          .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1 ||
            col("nd") =!= col("n"))
          .isEmpty
        audit.unpersist()
        nBack == nKept && filesOk && posOk
      }

    // per-source/lang stats the mix designer reads
    val stats = kept
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source", "lang")
      .collect()
      .map(r =>
        s"""{"source":${jstr(r.get(0))},"lang":${jstr(r.get(1))},""" +
          s""""n_docs":${r.getLong(2)},"n_tokens":${r.getLong(3)}}""")
      .mkString("[", ",", "]")
    kept.unpersist()
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(
      Paths.get(s"$outDir/corpus_stats.json"),
      s"""{"n_in":$nIn,"n_kept":$nKept,"n_shards":$nShardsOut,""" +
        s""""audit_ok":$auditOk,"strata":$stats}""" + "\n")
    Summary(nIn, nKept, nShardsOut, auditOk)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateCli <documents.parquet> <outDir> [nShards]")
    val nShards = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession
      .builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-curate")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, args(0), args(1), nShards)
    println(s"[curate] in=${s.nIn} kept=${s.nKept} shards=${s.nShards} audit_ok=${s.auditOk}")
    spark.stop()
    if (!s.auditOk) sys.exit(1)
  }
}
