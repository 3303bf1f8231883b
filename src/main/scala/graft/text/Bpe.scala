package graft.text

import scala.io.Source

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge table + its apply algorithm (GPT-2 `bpe()` shape, public
  * merges.txt format): split text into pre-tokens (letter runs / digit
  * runs / single symbols — the same classes as
  * [[TextAnalysis.bpeTokenCount]]), explode each pre-token into
  * characters, then repeatedly merge the adjacent pair with the lowest
  * merge rank (all its occurrences, leftmost first) until no pair is in
  * the table. Unmerged characters stay single tokens — the char-level
  * fallback of a vocab-less BPE.
  *
  * A table is WELL-FORMED when every merge side is a single character or
  * an earlier merge's output and outputs are distinct; for such tables,
  * applying merges once each in rank order equals greedy min-rank
  * application — which is what lets the DuckDB oracle replay tokenization
  * as an unrolled chain of string replacements.
  *
  * A production table is ~50k merges; `ranks` is a single HashMap, so
  * lookup cost is flat in table size (BpeSpec measures throughput at 50k).
  */
final class BpeTable(val merges: IndexedSeq[(String, String)]) extends Serializable {

  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  /** Greedy BPE over one pre-token: repeatedly merge the lowest-rank
    * adjacent pair, all occurrences leftmost-first.
    */
  def bpeWord(word: String): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    while (syms.length > 1) {
      // lowest-rank pair present
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) return syms
      // merge ALL occurrences of that pair, leftmost first
      val a = syms(best); val b = syms(best + 1)
      val out = new java.util.ArrayList[String](syms.length)
      var p = 0
      while (p < syms.length) {
        if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
          out.add(a + b); p += 2
        } else { out.add(syms(p)); p += 1 }
      }
      syms = out.toArray(new Array[String](out.size()))
    }
    syms
  }

  /** Full-text tokenization: pre-tokenize, BPE each pre-token, concatenate. */
  def tokenize(text: String): Array[String] = {
    val out = new java.util.ArrayList[String]()
    val m = BpeTable.PreToken.matcher(text)
    while (m.find()) {
      val toks = bpeWord(m.group())
      var i = 0
      while (i < toks.length) { out.add(toks(i)); i += 1 }
    }
    out.toArray(new Array[String](out.size()))
  }
}

object BpeTable {

  /** The pre-tokenizer: letter runs, digit runs, single non-alnum symbols
    * (whitespace dropped) — shared with the regex-proxy count so the two
    * are comparable.
    */
  private val PreToken = java.util.regex.Pattern
    .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Parse merges.txt lines: `<left> <right>` per line, rank = line order,
    * `#` comments and blanks skipped.
    */
  def parse(lines: Iterator[String]): IndexedSeq[(String, String)] =
    lines
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val sp = l.split(" ", 2)
        require(sp.length == 2, s"malformed merge line: '$l'")
        // a >2-token line would leave a space inside the right side; its
        // rank key could then never match any pair lookup — reject at load
        // instead of carrying a silently dead merge
        require(!sp(1).contains(' '), s"malformed merge line (3+ tokens): '$l'")
        (sp(0), sp(1))
      }
      .toIndexedSeq

  def fromFile(path: String): BpeTable = {
    val src = Source.fromFile(path, "UTF-8")
    try new BpeTable(parse(src.getLines())) finally src.close()
  }

  def fromResource(name: String): BpeTable = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing $name resource")
    try new BpeTable(parse(Source.fromInputStream(in, "UTF-8").getLines()))
    finally in.close()
  }
}

/** A BPE vocabulary: token string -> integer id, id = 0-based position of
  * the token's line in the vocab file (empty lines skipped; NO comment
  * syntax — `#` is itself a legitimate single-symbol token). Tokens
  * outside the vocabulary encode as [[BpeVocab.OovId]] (-1); a training
  * pipeline filters or remaps them explicitly rather than having an
  * implicit unk silently absorb coverage gaps.
  */
final class BpeVocab(val tokens: IndexedSeq[String]) extends Serializable {
  require(tokens.distinct.size == tokens.size, "bpe vocab: duplicate tokens")

  private val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](tokens.size * 2)
    tokens.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }

  /** Id of a token, or [[BpeVocab.OovId]] when out-of-vocabulary. */
  def idOf(token: String): Int = {
    val i = ids.get(token)
    if (i == null) BpeVocab.OovId else i.intValue()
  }

  def size: Int = tokens.size
}

object BpeVocab {

  /** The encode result for a token not in the vocabulary. */
  val OovId: Int = -1

  def parse(lines: Iterator[String]): BpeVocab =
    new BpeVocab(lines.filter(_.nonEmpty).toIndexedSeq)

  def fromFile(path: String): BpeVocab = {
    val src = Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  def fromResource(name: String): BpeVocab = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing $name resource")
    try parse(Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }
}

/** Real byte-pair-encoding tokenization against a trained merge table —
  * the primitive a training-data pipeline prices data with (regex proxies
  * drift 20-40% from real tokenizer counts on web text). Algorithm and
  * table format: [[BpeTable]].
  *
  * Scale shape: a per-row native expression (codegen'd, no shuffle, no
  * UDF serialization); the merge table is loaded once per executor JVM as
  * a static — the broadcast degenerate case.
  */
object Bpe {

  /** The ACTIVE merge table, resolved once per JVM (executors force it on
    * first use of the expression):
    *
    *   1. `-Dgraft.bpe.merges=<path>`  (system property)
    *   2. `GRAFT_BPE_MERGES=<path>`    (environment; the path must exist
    *      on every executor — ship it with `--files` on a real cluster)
    *   3. the bundled 71-merge fixture (`graft/bpe_merges.txt`)
    *
    * The DuckDB oracle chain in ExtensionQueries is built from THIS
    * resolved table, so an override keeps both engines on one fixture —
    * provided it stays well-formed (see [[BpeTable]]), which the bundled
    * fixture is by construction.
    */
  lazy val table: BpeTable =
    sys.props.get("graft.bpe.merges")
      .orElse(sys.env.get("GRAFT_BPE_MERGES"))
      .map(BpeTable.fromFile)
      .getOrElse(BpeTable.fromResource("/graft/bpe_merges.txt"))

  /** (left, right) merges in rank order, from the active table. */
  def merges: IndexedSeq[(String, String)] = table.merges

  /** Greedy BPE over one pre-token (active table). */
  def bpeWord(word: String): Array[String] = table.bpeWord(word)

  /** Full-text tokenization (active table). */
  def tokenize(text: String): Array[String] = table.tokenize(text)

  /** Shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val toks = table.tokenize(text.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** The ACTIVE vocabulary, resolved once per JVM with the same precedence
    * chain as the merge table:
    *
    *   1. `-Dgraft.bpe.vocab=<path>`  (system property)
    *   2. `GRAFT_BPE_VOCAB=<path>`    (environment; ship with `--files`)
    *   3. the bundled fixture (`graft/bpe_vocab.txt` — every printable
    *      ASCII single char plus the bundled table's merge outputs, so the
    *      fixture pair is OOV-free on ASCII text)
    */
  lazy val vocab: BpeVocab =
    sys.props.get("graft.bpe.vocab")
      .orElse(sys.env.get("GRAFT_BPE_VOCAB"))
      .map(BpeVocab.fromFile)
      .getOrElse(BpeVocab.fromResource("/graft/bpe_vocab.txt"))

  /** Column API: array of BPE tokens of a string column. */
  def bpeTokens(c: Column): Column =
    GraftColumnBridge.column(BpeTokensExpr(GraftColumnBridge.expression(c)))

  /** Token count under the real tokenizer. */
  def bpeTokenCount(c: Column): Column =
    org.apache.spark.sql.functions.size(bpeTokens(c))

  /** Shared by interpreted eval and generated code: tokenize + vocab
    * lookup in one pass — no intermediate token-string array column.
    */
  def computeIds(text: UTF8String): ArrayData = {
    val toks = table.tokenize(text.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = vocab.idOf(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  /** Column API: array<int> of BPE token IDS of a string column — the
    * shape a trainer consumes ([[SequencePacker.chunkSlices]] packs these
    * directly). Out-of-vocabulary tokens encode as [[BpeVocab.OovId]].
    */
  def bpeEncode(c: Column): Column =
    GraftColumnBridge.column(BpeIdsExpr(GraftColumnBridge.expression(c)))
}

/** `bpe_tokens(text)` — array<string> of BPE tokens (active merge table). */
case class BpeTokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_tokens requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokensExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_tokens"
}

/** `bpe_ids(text)` — array<int> of BPE token ids under the active merge
  * table + vocabulary (OOV tokens -> [[BpeVocab.OovId]]).
  */
case class BpeIdsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_ids requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Bpe.computeIds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.computeIds($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeIdsExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_ids"
}
