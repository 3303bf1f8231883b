package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** Real-BPE specs: hand-computed tokenizations, merge-table well-formedness
  * (the property the DuckDB oracle's unrolled-replace replay relies on),
  * greedy == rank-sequential equivalence, and pipeline integration.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed tokenizations (greedy min-rank merges)") {
    // "theater": t h e a t e r -> th -> the -> er -> at (rank 8 beats t+er)
    assert(Bpe.bpeWord("theater").toSeq == Seq("the", "at", "er"))
    // "The": (h,e) outranks (T,h) -> T he
    assert(Bpe.bpeWord("The").toSeq == Seq("T", "he"))
    // "nation": (o,n) first blocks the io/ion path -> n at i on
    assert(Bpe.bpeWord("nation").toSeq == Seq("n", "at", "i", "on"))
    assert(Bpe.tokenize("The nation is 42% ready!").toSeq ==
      Seq("T", "he", "n", "at", "i", "on", "is", "4", "2", "%", "re", "a", "d", "y", "!"))
    assert(Bpe.tokenize("").isEmpty)
    assert(Bpe.tokenize("   \t\n ").isEmpty)
  }

  test("merge table is well-formed: sides are chars or earlier outputs, outputs distinct") {
    val outputs = scala.collection.mutable.Set[String]()
    Bpe.merges.foreach { case (a, b) =>
      assert(a.length == 1 || outputs.contains(a), s"left side '$a' not derivable")
      assert(b.length == 1 || outputs.contains(b), s"right side '$b' not derivable")
      val out = a + b
      assert(!outputs.contains(out), s"duplicate output '$out'")
      outputs += out
    }
  }

  test("greedy == rank-sequential application (the oracle's replay strategy)") {
    // the sequential applier the DuckDB replace() chain implements: one
    // leftmost-first all-occurrences pass per merge, in rank order
    def sequential(word: String): Seq[String] = {
      var syms: Vector[String] = word.map(String.valueOf(_)).toVector
      Bpe.merges.foreach { case (a, b) =>
        val out = Vector.newBuilder[String]
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
            out += (a + b); p += 2
          } else { out += syms(p); p += 1 }
        }
        syms = out.result()
      }
      syms
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "thequickbrownfxjmpsvlazydgINATON"
    val words = (1 to 500).map(_ =>
      (1 to (rnd.nextInt(12) + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    (words ++ Seq("the", "when", "question", "professional", "iitt", "aaaa", "ononon"))
      .foreach { w =>
        assert(Bpe.bpeWord(w).toSeq == sequential(w), s"divergence on '$w'")
      }
  }

  test("bpe expression: column API matches the Scala tokenizer; nulls pass through") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val rows = docs
      .select($"text", Bpe.bpeTokens($"text").as("toks"), Bpe.bpeTokenCount($"text").as("n"))
      .collect()
    rows.foreach { r =>
      val expected = Bpe.tokenize(r.getString(0)).toSeq
      assert(r.getSeq[String](1) == expected)
      assert(r.getInt(2) == expected.length)
    }
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, "ok")).toDF("id", "text")
      .select(Bpe.bpeTokens($"text").as("toks")).collect()
    assert(nulls.exists(_.isNullAt(0)) && nulls.exists(!_.isNullAt(0)))
  }

  test("real token counts drive packing and mixing") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val packed = graft.text.SequencePacker
      .pack(docs, "doc_id", Bpe.bpeTokenCount($"text"), budget = 512, buckets = 4)
    // n_tokens really is the BPE count, and cum/pack arithmetic holds
    val sample = packed.select("doc_id", "n_tokens", "cum_tokens", "pack_id").collect()
    val byId = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Bpe.tokenize(r.getString(1)).length).toMap
    sample.foreach { r =>
      assert(r.getInt(1) == byId(r.getLong(0)))
      assert(r.getInt(3) == ((r.getLong(2) - r.getInt(1)) / 512).toInt)
    }
    val rates = graft.operators.Mixer.mixRates(
      docs, "source", Bpe.bpeTokenCount($"text"),
      Map("src0" -> 0.5, "src1" -> 0.5), budgetTokens = 100000L)
    assert(rates.nonEmpty && rates.values.forall(r => r > 0 && r <= 1.0))
  }

  test("merge table loads from a file path (the GRAFT_BPE_MERGES/sysprop surface)") {
    import java.nio.file.Files
    val f = Files.createTempFile("merges", ".txt")
    Files.writeString(f,
      """# test table
        |a b
        |ab ab
        |""".stripMargin)
    val t = graft.text.BpeTable.fromFile(f.toString)
    assert(t.merges == IndexedSeq(("a", "b"), ("ab", "ab")))
    assert(t.bpeWord("abab").toSeq == Seq("abab"))
    assert(t.bpeWord("aba").toSeq == Seq("ab", "a"))
    assert(t.tokenize("abab aba x1").toSeq == Seq("abab", "ab", "a", "x", "1"))
    // resolution order is sysprop > env > bundled resource; the bundled
    // fixture is what this JVM resolved (no override set)
    assert(Bpe.merges.size == 71)
  }

  test("production-size table: 50k merges load fast and lookup cost stays flat") {
    // well-formed synthetic table: all 26^2 char pairs, then pairs of
    // 2-char outputs until 50k (every side is a char or an earlier output)
    val letters = ('a' to 'z').map(String.valueOf)
    val level1 = for (a <- letters; b <- letters) yield (a, b)
    val twoChar = level1.map { case (a, b) => a + b }
    val level2 = (for (a <- twoChar.iterator; b <- twoChar.iterator) yield (a, b))
      .take(50000 - level1.size)
    val t0 = System.nanoTime()
    val big = new graft.text.BpeTable((level1 ++ level2).toIndexedSeq)
    val buildMs = (System.nanoTime() - t0) / 1e6
    assert(big.merges.size == 50000)
    assert(buildMs < 5000, s"50k-merge table build took $buildMs ms")
    // ~1 MB of text through the full tokenizer; the per-word loop is
    // O(len^2) hash probes, independent of table size
    val rnd = new scala.util.Random(42)
    val words = Array.fill(20000)(
      (0 until 4 + rnd.nextInt(8)).map(_ => letters(rnd.nextInt(26))).mkString)
    val text = words.mkString(" ")
    val t1 = System.nanoTime()
    val toks = big.tokenize(text)
    val tokMs = (System.nanoTime() - t1) / 1e6
    assert(toks.nonEmpty && toks.length < words.map(_.length).sum)
    assert(tokMs < 10000, s"tokenizing ${text.length} chars took $tokMs ms")
    // merges actually fire: 4-char words collapse to <= 2 tokens
    assert(big.bpeWord("abcd").toSeq == Seq("abcd") ||
      big.bpeWord("abcd").length <= 2)
    // and correctness at size: greedy picks the LOWEST-rank pair first
    assert(big.bpeWord("ab").toSeq == Seq("ab"))
  }

  test("malformed merge lines (3+ tokens) fail fast at load, not silently dead") {
    val ex = intercept[IllegalArgumentException] {
      graft.text.BpeTable.parse(Iterator("a b", "x y z"))
    }
    assert(ex.getMessage.contains("3+ tokens"))
  }

  // ---- encode-to-ids ------------------------------------------------------

  import graft.text.BpeVocab

  test("vocab: line order is the id; OOV is -1; duplicates rejected") {
    val v = BpeVocab.parse(Iterator("a", "b", "#", "ab"))
    assert(v.size == 4)
    assert(v.idOf("a") == 0 && v.idOf("#") == 2 && v.idOf("ab") == 3)
    assert(v.idOf("zz") == BpeVocab.OovId)
    intercept[IllegalArgumentException] { BpeVocab.parse(Iterator("a", "a")) }
    // bundled fixture: printable ASCII singles + all bundled merge outputs,
    // so the fixture pair is OOV-free over ASCII text
    assert(Bpe.vocab.size == 165)
    Bpe.merges.foreach { case (a, b) =>
      assert(Bpe.vocab.idOf(a + b) >= 0, s"merge output ${a + b} missing from vocab")
    }
    (33 to 126).foreach(c =>
      assert(Bpe.vocab.idOf(String.valueOf(c.toChar)) >= 0, s"char $c missing"))
  }

  test("vocab loads from a file path (the GRAFT_BPE_VOCAB/sysprop surface)") {
    import java.nio.file.Files
    val f = Files.createTempFile("vocab", ".txt")
    Files.writeString(f, "x\ny\nxy\n")
    val v = BpeVocab.fromFile(f.toString)
    assert(v.tokens == IndexedSeq("x", "y", "xy") && v.idOf("xy") == 2)
  }

  test("bpeEncode: ids are the vocab lookup of bpeTokens, fused in one expression") {
    val d = Seq(
      (1L, "the theme is on!"),
      (2L, "in and on"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = d
      .select(
        col("doc_id"),
        Bpe.bpeTokens(col("text")).as("toks"),
        Bpe.bpeEncode(col("text")).as("ids"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[scala.collection.Seq[String]]("toks")),
          Option(r.getAs[scala.collection.Seq[Int]]("ids")))))
      .toMap
    // ids == per-token vocab lookup, null text passes through
    out.foreach { case (_, (toks, ids)) =>
      assert(toks.isDefined == ids.isDefined)
      toks.zip(ids).foreach { case (ts, is) =>
        assert(is.toSeq == ts.map(Bpe.vocab.idOf).toSeq)
      }
    }
    assert(out(3L)._1.isEmpty)
    // the fixture corpus alphabet is in-vocab: no -1 anywhere
    assert(out.values.flatMap(_._2).flatten.forall(_ >= 0))
    // and a character OUTSIDE the vocab encodes as OovId
    val oov = Seq((1L, "é")).toDF("doc_id", "text")
      .select(Bpe.bpeEncode(col("text")).as("ids"))
      .head().getAs[scala.collection.Seq[Int]]("ids")
    assert(oov.toSeq == Seq(BpeVocab.OovId))
  }

  test("pack-on-ids: chunk slices tile the packs and reassemble every document") {
    import graft.text.SequencePacker
    val texts = Seq(
      (1L, "the theme of the theme is the theme"),
      (2L, "in and on or at"),
      (3L, "a b c d e f g h i j k l"),
      (4L, "onion onion onion onion onion"),
      (5L, "x")
    )
    val d = texts.toDF("doc_id", "text")
      .withColumn("ids", Bpe.bpeEncode(col("text")))
    // the composition contract: pack on size(ids), slice the same array
    val packed = SequencePacker.pack(d, "doc_id", size(col("ids")), budget = 8, buckets = 2)
    val sliced = SequencePacker.chunkSlices(packed, budget = 8, "ids").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bucket"),
        r.getAs[Int]("pack_id"), r.getAs[Int]("chunk_tokens"),
        r.getAs[scala.collection.Seq[Int]]("chunk_ids").toSeq))
    // every slice is exactly chunk_tokens long
    sliced.foreach { case (_, _, _, n, ids) => assert(ids.length == n) }
    // concatenating a doc's slices in pack order == its full id array
    val fullIds = d.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Int]]("ids").toSeq)
      .toMap
    sliced.groupBy(_._1).foreach { case (doc, cs) =>
      val together = cs.sortBy(_._3).flatMap(_._5).toSeq
      assert(together == fullIds(doc), s"doc $doc reassembly")
    }
    // every non-final pack in each bucket carries exactly `budget` ids
    sliced.groupBy(c => (c._2, c._3)).foreach { case ((bucket, pack), cs) =>
      val lastPack = sliced.filter(_._2 == bucket).map(_._3).max
      val total = cs.map(_._5.length).sum
      if (pack < lastPack) assert(total == 8, s"pack ($bucket,$pack) holds $total")
      else assert(total <= 8)
    }
  }
}
