package graft

import graft.functions.WordPieceEncode
import graft.pipeline.{Bpe, WordPiece}

/** The WordPiece trainer's contracts: the likelihood argmax (count
  * ratio) genuinely differs from BPE's raw-count argmax, the `##`
  * convention is carried through merges, the trained vocab feeds the
  * production encoder with zero [UNK] on its corpus, and training is
  * deterministic.
  */
class WordPieceTrainSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("likelihood argmax picks the rare-but-exclusive pair over the frequent pair") {
    // "th" is the most FREQUENT pair, but t and h are everywhere, so its
    // ratio is small; q/z appear ONLY together, so (q, ##z) scores
    // count/(count·count) = 1/count — the largest possible ratio.
    // BPE (raw count) must pick differently on the same corpus.
    val corpus = docs(
      "the then that there those them they math hat tooth", // th-heavy
      "the then that there those them thus both width worth",
      "hot hit hut heat tea ten net not ton toe",            // spread t/h
      "qz qz qz")                                            // exclusive pair
    val wp = WordPiece.train(corpus, "text", maxMerges = 1, minPairCount = 2)
    val firstMerge = wp.last // chars first, merges appended
    assert(firstMerge === "qz", s"wordpiece first merge was $firstMerge")
    val bpe = Bpe.trainMerges(corpus, "text", maxMerges = 1, minPairCount = 2)
    assert(bpe.head._1 + bpe.head._2 !== "qz",
      "the corpus must make count-argmax and ratio-argmax disagree")
  }

  test("## convention carries through chained merges") {
    // one word repeated: merges chain inside it; every learned symbol
    // must be a legal WordPieceEncode entry with positional markers
    val corpus = docs(Seq.fill(8)("abcd").mkString(" "))
    val vocab = WordPiece.train(corpus, "text", maxMerges = 3, minPairCount = 2)
    val merged = vocab.filter(v => v.stripPrefix("##").length > 1)
    // alphabet: bare a + continuations ##b ##c ##d
    assert(vocab.contains("a") && vocab.contains("##b") &&
      vocab.contains("##c") && vocab.contains("##d"))
    // merges stay marker-correct: word-initial merges bare, others ##
    val learned = vocab.drop(4) // after the sorted 4-char alphabet
    assert(learned.size === 3)
    assert(learned.forall(s => s.length > 1))
    learned.foreach { s =>
      assert(s.startsWith("##") || s.startsWith("a"),
        s"merged symbol $s is neither continuation nor word-initial")
    }
    assert(merged.nonEmpty)
  }

  test("trained vocab drives WordPieceEncode with zero [UNK] on its corpus; deterministic") {
    val corpus = docs(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the dog and the fox and the jugs again")
    val a = WordPiece.train(corpus, "text", maxMerges = 16, minPairCount = 2)
    val b = WordPiece.train(corpus, "text", maxMerges = 16, minPairCount = 2)
    assert(a === b)
    val enc = new WordPieceEncode.Encoder(a, "[UNK]")
    val unk = corpus.as[(Long, String)].collect().map { case (_, t) =>
      enc.encode(t).getLong(2)
    }.sum
    assert(unk === 0L)
    // and the merges actually shorten the token stream vs chars-only
    val charsOnly = new WordPieceEncode.Encoder(
      a.filter(s => s.length == 1 || (s.startsWith("##") && s.length == 3)), "[UNK]")
    val (full, chars) = corpus.as[(Long, String)].collect().map { case (_, t) =>
      (enc.encode(t).getLong(1), charsOnly.encode(t).getLong(1))
    }.reduce((p, q) => (p._1 + q._1, p._2 + q._2))
    assert(full < chars, s"merges must shorten the stream ($full vs $chars)")
  }

  test("trainIndexed === train: hand corpus, gate corpus, several configs") {
    val hand = docs(
      "the then that there those them they math hat tooth",
      "qz qz qz", "abab abab cdcd")
    assert(WordPiece.trainIndexed(hand, "text", vocabCap = 20, maxMerges = 12) ===
      WordPiece.train(hand, "text", vocabCap = 20, maxMerges = 12))
    val corpus = graft.core.Tables.documents(spark, sf("sf0.001"))
    for ((cap, mm, mpc) <- Seq((2048, 48, 2L), (300, 200, 2L), (100, 500, 1L))) {
      val rescan = WordPiece.train(corpus, "text", cap, mm, mpc)
      val indexed = WordPiece.trainIndexed(corpus, "text", cap, mm, mpc)
      assert(indexed === rescan, s"cap=$cap maxMerges=$mm minPairCount=$mpc")
    }
  }

  test("trainIndexed === train on a Zipf pseudo-corpus at 2k+ merges") {
    // the configuration the indexed trainer EXISTS for (VERDICT r18 #6):
    // a production-shaped corpus with thousands of likelihood-argmax
    // picks — delta-updated symbol counts, symbol->pair re-scoring and
    // the TreeSet head must replay the rescan bit-for-bit
    val pseudo = graft.tools.ZipfCorpus.build(spark, nDocs = 8000)
    val t0 = System.nanoTime()
    val indexed = WordPiece.trainIndexed(pseudo, "text",
      vocabCap = 8192, maxMerges = 2048, minPairCount = 2L)
    val t1 = System.nanoTime()
    val rescan = WordPiece.train(pseudo, "text",
      vocabCap = 8192, maxMerges = 2048, minPairCount = 2L)
    val t2 = System.nanoTime()
    assert(indexed === rescan)
    assert(indexed.length > 2048, s"trained only ${indexed.length - 2048} merges")
    info(f"indexed ${(t1 - t0) / 1e9}%.1f s vs rescan ${(t2 - t1) / 1e9}%.1f s " +
      f"(${(t2 - t1).toDouble / math.max(t1 - t0, 1)}%.1fx)")
  }
}
