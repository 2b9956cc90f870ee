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
}
