package graft

import graft.functions.UnigramEncode
import graft.pipeline.Unigram

/** The unigram trainer's contracts: determinism, coverage (chars always
  * kept ⇒ the trained model never emits [UNK] on its own training
  * corpus), the EM rounds doing real work (Viterbi counts ≠ raw
  * substring counts), and the prune honoring (count DESC, piece ASC).
  */
class UnigramTrainSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private val corpus = docs(
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "quick foxes and lazy dogs over and over again",
    "the dog and the fox and the jugs again")

  test("training is deterministic and ordered (count DESC, piece ASC)") {
    val a = Unigram.train(corpus, "text", vocabSize = 40)
    val b = Unigram.train(corpus, "text", vocabSize = 40)
    assert(a === b)
    // output order is the gate's vrank order
    val byRule = a.sortBy(v => (-v._3, v._1))
    assert(a === byRule)
    // scores are quantized log-probs: all strictly negative, and equal
    // counts get equal scores
    assert(a.forall(_._2 < 0L))
    a.groupBy(_._3).foreach { case (_, vs) =>
      assert(vs.map(_._2).distinct.size === 1)
    }
  }

  test("every corpus character is kept, so the trained model has zero [UNK] on its corpus") {
    val vocab = Unigram.train(corpus, "text")
    val pieces = vocab.map(_._1).toSet
    val chars = corpus.as[(Long, String)].collect()
      .flatMap(r => graft.pipeline.Bpe.words(r._2)).flatMap(_.toCharArray)
      .map(_.toString).toSet
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    val enc = new UnigramEncode.Encoder(vocab.map(v => (v._1, v._2)), "[UNK]")
    val unk = corpus.as[(Long, String)].collect().map { case (_, t) =>
      enc.encode(t).getLong(2)
    }.sum
    assert(unk === 0L)
  }

  test("EM rounds do real work: Viterbi counts reshape the vocab vs the raw seed") {
    val seedOnly = Unigram.train(corpus, "text", emRounds = 0)
    val trained = Unigram.train(corpus, "text", emRounds = 2)
    // the seed keeps frequent substrings that Viterbi segmentation never
    // uses (they overlap longer winners); EM drops them
    assert(trained.size < seedOnly.size,
      s"EM should drop unused pieces (seed ${seedOnly.size}, trained ${trained.size})")
    // and the surviving pieces' scores moved (counts re-estimated)
    val seedScores = seedOnly.map(v => v._1 -> v._2).toMap
    assert(trained.exists(v => seedScores.get(v._1).exists(_ != v._2)))
  }

  test("prune caps multi-char pieces at vocabSize − #chars; chars survive any cap") {
    val tiny = Unigram.train(corpus, "text", vocabSize = 1)
    // vocabSize 1 < #chars: every char still present, no multis
    assert(tiny.forall(_._1.length == 1))
    val chars = tiny.map(_._1).toSet
    val bigger = Unigram.train(corpus, "text", vocabSize = chars.size + 3)
    assert(bigger.count(_._1.length > 1) <= 3)
    assert(chars.subsetOf(bigger.map(_._1).toSet))
  }

  test("degenerate corpora: empty text and no-letter text train to empty vocabs") {
    assert(Unigram.train(docs(""), "text").isEmpty)
    assert(Unigram.train(docs("12345 !!! 999"), "text").isEmpty)
    // single word corpus still trains (chars + its substrings)
    val one = Unigram.train(docs("aaa aaa aaa"), "text", minCount = 1)
    assert(one.exists(_._1 == "a"))
    assert(one.exists(_._1 == "aaa"))
  }
}
