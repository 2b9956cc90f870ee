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

  test("soft EM keeps fractional mass on pieces Viterbi starves to zero (the divergence case)") {
    // corpus of the single word "abc": with maxPieceLen 2 the seed is
    // {a, b, c, ab, bc}, all count N, so the two 2-piece segmentations
    // [ab, c] and [a, bc] tie. Viterbi awards the whole count to ONE of
    // them and the loser's piece is pruned at the M-step; soft EM's
    // posteriors split the mass, so BOTH survive with positive counts.
    val d = docs(Seq.fill(6)("abc").mkString(" "))
    val hard = Unigram.train(d, "text",
      maxPieceLen = 2, seedSize = 50, minCount = 1, vocabSize = 50, emRounds = 1)
    val soft = Unigram.trainSoft(d, "text",
      maxPieceLen = 2, seedSize = 50, minCount = 1, vocabSize = 50, emRounds = 1)
    val hardMultis = hard.map(_._1).filter(_.length > 1).toSet
    val softMultis = soft.map(_._1).filter(_.length > 1).toSet
    assert(hardMultis.size === 1 && (hardMultis == Set("ab") || hardMultis == Set("bc")),
      s"Viterbi must keep exactly one of ab/bc, got $hardMultis")
    assert(softMultis === Set("ab", "bc"),
      s"soft EM must keep BOTH ambiguous pieces, got $softMultis")
    // the posterior split is an honest share, not a floor artifact
    val softAb = soft.find(_._1 == "ab").get._3
    val softBc = soft.find(_._1 == "bc").get._3
    assert(softAb > 0.5 && softBc > 0.5, s"fractional masses: ab=$softAb bc=$softBc")
  }

  test("soft EM coincides with Viterbi EM when every segmentation is unique") {
    // minCount high enough that NO multi-char piece seeds: every word
    // segments char-by-char with posterior 1 — expected counts equal the
    // hard counts exactly and both trainers produce the same vocab
    val hard = Unigram.train(corpus, "text",
      maxPieceLen = 3, seedSize = 120, minCount = 1000, vocabSize = 60, emRounds = 2)
    val soft = Unigram.trainSoft(corpus, "text",
      maxPieceLen = 3, seedSize = 120, minCount = 1000, vocabSize = 60, emRounds = 2)
    // counts are doubles built from exp(α+lp+β−αN) — exactly-1
    // posteriors up to ulp accumulation order, so equal-count TIE ORDER
    // can shuffle; content and scores must coincide exactly
    assert(hard.map(v => (v._1, v._2)).toMap === soft.map(v => (v._1, v._2)).toMap)
    val hardC = hard.map(v => v._1 -> v._3).toMap
    soft.foreach { case (p, _, cs) =>
      assert(math.abs(cs - hardC(p)) < 1e-6, s"$p: soft $cs vs hard ${hardC(p)}")
    }
  }

  test("expectedCounts: posteriors sum to the lattice occupancy and split ties evenly") {
    val logp = Map("a" -> math.log(0.2), "b" -> math.log(0.2), "c" -> math.log(0.2),
      "ab" -> math.log(0.2), "bc" -> math.log(0.2))
    val e = Unigram.expectedCounts("abc", logp, 2)
    // three segmentations: [a,b,c] p^3, [ab,c] p^2, [a,bc] p^2 with
    // p = 0.2 → weights 0.008, 0.04, 0.04 → posterior of ab = bc =
    // 0.04/0.088; a appears in [a,b,c] and [a,bc] → (0.008+0.04)/0.088
    val z = 0.008 + 0.04 + 0.04
    assert(math.abs(e("ab") - 0.04 / z) < 1e-12)
    assert(math.abs(e("bc") - 0.04 / z) < 1e-12)
    assert(math.abs(e("a") - (0.008 + 0.04) / z) < 1e-12)
    assert(math.abs(e("c") - (0.008 + 0.04) / z) < 1e-12)
    assert(math.abs(e("b") - 0.008 / z) < 1e-12)
    // uncoverable word → empty
    assert(Unigram.expectedCounts("xyz", logp, 2).isEmpty)
  }
}
