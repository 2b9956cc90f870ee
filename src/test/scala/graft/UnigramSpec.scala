package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{UnigramEncode, WordPieceEncode}

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, v: Seq[(String, Long)] = UnigramEncode.GateVocab): Row =
    Seq(Tuple1(text)).toDF("t")
      .select(UnigramEncode(col("t"), v).as("u")).select("u.*").head()

  test("Viterbi picks the globally best path, not the greedy one") {
    // vocab where greedy longest-first is SUBOPTIMAL: "abc" as one piece
    // costs −100; ab+c costs −20 — unigram must take the split
    val v = Seq("abc" -> -100L, "ab" -> -10L, "c" -> -10L,
      "a" -> -10L, "b" -> -10L)
    assert(enc("abc", v).getString(3) == "ab c")
    // the greedy tokenizer (WordPiece with the same pieces) takes "abc"
    val wp = Seq(Tuple1("abc")).toDF("t")
      .select(WordPieceEncode(col("t"),
        Seq("abc", "ab", "a", "b", "##c", "##b")).as("w"))
      .select("w.*").head()
    assert(wp.getString(3) == "abc") // greedy ≠ Viterbi, pinned
  }

  test("gate vocab: stems beat spelled-out paths; three-way 'join' choice") {
    // join: join(−5.5e6) vs jo+in(−7.5e6) vs j+oin(−8.3e6) vs chars(−16e6)
    assert(enc("join").getString(3) == "join")
    // column: col(−5.0e6)+umn(−5.1e6) = −10.1e6 beats chars (−24e6)
    assert(enc("column").getString(3) == "col umn")
    // joiner: join+er (−5.5−3.5=−9.0e6) vs jo+in+er (−11.0e6) → join er
    assert(enc("joiner").getString(3) == "join er")
    val r = enc("data order")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 0L)
  }

  test("tie-break: equal totals prefer the longer last piece (smaller start)") {
    // two exact-tie paths for "xy": x+y (−4−4) vs the piece xy (−8):
    // smaller start j (the longer piece "xy") must win
    val v = Seq("xy" -> -8L, "x" -> -4L, "y" -> -4L)
    assert(enc("xy", v).getString(3) == "xy")
  }

  test("unreachable position → whole-word [UNK]; empty text") {
    val r = enc("quick scan")
    assert(r.getString(3) == "[UNK] scan")
    assert(r.getLong(2) == 1L)
    assert(enc("scanq").getString(3) == "[UNK]")
    val e = enc("")
    assert(e.getLong(0) == 0L && e.getString(3) == "")
  }

  test("expression equals a reference DP on the corpus vocabulary") {
    // independent witness: a straightforward O(len²·|vocab|) DP with the
    // contract's tie rule, no per-length maps, no cache
    val vocab = UnigramEncode.GateVocab
    def ref(word: String): Seq[String] = {
      val len = word.length
      val best = Array.fill[Option[(Long, Int, String)]](len + 1)(None)
      best(0) = Some((0L, 0, ""))
      for (k <- 1 to len) {
        val cands = for {
          (p, s) <- vocab
          j = k - p.length
          if j >= 0 && best(j).isDefined && word.substring(j, k) == p
        } yield (best(j).get._1 + s, j, p)
        if (cands.nonEmpty) {
          // max total, tie → min j, then min piece
          val c = cands.minBy { case (t, j, p) => (-t, j, p) }
          best(k) = Some(c)
        }
      }
      if (best(len).isEmpty) Seq("[UNK]")
      else {
        var pos = len
        var out = List.empty[String]
        while (pos > 0) {
          val (_, j, p) = best(pos).get
          out = p :: out
          pos = j
        }
        out
      }
    }
    val words = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(explode(graft.pipeline.Bpe.wordsCol(col("text"))).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    val got = words.toSeq.toDF("t")
      .select(col("t"), UnigramEncode(col("t"), vocab).as("u"))
      .collect().map(r => r.getString(0) -> r.getStruct(1).getString(3)).toMap
    for (w <- words)
      assert(got(w) == ref(w).mkString(" "), s"word '$w' diverged")
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT unigram_encode('abc', 'abc:-100,ab:-10,c:-10,a:-10,b:-10').segmented AS s")
      .head()
    assert(out.getString(0) == "ab c")
  }
}
