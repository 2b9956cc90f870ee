package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.WordPieceEncode

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = WordPieceEncode.GateVocab

  private def enc(text: String, v: Seq[String] = vocab): Row =
    Seq(Tuple1(text)).toDF("t")
      .select(WordPieceEncode(col("t"), v).as("w")).select("w.*").head()

  test("greedy longest-match-first with ## continuations") {
    // "hashing" → hash + ##in + ##g (longest stem wins over h-a-s-h…)
    assert(enc("hashing").getString(3) == "hash ##in ##g")
    // "customer" → cust + ##omer (the longest continuation wins over ##o…)
    assert(enc("customer").getString(3) == "cust ##omer")
    // "column" → col + ##umn
    assert(enc("column").getString(3) == "col ##umn")
    // initial-only entries never match mid-word: "rowrow" → ro + ##w + ...
    // ("ro"/"row" have no ## twins, so the second 'row' spells out)
    assert(enc("rowrow").getString(3) == "ro ##w ##r ##o ##w")
    // counts: 2 words, tokens summed, no unks
    val r = enc("hash join")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.getString(3) == "hash join")
  }

  test("greedy is NOT optimal: longest-first can force more tokens") {
    // vocab {ab, abc, cd, ##cd, ##d}: "abcd" greedy takes abc (longest),
    // leaving d → abc ##d; optimal ab+##cd also exists — greedy ignores it
    val v = Seq("ab", "abc", "cd", "##cd", "##d")
    assert(enc("abcd", v).getString(3) == "abc ##d")
  }

  test("whole-word UNK on any positional miss") {
    // 'q' has no vocab entry (by design): q-bearing words collapse to [UNK]
    val r = enc("quick scan")
    assert(r.getString(3) == "[UNK] scan")
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
    // a mid-word miss also UNKs the whole word, not a suffix
    assert(enc("scanq").getString(3) == "[UNK]")
    // miss at the FIRST position (no initial entry): continuation-only
    // vocab can never start a word
    assert(enc("e", Seq("##e")).getString(3) == "[UNK]")
  }

  test("word stream is shared with BPE (lowercase [a-z]{1,24} runs)") {
    val r = enc("Hash JOIN, 42 columns!")
    // "Hash"→hash, "JOIN"→join, "columns"→col ##umn ##s; digits/punct split
    assert(r.getLong(0) == 3L)
    assert(r.getString(3) == "hash join col ##umn ##s")
    // empty text → zero words, empty stream
    val e = enc("")
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.getString(3) == "")
  }

  test("expression equals a reference recursive segmenter on the corpus vocabulary") {
    // independent witness: straightforward recursive greedy (no cache, no
    // per-length sets) — pins the Encoder's probe loop
    def refSegment(word: String): Seq[String] = {
      def go(pos: Int, acc: List[String]): Seq[String] =
        if (pos >= word.length) acc.reverse
        else {
          val cands = vocab.filter { v =>
            if (pos == 0) !v.startsWith("##") && word.startsWith(v, 0)
            else v.startsWith("##") && word.startsWith(v.substring(2), pos)
          }
          if (cands.isEmpty) Seq("[UNK]")
          else {
            val best = cands.maxBy(v => if (v.startsWith("##")) v.length - 2 else v.length)
            val len = if (best.startsWith("##")) best.length - 2 else best.length
            go(pos + len, best :: acc)
          }
        }
      go(0, Nil)
    }
    val words = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(explode(graft.pipeline.Bpe.wordsCol(col("text"))).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    val got = Seq.tabulate(words.length)(i => (i.toLong, words(i)))
      .toDF("id", "t")
      .select(col("t"), WordPieceEncode(col("t"), vocab).as("w"))
      .collect().map(r => r.getString(0) -> r.getStruct(1).getString(3)).toMap
    for (w <- words)
      assert(got(w) == refSegment(w).mkString(" "), s"word '$w' diverged")
  }
}
