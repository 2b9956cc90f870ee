package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{MinHashSignatureMd5, WinnowFingerprint}

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fp(text: String, n: Int = 3, w: Int = 4): Row =
    Seq(Tuple1(text)).toDF("t")
      .select(WinnowFingerprint(col("t"), n, w).as("f")).select("f.*").head()

  /** Brute-force witness: every window scanned independently, rightmost
    * minimum by explicit comparison, distinct (hash,pos) kept in order.
    */
  private def reference(text: String, n: Int, w: Int): (Long, Long, String) = {
    // same tokenizer semantics via Java split with limit -1 (the pinned
    // Tokenize parity: trim 0x20 only, keep leading/trailing empties)
    val toks = {
      val trimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      if (trimmed.isEmpty) Array("") else trimmed.split("\\s+", -1)
    }
    val g = toks.length - n + 1
    if (g <= 0) return (0L, 0L, "")
    val h = Array.tabulate(g)(i =>
      MinHashSignatureMd5.md5Base60(toks.slice(i, i + n).mkString(" ")))
    val nw = math.max(g - w + 1, 1)
    val sel = (0 until nw).map { p =>
      val end = math.min(p + w, g)
      var best = p
      var i = p + 1
      while (i < end) { if (h(i) <= h(best)) best = i; i += 1 } // <= → rightmost
      best
    }.distinct
    (g.toLong, sel.length.toLong,
      sel.map(i => s"${h(i)}:${i + 1}").mkString(" "))
  }

  test("expression equals the brute-force window scan on the corpus") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text")).limit(300).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    val got = docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFingerprint(col("text"), 3, 4).as("f"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1), r.getStruct(1).getString(2)))
      .toMap
    for ((id, text) <- docs)
      assert(got(id) == reference(text, 3, 4), s"doc $id diverged")
  }

  test("edges: short docs, single window, empty text") {
    // fewer grams than w → ONE window over all grams
    val r = fp("a b c d") // 2 trigrams, w=4 → one window, one fingerprint
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(r.getString(2) == reference("a b c d", 3, 4)._3)
    // exactly one gram
    val r1 = fp("a b c")
    assert(r1.getLong(0) == 1L && r1.getLong(1) == 1L)
    // fewer tokens than n → no grams, empty stream
    val r2 = fp("a b")
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 0L && r2.getString(2) == "")
    assert(fp("").getLong(0) == 0L)
  }

  test("fp_hashes is the sorted distinct hash set of fp_stream (the r19 pair-miner field)") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(col("text")).limit(200).collect().map(_.getString(0)) ++
      Seq("", "a b", "a b c", "x x x x x x x x x x", " padded  run of words here ")
    docs.foreach { t =>
      val r = fp(t)
      val parsed = r.getString(2).split(" ").filter(_.nonEmpty)
        .map(_.split(":")(0).toLong).distinct.sorted.toSeq
      assert(r.getSeq[Long](3) == parsed, s"fp_hashes diverged on '${t.take(60)}'")
    }
  }

  test("guarantee: a shared n+w-1 word run yields a shared fingerprint hash") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = 3+4-1 words
    val a = s"one two $shared three four"
    val b = s"nine eight seven $shared six"
    def hashes(t: String) =
      fp(t).getString(2).split(" ").filter(_.nonEmpty).map(_.split(":")(0)).toSet
    assert(hashes(a).intersect(hashes(b)).nonEmpty)
  }

  test("rightmost-minimum tie rule: repeated text selects the newest equal hash") {
    // identical trigrams everywhere → every window's min is its LAST slot
    val r = fp("x x x x x x x x x x") // 8 identical trigram hashes, w=4
    assert(r.getLong(0) == 8L)
    val sels = r.getString(2).split(" ").map(_.split(":")(1).toInt)
    // windows p=1..5 select positions 4,5,6,7,8 (rightmost of each)
    assert(sels.toSeq == Seq(4, 5, 6, 7, 8))
  }

  test("winnowPairs equals a driver brute force (incl. the hot cut and overlap)") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val maxDf = 50L
    val got = graft.pipeline.Dedup.winnowPairs(
        docs, "doc_id", "text", n = 3, w = 4, minShared = 2L, maxDf = Some(maxDf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // brute force from the fused fingerprints
    val fps = docs.select(col("doc_id"),
        graft.functions.WinnowFingerprint(col("text"), 3, 4)
          .getField("fp_stream").as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).map(_.split(":")(0).toLong).toSet)
    val df = fps.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val kept = fps.map { case (id, s) => id -> s.filter(h => df(h) <= maxDf) }
    val exp = (for {
      i <- kept.indices; j <- (i + 1) until kept.length
      (ia, sa) = kept(i); (ib, sb) = kept(j)
      shared = (sa & sb).size.toLong
      if shared >= 2
      (a, b) = if (ia < ib) (ia, ib) else (ib, ia)
    } yield (a, b) -> (shared, shared.toDouble / math.min(sa.size, sb.size))).toMap
    assert(got.keySet == exp.keySet,
      s"pair sets differ: extra=${got.keySet -- exp.keySet}, missing=${exp.keySet -- got.keySet}")
    for ((k, v) <- exp) assert(got(k) == v, s"pair $k")
    assert(exp.nonEmpty, "the corpus must actually produce pairs")
  }

  test("SQL registration works") {
    graft.functions.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT winnow_fingerprint('a b c d e f g', 3, 4).n_grams AS g").head()
    assert(out.getLong(0) == 5L)
  }
}
