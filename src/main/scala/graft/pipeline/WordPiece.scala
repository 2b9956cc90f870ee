package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece vocabulary TRAINING — the likelihood-scored merge variant
  * (Schuster & Nakajima 2012 as adopted by BERT; the algorithm commonly
  * described as "BPE with a likelihood objective"): like [[Bpe]]'s
  * trainer, words are symbol sequences merged bottom-up, but each
  * iteration picks the pair maximizing
  *
  *   score(x, y) = count(x·y) / (count(x) · count(y))
  *
  * — the pair whose merge most improves a unigram LM over the symbol
  * stream — instead of the raw pair count. Merging respects the `##`
  * continuation convention: a word's first symbol is bare, the rest are
  * `##`-marked, and merge(x, ##y) = x·y (continuation content splices,
  * markers stay positional), so every learned symbol is directly a
  * [[graft.functions.WordPieceEncode]] vocabulary entry.
  *
  * Determinism contract: argmax by (score DESC, pair-count DESC,
  * x ASC, y ASC). Scores are IEEE-double ratios of exact long counts —
  * identical inputs give identical doubles on any JVM, and the
  * pair-count tiebreak catches the equal-ratio cases that matter
  * (spec-pinned). Stop when no pair reaches `minPairCount` or
  * `maxMerges` is hit.
  *
  * Output vocabulary = every single-char symbol of the training words
  * (bare + `##` forms — full coverage, so the trained model never emits
  * `[UNK]` on its own corpus) followed by the merged symbols in learned
  * order. Feed it straight to `WordPieceEncode`.
  *
  * Scale shape: the [[Bpe.trainMerges]] pattern — ONE distributed
  * word-count aggregation + top-`vocabCap` selection, then a driver
  * loop over the capped vocab. [[train]] is the oracle-replayable
  * rescan form the gate runs; [[trainIndexed]] is the delta-update form
  * for 16k+ merge vocabularies (output spec-pinned identical).
  */
object WordPiece {

  private def strip(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** merge(x, y): continuation content splices; the result carries x's
    * position marker (bare if word-initial, `##` otherwise).
    */
  private[pipeline] def mergeSym(x: String, y: String): String = x + strip(y)

  /** One left-to-right pass merging (x, y) occurrences with the SQL
    * nested-replace resume semantics (the [[Bpe]] mergePass shape): a
    * chr(1)-delimited replace() resumes scanning AFTER the replaced
    * segment's trailing delimiter, so the symbol following a merge can
    * never START the next match in the same pass — mirrored here by
    * emitting it verbatim (`i += 3`). The fixpoint loop then equals the
    * oracle's 16 nested replaces exactly; null when nothing merged.
    */
  private def mergePass(toks: Array[String], x: String, y: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    var changed = false
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out += mergeSym(x, y)
        if (i + 2 < toks.length) out += toks(i + 2)
        i += 3
        changed = true
      } else {
        out += toks(i)
        i += 1
      }
    }
    if (changed) out.toArray else null
  }

  private[pipeline] def applyRule(toks: Array[String], x: String, y: String): Array[String] = {
    var cur = toks
    var next = mergePass(cur, x, y)
    while (next != null) { cur = next; next = mergePass(cur, x, y) }
    cur
  }

  private def toSymbols(w: String): Array[String] =
    Array.tabulate(w.length)(i =>
      if (i == 0) w.substring(0, 1) else "##" + w.substring(i, i + 1))

  /** Train a WordPiece vocabulary; returns entries ready for
    * `WordPieceEncode` (chars first — bare then `##` forms, each sorted —
    * then merged symbols in learned order).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      vocabCap: Int = 2048,
      maxMerges: Int = 48,
      minPairCount: Long = 2L): Seq[String] = {
    require(vocabCap > 0 && maxMerges >= 0 && minPairCount >= 1)
    val vocab = docs
      .select(explode(Bpe.wordsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val seqs: Array[Array[String]] = vocab.map(v => toSymbols(v._1))
    val counts = vocab.map(_._2)

    val alphabet = scala.collection.SortedSet.empty[String] ++
      seqs.iterator.flatten
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var stop = false
    while (!stop && merges.length < maxMerges) {
      // rescan: symbol occurrence counts + adjacent pair counts
      val symCount = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var j = 0
      while (j < seqs.length) {
        val t = seqs(j)
        val c = counts(j)
        var i = 0
        while (i < t.length) {
          symCount.update(t(i), symCount.getOrElse(t(i), 0L) + c)
          if (i + 1 < t.length) {
            val k = (t(i), t(i + 1))
            pairCount.update(k, pairCount.getOrElse(k, 0L) + c)
          }
          i += 1
        }
        j += 1
      }
      val eligible = pairCount.iterator.filter(_._2 >= minPairCount)
      if (!eligible.hasNext) stop = true
      else {
        var best: ((String, String), Long) = null
        var bestScore = 0.0
        eligible.foreach { e =>
          val s = e._2.toDouble / (symCount(e._1._1).toDouble * symCount(e._1._2).toDouble)
          val better = best == null || s > bestScore ||
            (s == bestScore && (e._2 > best._2 ||
              (e._2 == best._2 && (e._1._1 < best._1._1 ||
                (e._1._1 == best._1._1 && e._1._2 < best._1._2)))))
          if (better) { best = e; bestScore = s }
        }
        val (x, y) = best._1
        merges += mergeSym(x, y)
        var k = 0
        while (k < seqs.length) { seqs(k) = applyRule(seqs(k), x, y); k += 1 }
      }
    }
    alphabet.toSeq ++ merges.toSeq
  }

  /** The INDEXED trainer (VERDICT r18 #6) — [[Bpe.trainMergesIndexed]]'s
    * TreeSet-argmax + delta-update bookkeeping ported to the
    * LIKELIHOOD-RATIO argmax, so 16k+ merge WordPiece vocabularies train
    * at the BPE trainer's speed instead of rescanning the whole capped
    * vocab per merge. Output is IDENTICAL to [[train]] (spec-pinned on
    * the gate corpus and on a Zipf pseudo-corpus at 2k+ merges); the
    * gate itself stays on the oracle-replayable rescan form.
    *
    * The likelihood score c(xy)/(c(x)·c(y)) differs from BPE's raw count
    * in one structural way: it depends on SYMBOL counts, which a merge
    * changes — so beyond the pairs whose counts were delta'd in affected
    * words, every surviving pair CONTAINING a count-changed symbol must
    * be re-scored. A symbol→pairs index (`symPairs`) makes that set
    * exact; scores are recomputed with the same double expression as the
    * rescan (ratio of exact longs — bit-identical argmax, same
    * (score DESC, count DESC, x, y) tiebreak).
    */
  def trainIndexed(
      docs: DataFrame,
      textCol: String,
      vocabCap: Int = 2048,
      maxMerges: Int = 48,
      minPairCount: Long = 2L): Seq[String] = {
    require(vocabCap > 0 && maxMerges >= 0 && minPairCount >= 1)
    val vocab = docs
      .select(explode(Bpe.wordsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val seqs: Array[Array[String]] = vocab.map(v => toSymbols(v._1))
    val counts = vocab.map(_._2)
    val alphabet = scala.collection.SortedSet.empty[String] ++ seqs.iterator.flatten

    val symCount = scala.collection.mutable.HashMap.empty[String, Long]
    val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val pairWords = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    val symPairs = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.HashSet[(String, String)]]
    def adjacencies(t: Array[String]): Iterator[(String, String)] =
      (0 until t.length - 1).iterator.map(i => (t(i), t(i + 1)))

    def applyPairDelta(k: (String, String), delta: Long): Unit = {
      val old = pairCount.getOrElse(k, 0L)
      val nw = old + delta
      if (nw > 0) {
        pairCount(k) = nw
        if (old == 0) {
          symPairs.getOrElseUpdate(k._1, scala.collection.mutable.HashSet.empty) += k
          symPairs.getOrElseUpdate(k._2, scala.collection.mutable.HashSet.empty) += k
        }
      } else {
        pairCount.remove(k)
        pairWords.remove(k)
        if (old > 0) {
          symPairs.get(k._1).foreach(_ -= k)
          symPairs.get(k._2).foreach(_ -= k)
        }
      }
    }

    var j = 0
    while (j < seqs.length) {
      val c = counts(j)
      seqs(j).foreach(s => symCount.update(s, symCount.getOrElse(s, 0L) + c))
      adjacencies(seqs(j)).foreach { k =>
        applyPairDelta(k, c)
        pairWords.getOrElseUpdate(k, scala.collection.mutable.HashSet.empty) += j
      }
      j += 1
    }

    // (score DESC, count DESC, x ASC, y ASC): head() IS the rescan argmax
    implicit val ord: Ordering[(Double, Long, String, String)] =
      Ordering.Tuple4(
        Ordering.Double.TotalOrdering.reverse, Ordering.Long.reverse,
        Ordering.String, Ordering.String)
    val sorted = scala.collection.mutable.TreeSet.empty[(Double, Long, String, String)]
    val entry = scala.collection.mutable.HashMap.empty[(String, String), (Double, Long)]

    // the rescan's exact double expression — bit-identical scores
    def scoreOf(k: (String, String), c: Long): Double =
      c.toDouble / (symCount(k._1).toDouble * symCount(k._2).toDouble)

    def refresh(k: (String, String)): Unit = {
      entry.remove(k).foreach { case (s, c) => sorted -= ((s, c, k._1, k._2)) }
      val c = pairCount.getOrElse(k, 0L)
      if (c >= minPairCount) {
        val s = scoreOf(k, c)
        sorted += ((s, c, k._1, k._2))
        entry(k) = (s, c)
      }
    }
    pairCount.keysIterator.toArray.foreach(refresh)

    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var stop = false
    while (!stop && merges.length < maxMerges) {
      if (sorted.isEmpty) stop = true
      else {
        val (_, _, x, y) = sorted.head
        merges += mergeSym(x, y)
        val pair = (x, y)
        val dirty = scala.collection.mutable.HashSet.empty[(String, String)]
        val changedSyms = scala.collection.mutable.HashSet.empty[String]
        val affected = pairWords.get(pair).map(_.toArray).getOrElse(Array.empty)
        var a = 0
        while (a < affected.length) {
          val idx = affected(a)
          val before = seqs(idx)
          val after = applyRule(before, x, y)
          if (after ne before) {
            val c = counts(idx)
            // net pair deltas for this word (transient zero-sum churn on
            // unrelated pairs stays out of the dirty set)
            val pd = scala.collection.mutable.HashMap.empty[(String, String), Long]
            adjacencies(before).foreach(k => pd.update(k, pd.getOrElse(k, 0L) - c))
            adjacencies(after).foreach(k => pd.update(k, pd.getOrElse(k, 0L) + c))
            adjacencies(after).foreach(k =>
              pairWords.getOrElseUpdate(k, scala.collection.mutable.HashSet.empty) += idx)
            pd.foreach { case (k, d) =>
              if (d != 0L) { applyPairDelta(k, d); dirty += k }
            }
            val sd = scala.collection.mutable.HashMap.empty[String, Long]
            before.foreach(s => sd.update(s, sd.getOrElse(s, 0L) - c))
            after.foreach(s => sd.update(s, sd.getOrElse(s, 0L) + c))
            sd.foreach { case (s, d) =>
              if (d != 0L) {
                val nw = symCount.getOrElse(s, 0L) + d
                if (nw > 0) symCount(s) = nw else symCount.remove(s)
                changedSyms += s
              }
            }
            seqs(idx) = after
          }
          a += 1
        }
        // every surviving pair containing a count-changed symbol is
        // re-scored — the likelihood ratio moved even where the pair
        // count did not
        changedSyms.foreach(s => symPairs.get(s).foreach(dirty ++= _))
        dirty.foreach(refresh)
        // defensively force-drop the merged pair (its deltas drove it to
        // zero; an accounting bug must never re-pick the same head)
        pairWords.remove(pair)
        pairCount.remove(pair)
        entry.remove(pair).foreach { case (s, c) => sorted -= ((s, c, x, y)) }
        symPairs.get(x).foreach(_ -= pair)
        symPairs.get(y).foreach(_ -= pair)
      }
    }
    alphabet.toSeq ++ merges.toSeq
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle replay: the [[Bpe]] trainChain machinery with the
  // WordPiece differences — symbol state carries `##` markers, each
  // layer also aggregates SYMBOL counts, and the argmax is the
  // likelihood ratio c(xy)/(c(x)·c(y)) as an IEEE-double division of
  // exact longs (identical arithmetic both engines), ties (score DESC,
  // count DESC, x, y). The oracle RE-TRAINS; nothing is inlined.
  // ---------------------------------------------------------------------

  private def nestedReplace(passes: Int): String =
    (1 to passes).foldLeft("seq")((acc, _) => s"replace($acc, b.pat, b.rep)")

  /** Oracle for `q_wordpiece_vocab`: (vrank, entry) — the alphabet of
    * the training words (sorted) followed by merges in learned order.
    */
  def oracleSqlVocab(table: String, vocabCap: Int, maxMerges: Int,
      minPairCount: Long): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS MATERIALIZED (
         |  SELECT unnest(regexp_extract_all(translate(text, '${Bpe.Upper}', '${Bpe.Lower}'), '${Bpe.WordRegex}')) AS word
         |  FROM $table
         |), v0 AS (
         |  SELECT word, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, word ASC) <= $vocabCap AS in_train,
         |    chr(1) || substr(word, 1, 1) || chr(1) ||
         |      CASE WHEN length(word) > 1
         |           THEN regexp_replace(substr(word, 2), '(.)', '##\\1' || chr(1), 'g')
         |           ELSE '' END AS seq
         |  FROM (SELECT word, count(*) AS cnt FROM w0 GROUP BY word)
         |)""".stripMargin)
    for (k <- 0 until maxMerges) {
      sb.append(
        s""", t$k AS MATERIALIZED (
           |  SELECT *, list_filter(string_split(seq, chr(1)), s -> s <> '') AS toks FROM v$k
           |), s$k AS MATERIALIZED (
           |  SELECT sym, sum(cnt) AS c FROM (
           |    SELECT cnt, unnest(toks) AS sym FROM t$k WHERE in_train)
           |  GROUP BY 1
           |), p$k AS (
           |  SELECT pr[1] AS x, pr[2] AS y, sum(cnt) AS c FROM (
           |    SELECT cnt, unnest(list_transform(range(0, len(toks) - 1),
           |      i -> [toks[CAST(i + 1 AS INTEGER)], toks[CAST(i + 2 AS INTEGER)]])) AS pr
           |    FROM t$k WHERE in_train)
           |  GROUP BY 1, 2 HAVING sum(cnt) >= $minPairCount
           |), b$k AS (
           |  SELECT x, y,
           |    chr(1) || x || chr(1) || y || chr(1) AS pat,
           |    chr(1) || x || CASE WHEN y LIKE '##%' THEN substr(y, 3) ELSE y END || chr(1) AS rep,
           |    x || CASE WHEN y LIKE '##%' THEN substr(y, 3) ELSE y END AS sym
           |  FROM (
           |    SELECT p.x, p.y, p.c,
           |      CAST(p.c AS DOUBLE) / (CAST(sx.c AS DOUBLE) * CAST(sy.c AS DOUBLE)) AS score
           |    FROM p$k p JOIN s$k sx ON p.x = sx.sym JOIN s$k sy ON p.y = sy.sym)
           |  ORDER BY score DESC, c DESC, x ASC, y ASC LIMIT 1
           |), v${k + 1} AS (
           |  SELECT word, cnt, in_train,
           |    CASE WHEN b.pat IS NULL THEN seq ELSE ${nestedReplace(16)} END AS seq
           |  FROM t$k LEFT JOIN b$k b ON TRUE
           |)""".stripMargin)
    }
    val mergeRows = (0 until maxMerges)
      .map(k => s"SELECT ${k + 1} AS ord, sym FROM b$k")
      .mkString("\n  UNION ALL ")
    sb.append(
      s""", alpha AS (
         |  SELECT DISTINCT sym FROM (SELECT unnest(toks) AS sym FROM t0 WHERE in_train)
         |)
         |SELECT CAST(row_number() OVER (ORDER BY ord, sym) AS BIGINT) AS vrank,
         |       sym AS entry
         |FROM (
         |  SELECT 0 AS ord, sym FROM alpha
         |  UNION ALL $mergeRows
         |)
         |ORDER BY vrank""".stripMargin)
    sb.toString
  }
}
