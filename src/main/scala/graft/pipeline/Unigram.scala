package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.UnigramEncode

/** Unigram-LM tokenizer TRAINING (Kudo 2018, the SentencePiece recipe),
  * completing the train side of the third tokenizer family the way
  * [[Bpe]] already has both train and apply:
  *
  *   seed vocabulary → EM rounds → prune to target size,
  *
  * every step defined so the DuckDB oracle can RE-TRAIN it exactly
  * (nothing inlined from the Spark run):
  *
  *   - SEED: all substrings (length 1..`maxPieceLen`) of the corpus
  *     word stream (the shared [[Bpe.words]] tokenizer — all three
  *     families train on the same words), counted per occurrence
  *     weighted by word frequency. Every single character present is
  *     kept unconditionally (full coverage ⇒ no [UNK] during
  *     training); multi-char pieces need `minCount` and the top
  *     `seedSize − #chars` survive by (count DESC, piece ASC).
  *   - EM: `emRounds` rounds of VITERBI EM (hard EM): the E-step
  *     segments each distinct word with the CURRENT model via the same
  *     [[UnigramEncode.Encoder]] the apply expression runs (one
  *     distributed map over the word-count table + one aggregation;
  *     the driver holds only the vocab) and counts piece occurrences
  *     weighted by word frequency; the M-step drops multi-char pieces
  *     with zero count, floors surviving characters at count 1, and
  *     rescores. Kudo's soft EM computes forward-backward posteriors —
  *     implemented as [[trainSoft]] and spec-compared to this form on a
  *     corpus where they provably differ (UnigramTrainSpec); the
  *     Viterbi variant stays the ORACLE-GATED form because it keeps
  *     every quantity an exact integer, which is what makes the DuckDB
  *     replay possible — the divergence is scoped AND exercised, not
  *     hidden.
  *   - SCORES: integer quantized log-probs, the established q9 recipe —
  *     score(p) = q9(ln(c_p)) − q9(ln(Σc)) with q9(x) = ⌊x·1e9 + 0.5⌋
  *     (platform `Math.log` on both engines; see
  *     [[graft.functions.PlatformLn]] for the libm-parity rationale).
  *     Same-count pieces get the same score, so every downstream order
  *     is (count DESC, piece ASC) — deterministic.
  *   - PRUNE: after the EM rounds keep all single chars + the top
  *     `vocabSize − #chars` multi-char pieces by final count, rescore
  *     over the kept set. (SentencePiece prunes by likelihood loss in
  *     ~25% steps; count pruning is the single-step variant, scoped.)
  *
  * Scale shape: training is `emRounds + 1` distributed passes over the
  * WORD-COUNT table (itself one map-side-combined aggregation of the
  * corpus) plus top-k selections — the BPE-trainer pattern. The driver
  * never holds more than the seed vocabulary.
  */
object Unigram {

  /** Gate-scale defaults: small enough that the oracle's 2×(24+24)
    * unrolled Viterbi layers replay in DuckDB in seconds, large enough
    * that seeding, both EM rounds and the prune all do real work.
    */
  val GateMaxPieceLen = 4
  val GateSeedSize = 120
  val GateMinCount = 2L
  val GateVocabSize = 60
  val GateEmRounds = 2

  private def q9ln(x: Long): Long =
    math.floor(Math.log(x.toDouble) * 1e9 + 0.5).toLong

  /** Rescore a (piece, count) table: q9(ln c) − q9(ln Σc). */
  private def rescore(pieces: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val total = pieces.iterator.map(_._2).sum
    val qTotal = q9ln(total)
    pieces.map { case (p, c) => (p, q9ln(c) - qTotal, c) }
  }

  /** Train a unigram model on `docs(textCol)`. Returns the final vocab
    * as (piece, score, count), ordered (count DESC, piece ASC) — rank
    * order IS the gate's `vrank`.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = GateMaxPieceLen,
      seedSize: Int = GateSeedSize,
      minCount: Long = GateMinCount,
      vocabSize: Int = GateVocabSize,
      emRounds: Int = GateEmRounds): Seq[(String, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxPieceLen >= 1 && seedSize >= 1 && vocabSize >= 1 && emRounds >= 0)

    val wc = docs
      .select(explode(Bpe.wordsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .cache()
    try {
      // ---- seed: substring occurrence counts, weighted by word count
      val subs = wc
        .flatMap { case (w, c) =>
          for {
            st <- 0 until w.length
            l <- 1 to math.min(maxPieceLen, w.length - st)
          } yield (w.substring(st, st + l), c)
        }
        .toDF("piece", "c")
        .groupBy("piece").agg(sum("c").as("c"))
      val chars = subs.where(length(col("piece")) === 1)
        .as[(String, Long)].collect().sortBy(_._1)
      // distributed top-k (TakeOrderedAndProject), never a full collect
      val multis = subs
        .where(length(col("piece")) > 1 && col("c") >= minCount)
        .orderBy(col("c").desc, col("piece").asc)
        .limit(math.max(0, seedSize - chars.length))
        .as[(String, Long)].collect()
      var vocab: Seq[(String, Long, Long)] = rescore((chars ++ multis).toSeq)
      if (vocab.isEmpty) return Seq.empty // no letters anywhere in the corpus

      // ---- EM rounds: distributed Viterbi E-step, driver M-step
      var round = 0
      while (round < emRounds) {
        val enc = new UnigramEncode.Encoder(vocab.map(v => (v._1, v._2)), "[UNK]")
        val counts: Map[String, Long] = wc
          .mapPartitions(_.flatMap { case (w, c) =>
            val toks = enc.segmentWord(w)
            if (toks.length == 1 && toks(0) == "[UNK]") Iterator.empty
            else toks.iterator.map(p => (p, c))
          })
          .toDF("piece", "c")
          .groupBy("piece").agg(sum("c").as("c"))
          .as[(String, Long)].collect().toMap
        val next = vocab.flatMap { case (p, _, _) =>
          val c = counts.getOrElse(p, 0L)
          if (p.length == 1) Some((p, math.max(c, 1L)))
          else if (c > 0) Some((p, c))
          else None
        }
        vocab = rescore(next)
        round += 1
      }

      // ---- prune to target + final rescore
      val (cs, ms) = vocab.partition(_._1.length == 1)
      val keptMultis = ms
        .sortBy(v => (-v._3, v._1))
        .take(math.max(0, vocabSize - cs.length))
      rescore((cs ++ keptMultis).map(v => (v._1, v._3)))
        .sortBy(v => (-v._3, v._1))
    } finally wc.unpersist()
  }

  /** SOFT-EM training (Kudo's actual E-step): forward-backward
    * POSTERIOR expected counts instead of the Viterbi variant's hard
    * assignments — this closes the documented scoped divergence (the
    * scaladoc above) at SPEC level. The E-step computes, per distinct
    * word, α/β lattice sums in log space and credits every vocabulary
    * piece its posterior occupancy × word frequency; the M-step drops
    * multi-char pieces whose expected count vanishes (< 1e-9), floors
    * characters at 1.0, and rescores with the same q9 recipe on the
    * (now fractional) counts. Where every word has a UNIQUE
    * segmentation the posteriors are 1 and this coincides with
    * [[train]] exactly; where segmentations are ambiguous it keeps
    * fractional mass on pieces Viterbi starves to zero — the
    * spec-pinned divergence (UnigramTrainSpec). The ORACLE-GATED form
    * stays [[train]]: integer counts are what make the DuckDB replay
    * exact.
    *
    * Same scale shape: `emRounds` distributed passes over the
    * word-count aggregate; the driver holds only the vocab.
    */
  def trainSoft(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = GateMaxPieceLen,
      seedSize: Int = GateSeedSize,
      minCount: Long = GateMinCount,
      vocabSize: Int = GateVocabSize,
      emRounds: Int = GateEmRounds): Seq[(String, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxPieceLen >= 1 && seedSize >= 1 && vocabSize >= 1 && emRounds >= 0)

    def rescoreD(pieces: Seq[(String, Double)]): Seq[(String, Long, Double)] = {
      val total = pieces.iterator.map(_._2).sum
      def q9(x: Double) = math.floor(Math.log(x) * 1e9 + 0.5).toLong
      val qTotal = q9(total)
      pieces.map { case (p, c) => (p, q9(c) - qTotal, c) }
    }

    val wc = docs
      .select(explode(Bpe.wordsCol(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .cache()
    try {
      val subs = wc
        .flatMap { case (w, c) =>
          for {
            st <- 0 until w.length
            l <- 1 to math.min(maxPieceLen, w.length - st)
          } yield (w.substring(st, st + l), c)
        }
        .toDF("piece", "c")
        .groupBy("piece").agg(sum("c").as("c"))
      val chars = subs.where(length(col("piece")) === 1)
        .as[(String, Long)].collect().sortBy(_._1)
      val multis = subs
        .where(length(col("piece")) > 1 && col("c") >= minCount)
        .orderBy(col("c").desc, col("piece").asc)
        .limit(math.max(0, seedSize - chars.length))
        .as[(String, Long)].collect()
      var vocab: Seq[(String, Long, Double)] =
        rescoreD((chars ++ multis).toSeq.map(v => (v._1, v._2.toDouble)))
      if (vocab.isEmpty) return Seq.empty

      var round = 0
      while (round < emRounds) {
        // log-probs from the fractional counts (not the quantized scores:
        // posteriors deserve full double precision)
        val total = vocab.iterator.map(_._3).sum
        val logp: Map[String, Double] =
          vocab.iterator.map(v => v._1 -> (Math.log(v._3) - Math.log(total))).toMap
        val maxLen = vocab.iterator.map(_._1.length).max
        val counts: Map[String, Double] = wc
          .mapPartitions(_.flatMap { case (w, c) =>
            expectedCounts(w, logp, maxLen).iterator.map { case (p, e) => (p, e * c) }
          })
          .toDF("piece", "e")
          .groupBy("piece").agg(sum("e").as("e"))
          .as[(String, Double)].collect().toMap
        val next = vocab.flatMap { case (p, _, _) =>
          val c = counts.getOrElse(p, 0.0)
          if (p.length == 1) Some((p, math.max(c, 1.0)))
          else if (c > 1e-9) Some((p, c))
          else None
        }
        vocab = rescoreD(next)
        round += 1
      }

      val (cs, ms) = vocab.partition(_._1.length == 1)
      val keptMultis = ms
        .sortBy(v => (-v._3, v._1))
        .take(math.max(0, vocabSize - cs.length))
      rescoreD((cs ++ keptMultis).map(v => (v._1, v._3)))
        .sortBy(v => (-v._3, v._1))
    } finally wc.unpersist()
  }

  /** Forward-backward posterior expected piece counts for one word
    * under the current unigram model (log-space, logsumexp-stable).
    * Returns (piece → expected occurrences); empty when the word is
    * uncoverable (cannot happen with full character coverage).
    */
  private[graft] def expectedCounts(
      w: String, logp: Map[String, Double], maxLen: Int): Map[String, Double] = {
    val n = w.length
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val alpha = Array.fill(n + 1)(NegInf)
    val beta = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        if (alpha(i - l) != NegInf) {
          logp.get(w.substring(i - l, i)) match {
            case Some(lp) => alpha(i) = lse(alpha(i), alpha(i - l) + lp)
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    if (alpha(n) == NegInf) return Map.empty
    beta(n) = 0.0
    var j = n - 1
    while (j >= 0) {
      var l = 1
      while (l <= math.min(maxLen, n - j)) {
        if (beta(j + l) != NegInf) {
          logp.get(w.substring(j, j + l)) match {
            case Some(lp) => beta(j) = lse(beta(j), lp + beta(j + l))
            case None => ()
          }
        }
        l += 1
      }
      j -= 1
    }
    val out = scala.collection.mutable.HashMap.empty[String, Double]
    j = 0
    while (j < n) {
      if (alpha(j) != NegInf) {
        var l = 1
        while (l <= math.min(maxLen, n - j)) {
          if (beta(j + l) != NegInf) {
            val p = w.substring(j, j + l)
            logp.get(p) match {
              case Some(lp) =>
                val post = math.exp(alpha(j) + lp + beta(j + l) - alpha(n))
                out(p) = out.getOrElse(p, 0.0) + post
              case None => ()
            }
          }
          l += 1
        }
      }
      j += 1
    }
    out.toMap
  }

  // ------------------------------------------------------------------
  // DuckDB oracle: the training above as ONE static SQL string — the
  // oracle RE-TRAINS (seed in plain SQL; each EM round's Viterbi
  // unrolled as 24 forward + 24 backtrack layers over the word-count
  // state, the UnigramEncode.oracleSql templates with the vocab carried
  // as a list COLUMN from the previous round's CTE instead of a
  // literal; prune + rescore in SQL) and must reproduce the exact
  // (vrank, piece, score) table.
  // ------------------------------------------------------------------

  private def q9lnSql(e: String): String =
    s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)"

  /** Viterbi layers over the word-count state `wc`, vocab taken from CTE
    * `vocabCte` (carried as a one-row materialized list table): emits
    * `vl{tag}`, `f{tag}_0..steps` and `b{tag}_0..steps` — the consumer
    * reads segmentations from `b{tag}_{steps}` (word, cnt, scores,
    * parts). The UnigramEncode.oracleSql templates with the literal
    * vocab swapped for the flowing column.
    */
  private def viterbiSql(tag: String, vocabCte: String, steps: Int): String = {
    val r = tag
    val fwd = (1 to steps).map { k =>
      s"""f${r}_$k AS (
         |  SELECT word, cnt, vl,
         |    list_append(scores, CASE WHEN best IS NULL THEN NULL ELSE -best.ms END) AS scores,
         |    list_append(picks, best.p) AS picks
         |  FROM (
         |    SELECT word, cnt, vl, scores, picks,
         |      list_sort(list_transform(
         |        list_filter(vl, v ->
         |          $k <= length(word) AND length(v.p) <= $k
         |          AND substr(word, $k - length(v.p) + 1, length(v.p)) = v.p
         |          AND scores[$k - length(v.p) + 1] IS NOT NULL),
         |        v -> {'ms': -(scores[$k - length(v.p) + 1] + v.s),
         |              'j': $k - length(v.p), 'p': v.p}))[1] AS best
         |    FROM f${r}_${k - 1})
         |)""".stripMargin
    }.mkString(",\n")
    val back = (1 to steps).map { k =>
      // the LAST backtrack layer is a MATERIALIZED fence: without it,
      // wrapping the 48-layer inlined chain in cnt{r}'s unnest+groupBy
      // sends the DuckDB optimizer into a multi-minute planning blowup
      // (measured at 31 distinct words); the fence makes the full
      // re-train replay sub-second
      val mat = if (k == steps) " MATERIALIZED" else ""
      s"""b${r}_$k AS$mat (
         |  SELECT word, cnt, scores, picks,
         |    CASE WHEN pos > 0 THEN pos - length(picks[pos]) ELSE pos END AS pos,
         |    CASE WHEN pos > 0 THEN list_prepend(picks[pos], parts) ELSE parts END AS parts
         |  FROM b${r}_${k - 1}
         |)""".stripMargin
    }.mkString(",\n")
    s"""vl$r AS MATERIALIZED (
       |  -- ONE-ROW vocab-list table, cross-joined below: a scalar
       |  -- subquery here re-evaluates PER ROW in DuckDB, re-running the
       |  -- entire previous round's layer chain each time (measured as a
       |  -- multi-minute hang at 50 docs); materializing pins it to once
       |  SELECT list({'p': piece, 's': score} ORDER BY piece) AS vl FROM $vocabCte
       |),
       |f${r}_0 AS (
       |  SELECT word, cnt, vl,
       |    [CAST(0 AS BIGINT)] AS scores,
       |    CAST([] AS VARCHAR[]) AS picks
       |  FROM wc CROSS JOIN vl$r
       |),
       |$fwd,
       |b${r}_0 AS (
       |  SELECT word, cnt, scores, picks,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 0
       |         ELSE length(word) END AS pos,
       |    CAST([] AS VARCHAR[]) AS parts
       |  FROM f${r}_$steps
       |),
       |$back""".stripMargin
  }

  /** One EM round `r`: Viterbi with the previous round's vocab, piece
    * counts `cnt{r}`, and the rescored vocab `vp{r}`.
    */
  private def roundSql(r: Int, steps: Int): String = {
    s"""${viterbiSql(r.toString, s"vp${r - 1}", steps)},
       |cnt$r AS (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (
       |    SELECT cnt, unnest(parts) AS piece
       |    FROM b${r}_$steps
       |    WHERE scores[length(word) + 1] IS NOT NULL)
       |  GROUP BY piece
       |),
       |vc$r AS (
       |  SELECT v.piece,
       |    CASE WHEN length(v.piece) = 1 THEN greatest(coalesce(c.c, 0), 1)
       |         ELSE coalesce(c.c, 0) END AS c
       |  FROM vp${r - 1} v LEFT JOIN cnt$r c ON v.piece = c.piece
       |  WHERE length(v.piece) = 1 OR coalesce(c.c, 0) > 0
       |),
       |vp$r AS MATERIALIZED (
       |  SELECT piece, c,
       |    ${q9lnSql("c")} - (SELECT ${q9lnSql("sum(c)")} FROM vc$r) AS score
       |  FROM vc$r
       |)""".stripMargin
  }

  /** The full re-training oracle for the `q_unigram_vocab` gate. */
  /** The re-training chain: `WITH w0 … keepF` — `keepF` is the final
    * kept (piece, count) set; callers append their own tail. `w0`
    * carries (doc_id, word, ord) so encode tails can re-aggregate
    * per document.
    */
  private def trainChainSql(
      table: String, maxPieceLen: Int, seedSize: Int, minCount: Long,
      vocabSize: Int, emRounds: Int, steps: Int): String = {
    val up = Bpe.Upper
    val lo = Bpe.Lower
    val re = Bpe.WordRegex
    val rounds = (1 to emRounds).map(roundSql(_, steps)).mkString(",\n")
    val roundsSep = if (emRounds > 0) s",\n$rounds" else ""
    s"""WITH w0 AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(translate(text, '$up', '$lo'), '$re')) AS word,
       |    unnest(range(len(regexp_extract_all(translate(text, '$up', '$lo'), '$re')))) AS ord
       |  FROM $table
       |), wc AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w0 GROUP BY word
       |), sub AS MATERIALIZED (
       |  SELECT substr(word, CAST(st AS INT), CAST(l AS INT)) AS piece,
       |         CAST(sum(cnt) AS BIGINT) AS c
       |  FROM wc
       |  CROSS JOIN range(1, ${Bpe.MaxWordLen + 1}) r1(st)
       |  CROSS JOIN range(1, ${maxPieceLen + 1}) r2(l)
       |  WHERE st + l - 1 <= length(word)
       |  GROUP BY 1
       |), chars0 AS (
       |  SELECT piece, c FROM sub WHERE length(piece) = 1
       |), multi0 AS (
       |  SELECT piece, c FROM sub
       |  WHERE length(piece) > 1 AND c >= $minCount
       |  QUALIFY row_number() OVER (ORDER BY c DESC, piece)
       |    <= $seedSize - (SELECT count(*) FROM chars0)
       |), keep0 AS (
       |  SELECT * FROM chars0 UNION ALL SELECT * FROM multi0
       |), vp0 AS MATERIALIZED (
       |  SELECT piece, c,
       |    ${q9lnSql("c")} - (SELECT ${q9lnSql("sum(c)")} FROM keep0) AS score
       |  FROM keep0
       |)$roundsSep,
       |charsF AS (
       |  SELECT piece, c FROM vp$emRounds WHERE length(piece) = 1
       |), multiF AS (
       |  SELECT piece, c FROM vp$emRounds
       |  WHERE length(piece) > 1
       |  QUALIFY row_number() OVER (ORDER BY c DESC, piece)
       |    <= $vocabSize - (SELECT count(*) FROM charsF)
       |), keepF AS (
       |  SELECT * FROM charsF UNION ALL SELECT * FROM multiF
       |)""".stripMargin
  }

  /** The full re-training oracle for the `q_unigram_vocab` gate. */
  def oracleSqlVocab(
      table: String,
      maxPieceLen: Int = GateMaxPieceLen,
      seedSize: Int = GateSeedSize,
      minCount: Long = GateMinCount,
      vocabSize: Int = GateVocabSize,
      emRounds: Int = GateEmRounds,
      steps: Int = 24): String = {
    s"""${trainChainSql(table, maxPieceLen, seedSize, minCount, vocabSize, emRounds, steps)}
       |SELECT
       |  CAST(row_number() OVER (ORDER BY c DESC, piece) AS BIGINT) AS vrank,
       |  piece,
       |  ${q9lnSql("c")} - (SELECT ${q9lnSql("sum(c)")} FROM keepF) AS score
       |FROM keepF
       |ORDER BY vrank""".stripMargin
  }

  /** Composed oracle for `q_tokenize_unigram_trained`: RE-TRAIN, then
    * RE-ENCODE the corpus with the re-trained vocab — one more Viterbi
    * unroll (tag `E`) with the vocab flowing from the final rescore,
    * then the per-document aggregation of UnigramEncode.oracleSql.
    */
  def oracleSqlTokenizeTrained(
      table: String,
      maxPieceLen: Int = GateMaxPieceLen,
      seedSize: Int = GateSeedSize,
      minCount: Long = GateMinCount,
      vocabSize: Int = GateVocabSize,
      emRounds: Int = GateEmRounds,
      steps: Int = 24): String = {
    s"""${trainChainSql(table, maxPieceLen, seedSize, minCount, vocabSize, emRounds, steps)},
       |vfin AS MATERIALIZED (
       |  SELECT piece,
       |    ${q9lnSql("c")} - (SELECT ${q9lnSql("sum(c)")} FROM keepF) AS score
       |  FROM keepF
       |),
       |${viterbiSql("E", "vfin", steps)},
       |vfE AS (
       |  SELECT word,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN '[UNK]'
       |         ELSE array_to_string(parts, ' ') END AS seg,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 1
       |         ELSE len(parts) END AS ntok,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 1 ELSE 0 END AS unk
       |  FROM bE_$steps
       |), agg AS (
       |  SELECT w0.doc_id,
       |    count(*) AS n_words,
       |    CAST(sum(v.ntok) AS BIGINT) AS n_tokens,
       |    CAST(sum(v.unk) AS BIGINT) AS n_unk,
       |    md5(string_agg(v.seg, ' ' ORDER BY w0.ord)) AS seg_md5
       |  FROM w0 JOIN vfE v ON w0.word = v.word
       |  GROUP BY w0.doc_id
       |)
       |SELECT d.doc_id,
       |  CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(a.n_unk, 0) AS BIGINT) AS n_unk,
       |  coalesce(a.seg_md5, md5('')) AS seg_md5
       |FROM $table d LEFT JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
