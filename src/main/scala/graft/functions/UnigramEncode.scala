package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL Unigram-LM encode (Kudo 2018, the SentencePiece algorithm) — the
  * THIRD production tokenizer family next to BPE ([[BpeEncode]]) and
  * WordPiece ([[WordPieceEncode]]): each word is segmented into the
  * vocabulary pieces maximizing the TOTAL piece score (Viterbi over word
  * positions), not greedily. Where WordPiece commits to the longest
  * match at each position, unigram picks the globally best path — the
  * spec pins a case where the two genuinely differ.
  *
  * The model is (piece, score) pairs with INTEGER scores (quantized
  * log-probs — what a SentencePiece model file carries after the q9
  * treatment); integer sums make the DP exactly replayable in SQL with
  * no libm anywhere. Tie-breaking is part of the contract: on equal
  * total score prefer the SMALLER start position of the last piece
  * (i.e. the longer last piece), then the lexicographically smaller
  * piece — the oracle's struct sort (−score, j, piece) verbatim.
  * A word with any unreachable position (no piece coverage) becomes the
  * single unknown token `[UNK]`, matching the WordPiece contract.
  *
  * Words come from the shared [[graft.pipeline.Bpe.words]] tokenizer, so
  * all three tokenizer families segment the same word stream. Output:
  * (n_words, n_tokens, n_unk, segmented) — the established shape.
  *
  * The oracle ([[UnigramEncode.oracleSql]]) unrolls the Viterbi forward
  * pass as 24 list-op layers over the distinct-word state (24 = the word
  * regex's cap) carrying the score and back-pointer lists, then unrolls
  * the backtrack as another 24 layers.
  *
  * Map-only: the model rides the closure as per-length hash maps;
  * per-word cost O(len · maxPieceLen) probes; the BPE LRU segmentation
  * cache in front.
  */
case class UnigramEncode(
    child: Expression, vocab: Seq[(String, Long)], unk: String = "[UNK]")
    extends UnaryExpression {

  override def dataType: DataType = UnigramEncode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unigram_encode expects string, got ${child.dataType.catalogString}")
    else if (vocab.exists(_._1.isEmpty))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "unigram_encode vocab contains an empty piece")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val encoder = new UnigramEncode.Encoder(vocab, unk)

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "encoder", encoder, classOf[UnigramEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v.toString());")
  }

  override protected def withNewChildInternal(c: Expression): UnigramEncode =
    copy(child = c)
}

object UnigramEncode {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("segmented", StringType, nullable = false)))

  /** The gate's fixed model (inlined into BOTH engines — a real unigram
    * model is trained externally and loaded, so the gate pins the
    * VITERBI APPLY). Multi-char stems are cheaper than their spelled-out
    * char paths (so Viterbi prefers them), single-char coverage omits
    * `q` (real [UNK]s), and the ("jo", "oin") pieces make "join"
    * segmentable three ways with distinct totals — the DP has to choose.
    */
  val GateVocab: Seq[(String, Long)] = Seq(
    "join" -> -5500000L, "jo" -> -4200000L, "oin" -> -4300000L,
    "hash" -> -5600000L, "scan" -> -5700000L, "batch" -> -6000000L,
    "merge" -> -6100000L, "order" -> -6200000L, "data" -> -5400000L,
    "col" -> -5000000L, "umn" -> -5100000L, "er" -> -3500000L,
    "an" -> -3400000L, "in" -> -3300000L, "ter" -> -4100000L) ++
    "abcdefghijklmnoprstuvwxyz".map(c => c.toString -> -4000000L)

  final class Encoder(vocab: Seq[(String, Long)], unk: String)
      extends Serializable {
    // per-length piece→score maps; probe lengths descend from maxLen
    private val byLen: Array[java.util.HashMap[String, java.lang.Long]] = {
      val maxLen = vocab.map(_._1.length).max
      val arr = Array.fill(maxLen + 1)(new java.util.HashMap[String, java.lang.Long]())
      vocab.foreach { case (p, s) => arr(p.length).put(p, s) }
      arr
    }
    private val maxLen = byLen.length - 1

    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue() =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean =
              size() > BpeEncode.CacheCap
          }
      }

    /** Viterbi over prefix lengths 0..len; best(k) maximizes the total,
      * ties prefer smaller start j, then smaller piece string.
      */
    private def segment(word: String): Array[String] = {
      val c = cache.get()
      val hit = c.get(word)
      if (hit != null) return hit
      val len = word.length
      val score = new Array[Long](len + 1)
      val reach = new Array[Boolean](len + 1)
      val pickLen = new Array[Int](len + 1)
      score(0) = 0L; reach(0) = true
      var k = 1
      while (k <= len) {
        var bestTotal = 0L
        var bestJ = -1
        var bestPiece: String = null
        var l = math.min(maxLen, k)
        while (l >= 1) {
          val j = k - l
          if (reach(j)) {
            val s = byLen(l).get(word.substring(j, k))
            if (s != null) {
              val total = score(j) + s.longValue()
              // argmax total; tie → smaller j (longer piece) — l descends
              // from the max so larger l (smaller j) is seen FIRST and a
              // later equal total never replaces it; piece-string ties
              // cannot occur at one (j, k)
              if (bestJ < 0 || total > bestTotal) {
                bestTotal = total; bestJ = j; bestPiece = word.substring(j, k)
              }
            }
          }
          l -= 1
        }
        if (bestJ >= 0) {
          reach(k) = true; score(k) = bestTotal; pickLen(k) = k - bestJ
        }
        k += 1
      }
      val toks =
        if (!reach(len) || len == 0) Array(unk)
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var pos = len
          while (pos > 0) {
            out += word.substring(pos - pickLen(pos), pos)
            pos -= pickLen(pos)
          }
          out.reverse.toArray
        }
      c.put(word, toks)
      toks
    }

    /** The trainer's E-step surface ([[graft.pipeline.Unigram]]): the
      * Viterbi pieces of ONE word under this model (`[UNK]` when any
      * position is unreachable — the trainer skips those).
      */
    def segmentWord(word: String): Array[String] = segment(word)

    def encode(text: String): InternalRow = {
      val ws = graft.pipeline.Bpe.words(text)
      var nTok = 0L
      var nUnk = 0L
      val sb = new java.lang.StringBuilder(text.length + (text.length >> 2))
      var i = 0
      while (i < ws.length) {
        val toks = segment(ws(i))
        nTok += toks.length
        if (toks.length == 1 && toks(0).equals(unk)) nUnk += 1
        var j = 0
        while (j < toks.length) {
          if (sb.length > 0) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](
        ws.length.toLong, nTok, nUnk, UTF8String.fromString(sb.toString)))
    }
  }

  /** DuckDB replay: the Viterbi FORWARD pass unrolled as `steps` list-op
    * layers over the distinct-word state — layer k appends prefix k's
    * best (score, chosen-piece) to carried lists, choosing by the
    * contract's struct sort (−total, start j, piece); then the BACKTRACK
    * unrolled as `steps` more layers walking the pick list down from
    * length(word). 24 covers the word regex's cap; every piece consumes
    * ≥ 1 char.
    */
  def oracleSql(table: String, vocab: Seq[(String, Long)], steps: Int = 24): String = {
    val vlist = vocab
      .map { case (p, s) => s"{'p': '$p', 's': CAST($s AS BIGINT)}" }
      .mkString("[", ", ", "]")
    val up = graft.pipeline.Bpe.Upper
    val lo = graft.pipeline.Bpe.Lower
    val re = graft.pipeline.Bpe.WordRegex
    // forward layer k: scores[j+1] is prefix j's total (scores[1] = 0)
    val fwd = (1 to steps).map { k =>
      s"""f$k AS (
         |  SELECT word,
         |    list_append(scores, CASE WHEN best IS NULL THEN NULL ELSE -best.ms END) AS scores,
         |    list_append(picks, best.p) AS picks
         |  FROM (
         |    SELECT word, scores, picks,
         |      list_sort(list_transform(
         |        list_filter(@VOCAB@, v ->
         |          $k <= length(word) AND length(v.p) <= $k
         |          AND substr(word, $k - length(v.p) + 1, length(v.p)) = v.p
         |          AND scores[$k - length(v.p) + 1] IS NOT NULL),
         |        v -> {'ms': -(scores[$k - length(v.p) + 1] + v.s),
         |              'j': $k - length(v.p), 'p': v.p}))[1] AS best
         |    FROM f${k - 1})
         |)""".stripMargin.replace("@VOCAB@", vlist)
    }.mkString(",\n")
    // backtrack layer: pos counts down; picks[pos] is prefix pos's piece
    val back = (1 to steps).map { k =>
      s"""b$k AS (
         |  SELECT word, scores, picks,
         |    CASE WHEN pos > 0 THEN pos - length(picks[pos]) ELSE pos END AS pos,
         |    CASE WHEN pos > 0 THEN list_prepend(picks[pos], parts) ELSE parts END AS parts
         |  FROM b${k - 1}
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(translate(text, '$up', '$lo'), '$re')) AS word,
       |    unnest(range(len(regexp_extract_all(translate(text, '$up', '$lo'), '$re')))) AS ord
       |  FROM $table
       |), dw AS (
       |  SELECT DISTINCT word FROM w0
       |), f0 AS (
       |  SELECT word, [CAST(0 AS BIGINT)] AS scores,
       |         CAST([] AS VARCHAR[]) AS picks
       |  FROM dw
       |),
       |$fwd
       |, b0 AS (
       |  SELECT word, scores, picks,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 0
       |         ELSE length(word) END AS pos,
       |    CAST([] AS VARCHAR[]) AS parts
       |  FROM f$steps
       |),
       |$back
       |, vf AS (
       |  SELECT word,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN '[UNK]'
       |         ELSE array_to_string(parts, ' ') END AS seg,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 1
       |         ELSE len(parts) END AS ntok,
       |    CASE WHEN scores[length(word) + 1] IS NULL THEN 1 ELSE 0 END AS unk
       |  FROM b$steps
       |), agg AS (
       |  SELECT w0.doc_id,
       |    count(*) AS n_words,
       |    CAST(sum(v.ntok) AS BIGINT) AS n_tokens,
       |    CAST(sum(v.unk) AS BIGINT) AS n_unk,
       |    md5(string_agg(v.seg, ' ' ORDER BY w0.ord)) AS seg_md5
       |  FROM w0 JOIN vf v ON w0.word = v.word
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

  def apply(text: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.toColumn(UnigramEncode(ColumnBridge.toExpression(text), vocab))
}
