package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL WordPiece encode (the BERT tokenizer's apply): greedy
  * longest-match-first segmentation against a fixed vocabulary, with the
  * `##` continuation convention — the OTHER production tokenizer family
  * next to BPE ([[BpeEncode]]). Semantics per word (Devlin et al. 2019 /
  * the reference `tokenization.py` WordpieceTokenizer):
  *
  *   - at the word start, only non-`##` vocab entries match; at any later
  *     position, only `##`-prefixed entries match (content = entry minus
  *     the marker);
  *   - at each position take the LONGEST matching entry (no backtracking);
  *   - if no entry matches at some position, the WHOLE word becomes the
  *     single unknown token `[UNK]`.
  *
  * Words come from the shared [[graft.pipeline.Bpe.words]] tokenizer
  * (lowercase `[a-z]{1,24}` runs), so BPE and WordPiece segment the same
  * word stream and their token counts compare directly. Output:
  *
  *   (n_words, n_tokens, n_unk, segmented)
  *
  * `segmented` is the token stream joined by single spaces (the BPE
  * convention the gates md5-pin). The DuckDB oracle replays the greedy
  * loop as UNROLLED steps over the distinct-word state — each step
  * consumes ≥ 1 char, and the word regex caps words at 24 chars, so 24
  * layers are always enough ([[WordPieceEncode.oracleSql]]).
  *
  * Map-only, no shuffle: the vocabulary (30k entries in production BERT)
  * rides the closure as per-length hash sets; longest-match probes run
  * from the longest plausible length down, so per-position cost is
  * O(maxEntryLen) hash probes, independent of vocabulary size. The same
  * per-thread LRU segmentation cache as BPE exploits Zipfian word
  * distributions.
  */
case class WordPieceEncode(
    child: Expression, vocab: Seq[String], unk: String = "[UNK]")
    extends UnaryExpression {

  override def dataType: DataType = WordPieceEncode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode expects string, got ${child.dataType.catalogString}")
    else if (vocab.exists(v => v.isEmpty || v == "##"))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "wordpiece_encode vocab contains an empty entry")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val encoder = new WordPieceEncode.Encoder(vocab, unk)

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "encoder", encoder, classOf[WordPieceEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v.toString());")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceEncode =
    copy(child = c)
}

object WordPieceEncode {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("segmented", StringType, nullable = false)))

  /** The gate's fixed vocabulary, inlined into BOTH engines (a real
    * WordPiece vocab is trained externally and loaded like this —
    * vocab.txt — so the gate pins the APPLY, the operator's semantics).
    * Multi-char stems + continuations exercise longest-match-first;
    * single-char coverage spans the corpus alphabet EXCEPT `q`, so
    * q-bearing words take the whole-word [UNK] path on real data.
    */
  val GateVocab: Seq[String] = Seq(
    "join", "hash", "scan", "batch", "merge", "order", "data", "col",
    "filt", "cust", "ro",
    "##er", "##an", "##in", "##ch", "##ter", "##umn", "##omer", "##w") ++
    "abcdefghijklmnoprstuvwxyz".map(_.toString) ++
    "abcdefghijklmnoprstuvwxyz".map(c => s"##$c")

  final class Encoder(vocab: Seq[String], unk: String) extends Serializable {
    // initial-position entries and continuation bodies (## stripped)
    private val initial = new java.util.HashSet[String]()
    private val cont = new java.util.HashSet[String]()
    private var maxInit = 0
    private var maxCont = 0
    vocab.foreach { v =>
      if (v.startsWith("##")) {
        val body = v.substring(2)
        cont.add(body); if (body.length > maxCont) maxCont = body.length
      } else {
        initial.add(v); if (v.length > maxInit) maxInit = v.length
      }
    }

    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue() =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean =
              size() > BpeEncode.CacheCap
          }
      }

    private def segment(word: String): Array[String] = {
      val c = cache.get()
      val hit = c.get(word)
      if (hit != null) return hit
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      var failed = false
      while (pos < word.length && !failed) {
        val set = if (pos == 0) initial else cont
        val maxL = math.min(if (pos == 0) maxInit else maxCont, word.length - pos)
        var l = maxL
        var found: String = null
        while (l >= 1 && found == null) {
          val cand = word.substring(pos, pos + l)
          if (set.contains(cand)) found = cand
          l -= 1
        }
        if (found == null) failed = true
        else {
          out += (if (pos == 0) found else "##" + found)
          pos += found.length
        }
      }
      val toks = if (failed) Array(unk) else out.toArray
      c.put(word, toks)
      toks
    }

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

  /** DuckDB replay of the greedy loop: `steps` UNROLLED layers over the
    * distinct-word state (word, pos, seg, failed). Each layer finds the
    * longest matching vocab entry at `pos` with pure list ops (filter on
    * substr equality, sort by −length — no ties possible: two matches of
    * equal length at one position are the same string) and advances.
    * Every layer consumes ≥ 1 char, and [[graft.pipeline.Bpe.WordRegex]]
    * caps words at 24 chars, so steps = 24 always terminates.
    */
  def oracleSql(table: String, vocab: Seq[String], steps: Int = 24): String = {
    val init = vocab.filterNot(_.startsWith("##"))
    val contB = vocab.filter(_.startsWith("##")).map(_.substring(2))
    def lst(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")
    val up = graft.pipeline.Bpe.Upper
    val lo = graft.pipeline.Bpe.Lower
    val re = graft.pipeline.Bpe.WordRegex
    val layers = (1 to steps).map { k =>
      s"""s$k AS (
         |  SELECT word,
         |    CASE WHEN failed OR pos > length(word) OR best IS NULL THEN pos
         |         ELSE pos + length(best) END AS pos,
         |    CASE WHEN failed OR pos > length(word) OR best IS NULL THEN seg
         |         ELSE seg || CASE WHEN seg = '' THEN '' ELSE ' ' END ||
         |              CASE WHEN pos = 1 THEN best ELSE '##' || best END END AS seg,
         |    failed OR (pos <= length(word) AND best IS NULL) AS failed
         |  FROM (
         |    SELECT *,
         |      list_sort(list_transform(
         |        list_filter(CASE WHEN pos = 1 THEN @VINIT@ ELSE @VCONT@ END,
         |          v -> substr(word, pos, length(v)) = v),
         |        v -> {'l': -length(v), 'v': v}))[1].v AS best
         |    FROM s${k - 1})
         |)""".stripMargin
        .replace("@VINIT@", lst(init))
        .replace("@VCONT@", lst(contB))
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(translate(text, '$up', '$lo'), '$re')) AS word,
       |    unnest(range(len(regexp_extract_all(translate(text, '$up', '$lo'), '$re')))) AS ord
       |  FROM $table
       |), dw AS (
       |  SELECT DISTINCT word FROM w0
       |), s0 AS (
       |  SELECT word, 1 AS pos, '' AS seg, false AS failed FROM dw
       |),
       |$layers
       |, vf AS (
       |  SELECT word,
       |    CASE WHEN failed THEN '[UNK]' ELSE seg END AS seg,
       |    CASE WHEN failed THEN 1 ELSE len(string_split(seg, ' ')) END AS ntok,
       |    CASE WHEN failed THEN 1 ELSE 0 END AS unk
       |  FROM s$steps
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

  def apply(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.toColumn(WordPieceEncode(ColumnBridge.toExpression(text), vocab))
}
