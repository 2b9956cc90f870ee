package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL BPE encode as a fused reference-object expression (the DictScan
  * pattern): the trained merge table rides the closure, each document is
  * tokenized ([[graft.pipeline.Bpe.words]]) and each word segmented by
  * applying the merges in learned order, each rule to fixpoint — the
  * exact semantics [[graft.pipeline.Bpe]] defines and the DuckDB oracle
  * replays. Output:
  *
  *   (n_words, n_tokens, segmented)
  *
  * `segmented` is the full token stream joined by single spaces (word
  * boundaries and token boundaries share the separator — identical on
  * both engines, and what the gate md5-pins).
  *
  * Map-only, no shuffle, no join: at 100 TB the merge table (a few
  * hundred short strings) broadcasts with the task closure and every
  * text byte is touched once. A per-thread segmentation cache exploits
  * the Zipfian word distribution (the overwhelmingly common words
  * segment once per task thread, not once per occurrence).
  */
case class BpeEncode(
    child: Expression, merges: Seq[(String, String)], ranked: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = BpeEncode.schema
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects string, got ${child.dataType.catalogString}")
    else if (merges.exists(m => m._1.isEmpty || m._2.isEmpty))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bpe_encode merge table contains an empty token")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val encoder = new BpeEncode.Encoder(merges, ranked)

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("encoder", encoder, classOf[BpeEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.encode($v.toString());")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeEncode {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("segmented", StringType, nullable = false)))

  /** Per-thread word→segmentation cache cap: Zipfian corpora hit a few
    * thousand distinct words constantly; the cap only bounds adversarial
    * vocabularies. The cache is access-order LRU (LinkedHashMap with
    * removeEldestEntry), so a high-cardinality stream evicts one cold
    * entry per miss instead of dumping and refilling the whole map —
    * the former clear-wholesale form thrashed on non-Zipfian input.
    */
  val CacheCap = 1 << 16

  /** `ranked = false`: the oracle-replayable apply (each rule in learned
    * order, each to fixpoint — what the gates pin). `ranked = true`: the
    * Sennrich priority apply ([[graft.pipeline.Bpe.encodeWordRanked]]),
    * whose per-word cost is independent of merge-table size — the
    * production path at 16k-64k merges. BpeSpec pins the two equal over
    * the real corpus vocabulary at gate scale, and pins the production-
    * scale (32k-merge) divergence to exactly the self-overlap chain
    * class at ~1 in 58k words (encodeWordRanked scaladoc).
    */
  final class Encoder(merges: Seq[(String, String)], ranked: Boolean = false)
      extends Serializable {
    private val table: Array[(String, String)] = merges.toArray

    @transient private lazy val ranks = graft.pipeline.Bpe.rankTable(table.toSeq)

    @transient private lazy val cache =
      new ThreadLocal[java.util.LinkedHashMap[String, Array[String]]] {
        override def initialValue() =
          new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[String, Array[String]]): Boolean =
              size() > CacheCap
          }
      }

    private def segment(word: String): Array[String] = {
      val c = cache.get()
      val hit = c.get(word)
      if (hit != null) return hit
      val toks =
        if (ranked) graft.pipeline.Bpe.encodeWordRanked(word, ranks)
        else {
          var t: Array[String] = Array.tabulate(word.length)(i => word.substring(i, i + 1))
          var r = 0
          while (r < table.length) {
            t = graft.pipeline.Bpe.applyRule(t, table(r)._1, table(r)._2)
            r += 1
          }
          t
        }
      c.put(word, toks)
      toks
    }

    def encode(text: String): InternalRow = {
      val ws = graft.pipeline.Bpe.words(text)
      var nTok = 0L
      val sb = new java.lang.StringBuilder(text.length + (text.length >> 2))
      var i = 0
      while (i < ws.length) {
        val toks = segment(ws(i))
        nTok += toks.length
        var j = 0
        while (j < toks.length) {
          if (sb.length > 0) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        i += 1
      }
      new GenericInternalRow(Array[Any](
        ws.length.toLong, nTok, UTF8String.fromString(sb.toString)))
    }
  }

  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.toColumn(BpeEncode(ColumnBridge.toExpression(text), merges))

  def apply(text: Column, merges: Seq[(String, String)], ranked: Boolean): Column =
    ColumnBridge.toColumn(BpeEncode(ColumnBridge.toExpression(text), merges, ranked))
}
