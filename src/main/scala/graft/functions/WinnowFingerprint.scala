package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): from the word n-gram hash sequence, slide a
  * window of `w` consecutive hashes and select each window's RIGHTMOST
  * MINIMUM; the distinct selected (hash, position) pairs are the
  * document's fingerprint. Guarantee (the paper's point): any shared
  * substring of at least n+w−1 words between two documents yields at
  * least one shared fingerprint hash — unlike MinHash, matches are
  * POSITIONED, so overlap localization is free.
  *
  * Alignment with the repo's dedup family: tokens come from the shared
  * [[Tokenize]] boundaries and gram hashes are the established md5
  * lower-60-bit family ([[MinHashSignatureMd5.md5Base60]]), so the DuckDB
  * oracle recomputes them with the `('0x' || substr(md5(g),1,15))::BIGINT`
  * idiom and replays window selection relationally (`arg_min(pos,
  * [h, -pos])` per window).
  *
  * Output: (n_grams, n_fp, fp_stream) where `fp_stream` is the selected
  * `hash:pos` pairs (pos 1-based) joined by single spaces in position
  * order — the gate md5-pins it; pair generation explodes it through the
  * same blocked-join machinery as the other dedup ops.
  *
  * Edges, defined: fewer grams than `w` → ONE window over all grams;
  * no grams (fewer than n tokens) → empty fingerprint. Selection runs a
  * monotonic deque (pop `>=` so the newest of equal hashes survives —
  * that IS the rightmost-min rule), O(G) per document.
  *
  * Map-only, no shuffle; selected positions are non-decreasing across
  * windows, so the distinct-ordered stream appends without a sort.
  */
case class WinnowFingerprint(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = WinnowFingerprint.schema
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${child.dataType.catalogString}")
    else if (n < 1 || w < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint needs n >= 1 and w >= 1, got n=$n w=$w")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.fingerprint(input.asInstanceOf[UTF8String].toString, n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WinnowFingerprint.fingerprint($v.toString(), $n, $w);")

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

object WinnowFingerprint {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_fp", LongType, nullable = false),
    StructField("fp_stream", StringType, nullable = false),
    // r19: the selected hashes as a SORTED DISTINCT long array — the set
    // the pair miner blocks on. The relational form it replaces re-parsed
    // fp_stream per row (split → filter → split(":") → cast, four
    // interpreted higher-order passes over a string the expression had
    // just built from these very longs).
    StructField("fp_hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private val EmptyHashes =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])

  def fingerprint(text: String, n: Int, w: Int): InternalRow = {
    val (starts, ends) = Tokenize.boundaries(text)
    val ntok = starts.length
    val g = ntok - n + 1
    if (g <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, UTF8String.EMPTY_UTF8, EmptyHashes))

    val h = new Array[Long](g)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < g) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(text, starts(i + j), ends(i + j))
        j += 1
      }
      h(i) = MinHashSignatureMd5.md5Base60(sb.toString)
      i += 1
    }

    // monotonic deque of gram indices; pop >= so the NEWEST equal hash
    // survives — the rightmost-minimum rule
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.lang.StringBuilder(g * 4)
    val selHashes = new Array[Long](g) // ≤ one selection per gram
    var nSel = 0
    var nFp = 0L
    var lastSel = -1
    val firstWindowEnd = math.min(w, g) // G < w → one window over all
    i = 0
    while (i < g) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      val windowStart = i - w + 1
      while (dq(head) < windowStart) head += 1
      if (i >= firstWindowEnd - 1) {
        val sel = dq(head)
        if (sel != lastSel) {
          if (out.length > 0) out.append(' ')
          out.append(h(sel)).append(':').append(sel + 1) // 1-based pos
          selHashes(nSel) = h(sel)
          nSel += 1
          nFp += 1
          lastSel = sel
        }
      }
      i += 1
    }

    // sorted distinct hash set (array_sort(array_distinct(...)) parity)
    java.util.Arrays.sort(selHashes, 0, nSel)
    var uniq = 0
    var k = 0
    while (k < nSel) {
      if (uniq == 0 || selHashes(k) != selHashes(uniq - 1)) {
        selHashes(uniq) = selHashes(k); uniq += 1
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](
      g.toLong, nFp, UTF8String.fromString(out.toString),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(selHashes, uniq))))
  }

  def apply(text: Column, n: Int, w: Int): Column =
    ColumnBridge.toColumn(WinnowFingerprint(ColumnBridge.toExpression(text), n, w))
}
