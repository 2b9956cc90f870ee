package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document token-distribution (Shannon) entropy — the standard
  * gibberish / repetition quality signal: low entropy flags keyword-stuffed
  * or boilerplate-repetitive documents, abnormally high entropy flags
  * random-character noise. Complements the Gopher-style repetition stats
  * (q_text_repetition) with a single scalar cutoff usable in quality cuts.
  *
  * Semantics (the gate's oracle recomputes this relationally):
  *
  *   H(doc) = −(1/n) · Σ_occurrences q9(ln(c_tok / n)) / 1e9
  *
  * where `c_tok` is the token's in-document count, `n` the document token
  * count, and q9(x) = floor(x·1e9 + 0.5) — the established PlatformLn
  * recipe (per-term 1e-9 quantization BEFORE the sum, so the sum is an
  * exact integer and addition order cannot flip a bit; see
  * [[PlatformLn]]'s scaladoc for the libm-parity odds).
  *
  * Scale shape: the relational form is explode → per-(doc,token) count →
  * per-doc join + agg — two shuffles of the exploded corpus. This
  * expression is ONE map-only pass: an open-addressing count map per
  * document (capacity ≤ 2·distinct tokens), zero exchanges; parallelism =
  * input partitioning, stream-safe (stateless). Tokenization is the shared
  * [[Tokenize]] `split(trim(text), "\s+")` semantics, so the token universe
  * is identical to every other text operator.
  */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenEntropy.schema
  override def nullable: Boolean = true
  override def prettyName: String = "token_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_entropy expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TokenEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = (InternalRow) graft.functions.TokenEntropy.entropy($v.toString());
      if (${ev.value} == null) ${ev.isNull} = true;
    """)

  override protected def withNewChildInternal(c: Expression): TokenEntropy =
    copy(child = c)
}

object TokenEntropy {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  def entropy(text: String): InternalRow = {
    val (starts, ends) = Tokenize.boundaries(text)
    val n = starts.length

    // Open-addressing token→count map over (start, end) slices — no
    // per-token String allocation. Power-of-two capacity ≥ 2n so the
    // load factor stays ≤ 0.5. The long comparison guards the int
    // doubling against a pathological >2^30-token document.
    var cap = 8
    while (cap.toLong < n.toLong * 2 && cap < (1 << 30)) cap <<= 1
    val slotStart = new Array[Int](cap)
    val slotEnd = new Array[Int](cap)
    val slotCount = new Array[Int](cap)
    java.util.Arrays.fill(slotStart, -1)
    val mask = cap - 1

    def tokenHash(s: Int, e: Int): Int = {
      var h = 1
      var i = s
      while (i < e) { h = h * 31 + text.charAt(i); i += 1 }
      h
    }
    def tokenEq(s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
      if (e1 - s1 != e2 - s2) return false
      var i = 0
      val len = e1 - s1
      while (i < len) {
        if (text.charAt(s1 + i) != text.charAt(s2 + i)) return false
        i += 1
      }
      true
    }

    var distinct = 0L
    var t = 0
    while (t < n) {
      val s = starts(t); val e = ends(t)
      var slot = tokenHash(s, e) & mask
      var done = false
      while (!done) {
        if (slotStart(slot) < 0) {
          slotStart(slot) = s; slotEnd(slot) = e; slotCount(slot) = 1
          distinct += 1; done = true
        } else if (tokenEq(slotStart(slot), slotEnd(slot), s, e)) {
          slotCount(slot) += 1; done = true
        } else slot = (slot + 1) & mask
      }
      t += 1
    }

    // Σ over occurrences of q9(ln(c/n)) — grouped by distinct token
    // (c · q9(ln(c/n))), identical to the oracle's per-occurrence sum.
    // Exact accumulation: |q| ≤ ln(n)·1e9, so Σ c·q can reach ~n·H·1e9 —
    // past Long.MaxValue for a pathological ~2^30-token high-entropy
    // document. multiplyExact/addExact turn that silent wraparound into
    // a null row (same contract as the capacity guard above: documents
    // beyond the design envelope are out of scope, not silently wrong).
    var sq = 0L
    var slot = 0
    try {
      while (slot < cap) {
        if (slotStart(slot) >= 0) {
          val c = slotCount(slot)
          val q = math.floor(
            java.lang.Math.log(c.toDouble / n) * 1e9 + 0.5).toLong
          sq = java.lang.Math.addExact(sq, java.lang.Math.multiplyExact(c.toLong, q))
        }
        slot += 1
      }
    } catch {
      case _: ArithmeticException => return null
    }

    val h = -(sq.toDouble / n) / 1e9
    new GenericInternalRow(Array[Any](n.toLong, distinct, h))
  }

  def apply(text: Column): Column =
    ColumnBridge.toColumn(TokenEntropy(ColumnBridge.toExpression(text)))
}
