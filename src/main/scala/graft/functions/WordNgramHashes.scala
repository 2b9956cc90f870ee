package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values of a text's word n-gram shingles — the
  * fused, single-pass form of
  *
  *   array_sort(transform(array_distinct(transform(sequence(...),
  *     i -> concat_ws(" ", slice(split(trim(text), "\s+"), i+1, n)))),
  *     s -> xxhash64(s)))
  *
  * which costs ~0.44 ms/document interpreted (every step is a higher-order
  * lambda). This expression does one byte scan + n-gram hash loop per row
  * (~10 µs/doc) and produces BIT-IDENTICAL hashes: shingle strings are
  * materialized as UTF8 bytes and hashed with Spark's own
  * XxHash64Function(seed 42), exactly like the built-in `xxhash64`.
  *
  * Tokenization matches `split(trim(text), "\\s+")` for space-separated
  * corpora (trim strips 0x20 only; runs of Java whitespace separate
  * tokens); parity with the compositional form is asserted on the real
  * corpus in DedupSpec.
  */
case class WordNgramHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_ngram_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngram_hashes expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // the one shared Spark-split tokenizer (see Tokenize's scaladoc for
    // the trim / edge-empty-token contract)
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Long])

    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Long](ntok - n + 1)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      out(g) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      g += 1
    }
    // sorted distinct
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(c: Expression): WordNgramHashes =
    copy(child = c)
}

object WordNgramHashes {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.toColumn(WordNgramHashes(ColumnBridge.toExpression(c), n))
}

/** POSITIONAL word n-gram hashes: element `i` (0-based) is the xxhash64 of
  * the n-gram starting at token `i` — no dedup, no sort, so array index IS
  * token position. The duplicated-span operators need positions (a span is
  * `[i, i+n)` tokens), which the sorted-distinct [[WordNgramHashes]] form
  * deliberately discards for the set-measure ops. Same tokenizer, same
  * hash function (Spark's xxhash64, seed 42), so a value-level join
  * between the two forms is well-defined. Empty array when the document
  * has fewer than n tokens.
  */
case class WordNgramPosHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_ngram_pos_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngram_pos_hashes expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Long])
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Long](ntok - n + 1)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      out(g) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNgramPosHashes =
    copy(child = c)
}

object WordNgramPosHashes {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.toColumn(WordNgramPosHashes(ColumnBridge.toExpression(c), n))
}
