package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RAW word n-gram occurrences of a text column (duplicates KEPT, document
  * order) — the fused, single-pass form of
  *
  *   transform(sequence(0, size(toks) - n),
  *     i -> concat_ws(" ", slice(toks, i + 1, n)))
  *
  * whose interpreted higher-order-lambda chain costs ~0.4 ms/document
  * (every slice re-walks the token array; the generator input is an
  * interpreted tree). Used by repetition/quality stats, where — unlike
  * the Jaccard/[[WordNgramHashes]] path — the DUPLICATE n-grams are
  * precisely the signal, so no distinct and no hashing.
  *
  * Tokenization is the shared [[Tokenize]] contract (Spark's
  * `split(trim(text), "\\s+")`, DuckDB `string_split_regex` parity);
  * texts shorter than n tokens produce an empty array. Parity with the
  * compositional form is asserted in TextAnalysisSpec.
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val (starts, ends) = Tokenize.boundaries(s)
    val ntok = starts.length
    if (ntok < n) return new GenericArrayData(Array.empty[Any])

    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Any](ntok - n + 1)
    var g = 0
    while (g <= ntok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(s, starts(g + j), ends(g + j))
        j += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

object WordNgrams {
  def apply(c: Column, n: Int): Column =
    ColumnBridge.toColumn(WordNgrams(ColumnBridge.toExpression(c), n))
}
