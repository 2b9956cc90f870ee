package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused whole-line ban filter — the STREAM-side half of
  * [[graft.pipeline.Lines.boilerplateLines]]: drop every line whose exact
  * content is in `banLines` (the hot-line set mined from the standing
  * corpus — small by construction, so it rides as a reference object, the
  * decontaminate BenchShingleHit pattern). Lines shorter than `minChars`
  * after space-trim are document structure and always pass, mirroring the
  * batch operator's `substantial` guard.
  *
  * Output struct is the [[FilterLines]] shape: (n_lines, n_kept,
  * clean_text), '\n'-separated with Spark-split keep-trailing-empties
  * line counting. Stateless and join-free — safe on a stream (no state
  * store, no stream-static join to plan around).
  */
case class DropLines(
    child: Expression,
    banLines: Seq[String],
    minChars: Int) extends UnaryExpression {

  override def dataType: DataType = FilterLines.schema
  override def nullable: Boolean = true
  override def prettyName: String = "drop_lines"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"drop_lines expects string, got ${child.dataType.catalogString}")

  @transient private lazy val banSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    banLines.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    DropLines.clean(input.asInstanceOf[UTF8String].toString, banSet, minChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("banSet", banSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, v => {
      s"""${ev.value} = graft.functions.DropLines.clean(
         |  $v.toString(), $setRef, $minChars);""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): DropLines =
    copy(child = c)
}

object DropLines {

  /** One pass over the document: split on '\n', test each line's
    * space-trimmed length (the batch operator trims SPACES only — Spark
    * and DuckDB `trim` semantics) and exact content against the ban set.
    */
  def clean(
      text: String,
      ban: java.util.HashSet[String],
      minChars: Int): InternalRow = {
    val sb = new java.lang.StringBuilder(text.length)
    var nLines = 0L
    var nKept = 0L
    var lineStart = 0
    val len = text.length
    while (lineStart <= len) {
      var lineEnd = lineStart
      while (lineEnd < len && text.charAt(lineEnd) != '\n') lineEnd += 1
      nLines += 1
      // space-trimmed length (parity with trim(col) in the batch twin)
      var a = lineStart
      var b = lineEnd
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      val substantial = (b - a) >= minChars
      val keep = !substantial || !ban.contains(text.substring(lineStart, lineEnd))
      if (keep) {
        if (nKept > 0) sb.append('\n')
        sb.append(text, lineStart, lineEnd)
        nKept += 1
      }
      lineStart = lineEnd + 1
    }
    new GenericInternalRow(Array[Any](
      nLines, nKept, UTF8String.fromString(sb.toString)))
  }

  def apply(text: Column, banLines: Seq[String], minChars: Int): Column =
    ColumnBridge.toColumn(DropLines(
      ColumnBridge.toExpression(text), banLines, minChars))
}
