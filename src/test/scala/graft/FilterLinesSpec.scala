package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.FilterLines

class FilterLinesSpec extends SparkSpec {
  import spark.implicits._

  private val Ban = Seq("spam", "viagra")

  /** Compositional Spark witness of the same rule set: split →
    * higher-order filter → array_join. Interpreted (CodegenFallback
    * lambdas) — spec-only; the fused expression is the production path.
    */
  private def witness(minWords: Int, ban: Seq[String], punct: Boolean) = {
    val lines = split(col("text"), "\n", -1)
    val words = (l: org.apache.spark.sql.Column) =>
      filter(split(l, "[ \\t\\x0b\\f\\r]+", -1), w => length(w) > 0)
    val keepable = (l: org.apache.spark.sql.Column) => {
      val w = words(l)
      val base = size(w) >= minWords &&
        (if (ban.isEmpty) lit(true)
         else size(filter(w, t => t.isin(ban: _*))) === 0)
      if (!punct) base
      else {
        val t = regexp_replace(l, "[ \\t\\x0b\\f\\r]+$", "")
        base && substring(t, -1, 1).isin(".", "!", "?", "\"")
      }
    }
    struct(
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, keepable)).cast("long").as("n_kept"),
      array_join(filter(lines, keepable), "\n").as("clean_text"))
  }

  private def check(docs: Seq[String], minWords: Int, ban: Seq[String],
      punct: Boolean): Unit = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
      FilterLines(col("text"), minWords, ban, punct).as("r"))
      .select("doc_id", "r.*").orderBy("doc_id").collect().toSeq
    val ref = df.select(col("doc_id"),
      witness(minWords, ban, punct).as("r"))
      .select("doc_id", "r.*").orderBy("doc_id").collect().toSeq
    assert(fused == ref)
  }

  private val adversarial = Seq(
    "",                                       // one empty line
    "\n",                                     // two empty lines
    "one two three.\nspam here today.\nok ok ok!",
    "   \t  ",                                // whitespace-only line
    "ends no punct here\nends with dot here.",
    "short.\na b c d e f.",
    "tab\tseparated words here.\r",           // \r is line-local whitespace
    "a\u000Bb c d.",                          // vertical tab separates words
    "multi\n\n\nblank\nlines here ok.",
    "trailing newline keeps empty line.\n",
    "\"quoted end\"\nbang end!\nq end?\ndot end.\nnone end",
    "spam\nviagra x y z.\nclean line of words.")

  test("fused == compositional witness across rule combinations") {
    for {
      minWords <- Seq(0, 1, 3)
      punct <- Seq(false, true)
      ban <- Seq(Nil, Ban)
    } check(adversarial, minWords, ban, punct)
  }

  test("clean_text joins kept lines in original order; counts exact") {
    val out = Seq((1L, "keep me now.\ndrop\nalso keep this one!\nspam spam spam."))
      .toDF("doc_id", "text")
      .select(FilterLines(col("text"), 3, Ban, requireTerminalPunct = true).as("r"))
      .select("r.*").head()
    assert(out === Row(4L, 2L, "keep me now.\nalso keep this one!"))
  }

  test("null text yields null; empty text is one dropped empty line") {
    val df = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), FilterLines(col("text"), 1, Nil, false).as("r"))
      .orderBy("doc_id")
    val rows = df.collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getStruct(1) === Row(1L, 0L, ""))
  }

  test("min_words=0 without punct rule keeps every line (identity join)") {
    val text = "a\n\nb c\n"
    val out = Seq(Tuple1(text)).toDF("text")
      .select(FilterLines(col("text"), 0, Nil, false).as("r"))
      .select("r.*").head()
    assert(out === Row(4L, 4L, text))
  }

  test("ban match is exact token, not substring") {
    // "spammer" contains ban word "spam" as substring — must NOT ban
    val out = Seq(Tuple1("spammer writes words here.\nspam writes words here."))
      .toDF("text")
      .select(FilterLines(col("text"), 1, Ban, false).as("r"))
      .select("r.*").head()
    assert(out === Row(2L, 1L, "spammer writes words here."))
  }

  test("SQL registration: filter_lines callable and equal to the column form") {
    graft.functions.GraftExtensions.register(spark)
    val df = Seq((1L, "good line here.\nspam line here.")).toDF("doc_id", "text")
    df.createOrReplaceTempView("fl_docs")
    val viaSql = spark.sql(
      "SELECT filter_lines(text, 2, 'spam,viagra', true) AS r FROM fl_docs")
      .select("r.*").head()
    val viaCol = df.select(FilterLines(col("text"), 2, Ban, true).as("r"))
      .select("r.*").head()
    assert(viaSql === viaCol)
    assert(viaSql === Row(2L, 1L, "good line here."))
  }

  test("whole-stage codegen keeps the expression in a codegen span") {
    val df = graft.core.Tables.documents(spark, sf("sf0.001"))
      .select(FilterLines(col("text"), 2, Ban, false).as("r"))
    // `*(n)` prefixes mark operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [filter_lines("), plan)
    // and it actually runs (500 docs, all single-line)
    val agg = df.select(sum("r.n_lines").as("nl"), sum("r.n_kept").as("nk")).head()
    assert(agg.getLong(0) === 500L)
    assert(agg.getLong(1) <= 500L)
  }
}
