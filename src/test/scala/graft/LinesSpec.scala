package graft

import org.apache.spark.sql.Row

import graft.pipeline.Lines

class LinesSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 owns the first copies; "shared line" recurs everywhere; blank
  // lines are structure and must never be dedup candidates
  private def corpus = Seq(
    (1L, "alpha one\nshared line\n\nunique to one"),
    (2L, "shared line\nbeta two\n\nshared line"),
    (3L, "gamma three\nshared line\nalpha one"),
    (4L, "")).toDF("doc_id", "text")

  test("dedupLines keeps the corpus-global first copy, preserves structure") {
    val out = Lines.dedupLines(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 4L, 4L, "alpha one\nshared line\n\nunique to one"))
    // doc 2: both "shared line" copies lose to doc 1's; blank kept
    assert(out(1) === Row(2L, 4L, 2L, "beta two\n"))
    // doc 3: "shared line" and "alpha one" both lose to doc 1
    assert(out(2) === Row(3L, 3L, 1L, "gamma three"))
    // empty doc: one non-substantial empty line, kept untouched
    assert(out(3) === Row(4L, 1L, 1L, ""))
  }

  test("dedupLines within-doc repeats: only the first copy survives") {
    val df = Seq((7L, "same\nsame\nsame\nother")).toDF("doc_id", "text")
    val out = Lines.dedupLines(df, "doc_id", "text").collect()(0)
    assert(out === Row(7L, 4L, 2L, "same\nother"))
  }

  test("dedupLines is stable under repartitioning (order key is data)") {
    val base = Lines.dedupLines(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val shuffled = Lines.dedupLines(corpus.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(base === shuffled)
  }

  test("boilerplateLines drops every copy over the threshold") {
    // "shared line" occurs 4 times corpus-wide
    val out = Lines.boilerplateLines(corpus, "doc_id", "text", maxOccurrences = 3)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 4L, 3L, "alpha one\n\nunique to one"))
    assert(out(1) === Row(2L, 4L, 2L, "beta two\n"))
    assert(out(2) === Row(3L, 3L, 2L, "gamma three\nalpha one"))
    assert(out(3) === Row(4L, 1L, 1L, ""))
    // at threshold 4 nothing is hot: every doc keeps all lines
    val lax = Lines.boilerplateLines(corpus, "doc_id", "text", maxOccurrences = 4)
      .agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
    assert(lax === 12L)
  }

  test("stream gate (DropLines on the mined hot set) matches the batch operator") {
    val hot = Lines.hotLines(corpus, "text", maxOccurrences = 3)
      .select("line").as[String].collect().toSeq
    assert(hot === Seq("shared line"))
    val streamed = Lines.boilerplateLinesStream(corpus, hot, "text")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .orderBy("doc_id").collect().toSeq
    val batch = Lines.boilerplateLines(corpus, "doc_id", "text", maxOccurrences = 3)
      .orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
  }

  test("boilerplateLinesStream is stateless end-to-end over micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val hot = Seq("shared line")
    val in = MemoryStream[(Long, String)](spark)
    val docs = in.toDF().toDF("doc_id", "text")
    val q = Lines.boilerplateLinesStream(docs, hot, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("lines_stream_out").start()
    try {
      in.addData((1L, "alpha one\nshared line\n\nunique to one"))
      q.processAllAvailable()
      in.addData((2L, "shared line\nbeta two\n\nshared line"), (4L, ""))
      q.processAllAvailable()
      val out = spark.table("lines_stream_out")
        .select("doc_id", "n_lines", "n_kept", "clean_text")
        .orderBy("doc_id").collect()
      assert(out(0) === Row(1L, 4L, 3L, "alpha one\n\nunique to one"))
      assert(out(1) === Row(2L, 4L, 2L, "beta two\n"))
      assert(out(2) === Row(4L, 1L, 1L, ""))
      // stateless: no state store operators in the plan
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("minChars guards short lines from both policies") {
    val df = Seq(
      (1L, "x\nlong enough line\nx"),
      (2L, "x\nlong enough line")).toDF("doc_id", "text")
    // minChars=2: the 1-char "x" lines pass through everywhere; the long
    // line dedups to doc 1's copy
    val out = Lines.dedupLines(df, "doc_id", "text", minChars = 2)
      .orderBy("doc_id").collect()
    assert(out(0) === Row(1L, 3L, 3L, "x\nlong enough line\nx"))
    assert(out(1) === Row(2L, 2L, 1L, "x"))
  }

  test("paragraph granularity (sep = blank line): spans dedup whole, interior newlines kept") {
    val df = Seq(
      (1L, "alpha one\nalpha two\n\nbeta"),
      (2L, "alpha one\nalpha two\n\ngamma"), // para 1 is doc 1's copy
      (3L, "alpha one")) // a LINE of doc 1's para, not the whole para
      .toDF("doc_id", "text")
    val out = Lines.dedupLines(df, "doc_id", "text", sep = "\n\n")
      .orderBy("doc_id").collect()
    // doc 1 keeps both paragraphs; doc 2 loses the duplicated multi-line
    // paragraph AS A UNIT; doc 3's single line is a DIFFERENT span than
    // doc 1's two-line paragraph, so it survives
    assert(out(0) === Row(1L, 2L, 2L, "alpha one\nalpha two\n\nbeta"))
    assert(out(1) === Row(2L, 2L, 1L, "gamma"))
    assert(out(2) === Row(3L, 1L, 1L, "alpha one"))
    // line granularity on the same corpus behaves differently: doc 3's
    // "alpha one" IS doc 1's first line — dropped
    val lineOut = Lines.dedupLines(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(lineOut(2).getLong(2) === 0L)
  }
}
