package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def cols = graft.core.Tables.documents(spark, sf("sf0.001")).columns.toSeq

  // ratios are undefined on zero-char text (ANSI divide-by-zero in both the
  // compositional and fused forms — the operator contract assumes text)
  private def corpus = graft.core.Tables.documents(spark, sf("sf0.001")).limit(200)
    .union(Seq(
      (90003L, "\tder die das, und ist! 42", "x", "x", 0L), // leading tab + markers
      (90004L, "的 是 了 在 我", "x", "x", 0L),             // zh markers
      (90005L, "trailing tab doc\t", "x", "x", 0L))        // Spark split keeps ["" ] tail
      .toDF(cols: _*))

  private def langCorpus = corpus
    .union(Seq(
      (90001L, "", "x", "x", 0L),    // empty → 1 empty token
      (90002L, "   ", "x", "x", 0L)) // spaces only
      .toDF(cols: _*))

  test("fused TextProfile docStats equals the compositional column form") {
    val toks = TextAnalysis.tokens(col("text"))
    val compositional = corpus.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        // the compositional lambda witness, inline (deleted from the API
        // so the interpreted form can't reach production paths)
        size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*)))
          .cast("long").as("n_stopwords"),
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
          .cast("long").as("__sumlen"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.digitRatio(col("text")).as("digit_ratio"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_bpe_tokens"), col("n_stopwords"),
        (col("__sumlen").cast("double") / col("n_tokens")).as("mean_token_len"),
        col("punct_ratio"), col("digit_ratio"),
        (least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4) +
          (lit(1.0) - col("punct_ratio")) * lit(0.2) +
          (lit(1.0) - col("digit_ratio")) * lit(0.2) +
          least((col("n_stopwords").cast("double") / col("n_tokens")) * lit(4.0), lit(1.0)) * lit(0.2))
          .as("quality"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fused = TextAnalysis.docStats(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fused === compositional) // bit-identical longs and doubles
  }

  test("fused docLangId equals the compositional argmax, ties and und included") {
    // inline compositional argmax witness (one lambda filter per language)
    val ltoks = TextAnalysis.tokens(col("text"))
    val folded = TextAnalysis.LangMarkers.keys.toSeq.sorted
      .map(l => struct(
        size(filter(ltoks, t => t.isin(TextAnalysis.LangMarkers(l): _*))).as("s"),
        lit(l).as("l")))
      .reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    val compositional = langCorpus
      .select(
        col("doc_id"),
        when(folded.getField("s") > 0, folded.getField("l")).otherwise(lit("und"))
          .as("lang_pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fused = TextAnalysis.docLangId(langCorpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fused === compositional)
    assert(fused(90003L) === "de")
    assert(fused(90004L) === "zh")
    assert(fused(90002L) === "und")
  }

  test("fused TextFingerprint equals the compositional md5(normalize) form") {
    // edge cases the char-loop must get right: leading tab (survives the
    // spaces-only trim → leading " " after collapse), punct splitting a
    // whitespace run in two, non-ASCII lowercase, empty and spaces-only text
    val edge = corpus.union(Seq(
        (91001L, "", "x", "x", 0L),
        (91002L, "   ", "x", "x", 0L),
        (91003L, "A .\tB", "x", "x", 0L),     // punct inside a \s run
        (91004L, " \t. \t ", "x", "x", 0L),   // collapses to " "
        (91005L, "ÄÖÜ Straße ÇŞ", "x", "x", 0L), // non-ASCII lower path
        (91006L, "xy\n\rz", "x", "x", 0L)) // every \s class member
      .toDF(cols: _*))
    val both = edge.select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fused"),
        TextAnalysis.fingerprintCompositional(col("text")).as("comp"))
      .collect()
    both.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"doc ${r.getLong(0)}")
    }
  }

  test("TextProfile is evaluated once per row, not once per consumer") {
    val plan = TextAnalysis.docStats(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val evals = "text_profile".r.findAllIn(plan).length
    assert(evals === 1, s"text_profile appears $evals times in the physical plan")
  }

  test("repetitionStats matches hand-computed fractions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // 2-grams: [a b, b a, a b, b c] -> T=4 mx=2 dup=2
      (2L, "x y z"),     // [x y, y z]                    -> T=2 mx=1 dup=0
      (3L, "w"))         // no 2-grams -> absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got === Seq((1L, 0.5, 0.5), (2L, 0.5, 0.0)))
  }

  test("fused WordNgrams equals the compositional transform/slice chain") {
    import spark.implicits._
    val docs = Seq(
      "a b a b c", "x", "", "  padded  ends  ", "one two", "t\tta b\nc")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val compositional = when(
      size(toks) >= 2,
      transform(
        sequence(lit(0), size(toks) - lit(2)),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(
      graft.functions.WordNgrams(col("text"), 2).as("fused"),
      compositional.as("comp"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (f, c) => assert(f === c) }
  }

  test("piiScan counts and redacts emails, IPs, phones, and id numbers") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to jane.doe+spam@mail.example.org or call +6494123456"),
      (2L, "server 192.168.1.200 logged account 123456789 twice: 123456789"),
      (3L, "clean text with no personal data at all"),
      (4L, "ip 10.0.0.1 and mail a@b.co and num 999999"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((1L, 1L, 0L, 1L, 1L, // phone digits also hit the id-run rule
      "write to [EMAIL] or call [PHONE]")))
    assert(got(1) === ((2L, 0L, 1L, 0L, 2L,
      "server [IP] logged account [ID] twice: [ID]")))
    assert(got(2) === ((3L, 0L, 0L, 0L, 0L,
      "clean text with no personal data at all"))) // no false positives
    assert(got(3) === ((4L, 1L, 1L, 0L, 1L,
      "ip [IP] and mail [EMAIL] and num [ID]")))
  }

  test("rareWordStats: corpus DF drives per-doc rare counts (spam-safe)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare1"),
      (2L, "common rare2 rare2"), // rare2 spammed in ONE doc: df stays 1
      (3L, "common common common"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rareWordStats(docs, "doc_id", "text", minDf = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 1L, 1.0 / 3),
      (2L, 3L, 2L, 2.0 / 3),
      (3L, 3L, 0L, 0.0)))
  }

  test("cutByMeanOf keeps exactly the rows at/above the integer mean") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 41L))
      .toDF("id", "m") // mean = 25.25
    val kept = TextAnalysis.cutByMeanOf(df, "m")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 4L))
  }

  test("lmFamiliarity averages hand-computed bigram conditionals; log twin ranks alike") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b","b a","a b"
      (2L, "a b c"),     // bigrams: "a b","b c"
      (3L, "z"))         // no bigrams -> absent from output
      .toDF("doc_id", "text")
    val got = TextAnalysis.lmFamiliarity(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // c2: "a b"=3, "b a"=1, "b c"=1; c1: a=3, b=2
    // p: "a b"=1.0, "b a"=0.5, "b c"=0.5  (quantization is exact here)
    val s1 = ((1e12 + 0.5e12 + 1e12) / 3) / 1e12
    val s2 = ((1e12 + 0.5e12) / 2) / 1e12
    assert(got === Seq((1L, 3L, s1), (2L, 2L, s2)))

    // cross-entropy twin: same relative order (doc 1's bigrams are more
    // probable on average), negative log-probs
    val lg = TextAnalysis.lmFamiliarity(docs, "doc_id", "text", logForm = true)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(lg.map(_._1) === Seq(1L, 2L))
    assert(lg(0)._3 > lg(1)._3 && lg.forall(_._3 <= 0.0))

    // the salted hot-gram path changes row ROUTING only — scores are
    // the same quantized integer sums, so the output is bit-identical
    // (here hotK covers the whole vocabulary: every gram rides the salt)
    val salted = TextAnalysis.lmFamiliarity(
        docs, "doc_id", "text", hotK = 16, saltFanout = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(salted === got)
  }

  test("bm25TopK ranks by hand-computed BM25 scores; log-idf twin agrees") {
    import spark.implicits._
    // 4 docs, query = {x, y}: doc 1 heavy in x, doc 2 has both terms,
    // doc 3 long with one y, doc 4 matches nothing. Doc 2 is TAB-edged:
    // Spark's trim strips only spaces, so split keeps a leading ""
    // token — dl must count 3 real tokens, not 4 (the r10-review bug:
    // dl diverged from the oracle's empty-filtered count)
    val docs = Seq(
      (1L, "x x x a"),
      (2L, "\tx y b"),
      (3L, "y c c c c c c c"),
      (4L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("x", "y"), topK = 3)
      .as[(Int, Long, Double)].collect().toSeq

    // hand-computed reference (same quantization contract)
    val n = 4.0; val avgdl = (4 + 3 + 8 + 3) / 4.0
    val k1 = 1.25; val b = 0.75
    def idf(df: Double) = (n - df + 0.5) / (df + 0.5)
    def part(tf: Double, dl: Double) =
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def q(c: Double) = math.floor(c * 1e9 + 0.5).toLong
    val s1 = q(idf(2) * part(3, 4))                      // x only
    val s2 = q(idf(2) * part(1, 3)) + q(idf(2) * part(1, 3)) // x + y
    val s3 = q(idf(2) * part(1, 8))                      // y only
    val expect = Seq((1L, s1), (2L, s2), (3L, s3))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, s), i) => (i + 1, id, s / 1e9) }
    assert(got === expect)

    // log-idf production twin: same ranking when all df are equal
    // (ln is monotone in the rational idf)
    val logTop = TextAnalysis.bm25TopK(
        docs, "doc_id", "text", Seq("x", "y"), topK = 3, idfLog = true)
      .as[(Int, Long, Double)].collect().toSeq
    assert(logTop.map(r => (r._1, r._2)) === got.map(r => (r._1, r._2)))
    assert(logTop.forall(_._3 > 0))
  }

  test("PlatformLn is Math.log (not StrictMath), codegen'd, null-safe") {
    import spark.implicits._
    import graft.functions.PlatformLn
    // inputs chosen from the scorers' ranges, incl. one where the two
    // JVM logs are known to differ (found by scanning rationals: the
    // gate exists BECAUSE Spark's builtin log() is StrictMath)
    val xs = Seq(0.5, 1.0, 1.5, 2.0 / 3.0, 123456.0 / 7.0, 1e-7, 1.0 + 1e5)
    val got = xs.toDF("x").select(PlatformLn(col("x")).as("l"))
      .as[Double].collect().toSeq
    assert(got === xs.map(java.lang.Math.log))
    // at least one input in the broader domain separates the families —
    // otherwise this pin is vacuous (both logs agree on ~94% of inputs)
    val sep = (1 to 200000).map(i => (i.toDouble + 0.5) / 3.0)
      .exists(x => java.lang.Math.log(x) != StrictMath.log(x))
    assert(sep, "Math.log and StrictMath.log agreed everywhere sampled")
    // codegen (no CodegenFallback) and null propagation — a non-local
    // source so the projection isn't constant-folded away
    val plan = spark.range(0, 10).select(PlatformLn(col("id").cast("double") + 1.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val n = Seq[java.lang.Double](null).toDF("x")
      .select(PlatformLn(col("x"))).head()
    assert(n.isNullAt(0))
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT platform_ln(CAST(2.0 AS DOUBLE)) AS l").head().getDouble(0)
      === java.lang.Math.log(2.0))
  }

  test("cutByQuantileOf keeps ~the top 1-q fraction (sandwich property)") {
    import spark.implicits._
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("m", col("id") % 1000)
    val frac = TextAnalysis.cutByQuantileOf(df, "m", 0.9).count() / 10000.0
    // approx_percentile at default accuracy is near-exact on 1000 distinct
    // values; allow a loose bracket around the requested 10% tail
    assert(frac > 0.05 && frac < 0.15, s"kept fraction $frac")
  }

  test("cutByQuantileOfPerGroup: each group keeps ~its own top fraction; corpus unshuffled") {
    import spark.implicits._
    // three sources with DISJOINT metric ranges: a global cut would keep
    // none of the weakest source — the per-group cut keeps its head too
    val df = spark.range(0, 9000).toDF("id")
      .withColumn("src", concat(lit("s"), col("id") % 3))
      .withColumn("m",
        (col("id") % 1000) + (col("id") % 3) * 10000) // s0: 0..999, s1: 10k.., s2: 20k..
    val kept = TextAnalysis.cutByQuantileOfPerGroup(df, "src", "m", 0.8)
    val byGroup = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(byGroup.keySet === Set("s0", "s1", "s2"), "every source keeps its head")
    byGroup.foreach { case (g, n) =>
      val frac = n / 3000.0
      assert(frac > 0.1 && frac < 0.3, s"group $g kept fraction $frac")
    }
    // per-group floor: every kept row sits at/above its group's q-quantile
    // (disjoint ranges make the check exact: s1's 80th pctile is 10800)
    val minKept = kept.filter(col("src") === "s1").agg(min(col("m")))
      .collect()(0).getLong(0)
    assert(minKept >= 10700, s"s1 floor $minKept")
    // the threshold join is a broadcast — the corpus side never shuffles
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"))
  }

  test("tfidfTopTerms: rare repeated terms outrank common ones, exact-integer score") {
    val docs = Seq(
      (1L, "alpha alpha shared shared shared"),
      (2L, "beta shared"),
      (3L, "gamma shared"),
      (4L, "delta shared")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .collect()
    // doc 1: alpha tf=2 df=1 -> 2e6; shared tf=3 df=4 -> 750000
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getString(2), r.getLong(5))).toSeq ===
      Seq(("alpha", 2000000L), ("shared", 750000L)))
    // singleton docs: the unique term (1e6) beats shared (250000)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(2)).toSeq === Seq("beta", "shared"))
    assert(d2.map(r => r.getLong(5)).toSeq === Seq(1000000L, 250000L))
  }
}
