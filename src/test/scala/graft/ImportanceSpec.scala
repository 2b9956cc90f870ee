package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Importance

/** DSIR-style importance weighting: exact-value pin against a driver-side
  * recomputation (both the gated linear form and the log-ratio form), the
  * production xxhash64 family, and the discriminative property the score
  * exists for (target-like docs outscore raw-like docs).
  */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // lower-60-bit md5 of a string — the oracle bucket family
  private def md5Base60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def featsOf(text: String): Seq[String] = {
    val toks = text.trim.split("\\s+", -1).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
  }

  /** Driver-side recomputation of the md5-family bucketed model. */
  private def expected(
      docs: Seq[(Long, String, Boolean)],
      buckets: Int,
      logForm: Boolean): Map[Long, (Long, Double)] = {
    val occ = docs.flatMap { case (id, text, tgt) =>
      featsOf(text).map(g => (id, tgt, md5Base60(g) % buckets))
    }
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cr = occ.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val t = ct.values.sum
    val r = cr.values.sum
    // logForm quantum is 1e-9, linear 1e-12 — the operator's convention
    val quant = if (logForm) 1000000000.0 else 1000000000000.0
    def q(p: Double): Long = math.floor(p * quant + 0.5).toLong
    def dq(f: Long): Long = {
      val pt = (ct.getOrElse(f, 0L) + 1).toDouble / (t + buckets).toDouble
      val pr = (cr.getOrElse(f, 0L) + 1).toDouble / (r + buckets).toDouble
      if (logForm) q(Math.log(pt) - Math.log(pr)) else q(pt) - q(pr)
    }
    occ.groupBy(_._1).map { case (id, fs) =>
      val sq = fs.map(o => dq(o._3)).sum
      id -> (fs.size.toLong, (sq.toDouble / fs.size) / quant)
    }
  }

  private val tiny = Seq(
    (1L, "spark join window join", true),
    (2L, "spark window scan", true),
    (3L, "rust borrow checker borrow", false),
    (4L, "rust scan borrow", false),
    (5L, "spark join borrow", false))

  test("linear gate form matches a driver-side recomputation exactly") {
    val df = tiny.toDF("doc_id", "text", "tgt")
    val got = Importance.importanceWeight(
        df, "doc_id", "text", col("tgt"), buckets = 4096, md5Family = true)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === expected(tiny, 4096, logForm = false))
  }

  test("log-ratio (DSIR) form matches the driver recomputation; families agree on sign") {
    val df = tiny.toDF("doc_id", "text", "tgt")
    val gotLog = Importance.importanceWeight(
        df, "doc_id", "text", col("tgt"), buckets = 4096,
        logForm = true, md5Family = true)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = expected(tiny, 4096, logForm = true)
    assert(gotLog.keySet === want.keySet)
    gotLog.foreach { case (id, (n, s)) =>
      assert(n === want(id)._1)
      assert(math.abs(s - want(id)._2) < 1e-9, s"doc $id")
    }
    // production xxhash64 family: same discriminative sign on every doc
    val gotProd = Importance.importanceWeight(
        df, "doc_id", "text", col("tgt"), buckets = 4096)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    gotLog.foreach { case (id, (_, s)) =>
      assert(s.sign === gotProd(id).sign, s"doc $id: families disagree on sign")
    }
  }

  test("target-vocabulary docs outscore raw-vocabulary docs (the selection property)") {
    // disjoint vocabularies: target docs about a/b/c, raw about x/y/z,
    // plus probe docs drawn from each vocabulary
    val docs = ((0L until 40L).map(i => (i, s"a${i % 3} b${i % 5} c${i % 7} a${i % 3}", true)) ++
      (40L until 200L).map(i => (i, s"x${i % 3} y${i % 5} z${i % 7} x${i % 3}", false))).toSeq
    val df = docs.toDF("doc_id", "text", "tgt")
    val scores = Importance.importanceWeight(df, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val tgtAvg = (0L until 40L).map(scores).sum / 40
    val rawAvg = (40L until 200L).map(scores).sum / 160
    assert(tgtAvg > 0 && rawAvg < 0 && tgtAvg > rawAvg)
    // exact-gram (buckets = 0) form preserves the separation
    val exact = Importance.importanceWeight(df, "doc_id", "text", col("tgt"), buckets = 0)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val tgtAvgE = (0L until 40L).map(exact).sum / 40
    val rawAvgE = (40L until 200L).map(exact).sum / 160
    assert(tgtAvgE > rawAvgE)
  }

  test("fused scoreWith(trainModel) equals the relational scorer bit-for-bit, both families") {
    val df = tiny.toDF("doc_id", "text", "tgt")
    for (md5 <- Seq(true, false)) {
      val model = Importance.trainModel(df, "doc_id", "text", col("tgt"),
        buckets = 4096, md5Family = md5)
      val fused = Importance.scoreWith(df, "doc_id", "text", model, md5Family = md5)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val rel = Importance.importanceWeight(df, "doc_id", "text", col("tgt"),
          buckets = 4096, md5Family = md5)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(fused === rel, s"md5Family=$md5")
    }
  }

  test("unseen buckets score with the smoothed c=0 default") {
    val df = tiny.toDF("doc_id", "text", "tgt")
    val model = Importance.trainModel(df, "doc_id", "text", col("tgt"),
      buckets = 4096, md5Family = true)
    val novel = Seq((99L, "zzzz qqqq wwww")).toDF("doc_id", "text")
    val got = Importance.scoreWith(novel, "doc_id", "text", model, md5Family = true)
      .as[(Long, Long, Double)].collect().head
    // driver-side: sum the model's own entries at the novel features'
    // buckets (seen or unseen — the array covers both uniformly)
    val fs = featsOf("zzzz qqqq wwww").map(g => (md5Base60(g) % 4096).toInt)
    val wantSum = fs.map(model(_)).sum
    assert(got._2 === fs.size.toLong)
    assert(got._3 === (wantSum.toDouble / fs.size) / 1000000000000.0)
  }

  test("streaming importance scoring is stateless and equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val df = tiny.toDF("doc_id", "text", "tgt")
    val model = Importance.trainModel(df, "doc_id", "text", col("tgt"))
    val in = MemoryStream[(Long, String)](spark)
    val q = Importance.scoreWith(in.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.outputMode("append")
      .format("memory").queryName("imp_out").start()
    try {
      in.addData((1L, "spark join window join"), (2L, "rust borrow"))
      q.processAllAvailable()
      in.addData((3L, "spark window zzzz"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "importance scoring must not create a state store")
      val got = spark.table("imp_out").as[(Long, Long, Double)].collect()
        .map(r => r._1 -> r._3).toMap
      val batch = Importance.scoreWith(
          Seq((1L, "spark join window join"), (2L, "rust borrow"), (3L, "spark window zzzz"))
            .toDF("doc_id", "text"), "doc_id", "text", model)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      assert(got === batch)
    } finally q.stop()
  }

  test("single-token and whitespace-edge docs score without error (tokenize contract)") {
    val df = Seq((1L, "solo", true), (2L, " padded  run ", false), (3L, "a b", false))
      .toDF("doc_id", "text", "tgt")
    val out = Importance.importanceWeight(df, "doc_id", "text", col("tgt"), md5Family = true)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // "solo": 1 unigram; " padded  run ": 2 unigrams + 1 bigram (trim +
    // \s+ split); "a b": 2 + 1
    assert(out === Map(1L -> 1L, 2L -> 3L, 3L -> 3L))
  }

  test("fused ImportanceBuckets equals the relational md5/xxhash bucket chain") {
    // the r19 fused bucketing must emit the SAME multiset of bucket ids
    // as explode(concat(WordNgrams 1, 2)) -> pmod(hash, B), both families,
    // including whitespace edges, unicode and the empty/null rows
    val texts = Seq(
      (1L, "spark join window join"),
      (2L, " padded  run "),
      (3L, "solo"),
      (4L, ""),
      (5L, null.asInstanceOf[String]),
      (6L, "naïve café — δξ tokens"),
      (7L, (1 to 40).map(i => s"w$i").mkString(" ")))
    val df = texts.toDF("doc_id", "text")
    for (md5Fam <- Seq(true, false); b <- Seq(17, 4096)) {
      val relBucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (md5Fam)
          g => pmod(conv(substring(md5(g), 1, 15), 16, 10).cast("long"), lit(b.toLong))
        else g => pmod(xxhash64(g), lit(b.toLong))
      val rel = df.select(
          col("doc_id"),
          explode(concat(
            graft.functions.WordNgrams(col("text"), 1),
            graft.functions.WordNgrams(col("text"), 2))).as("__g"))
        .select(col("doc_id"), relBucket(col("__g")).as("__f"))
        .as[(Long, Long)].collect().toSeq.groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      val fused = df.select(
          col("doc_id"),
          explode(graft.functions.ImportanceBuckets(col("text"), b, md5Fam)).as("__f"))
        .as[(Long, Long)].collect().toSeq.groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      assert(fused === rel, s"md5Family=$md5Fam buckets=$b")
    }
  }
}
