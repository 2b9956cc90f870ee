package graft

import graft.pipeline.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 1
    (4L, "completely different words about spark query engines and big data"),
    (5L, "another unrelated sentence talking about music and art and cooking"))
    .toDF("doc_id", "text")

  test("WordNgramHashes equals the compositional shingle-hash pipeline") {
    import org.apache.spark.sql.functions._
    // edge docs: leading tab (Java split KEEPS one leading empty token —
    // the shingle " a b" differs from "a b"), trailing tab (Java split
    // DROPS trailing empties), interior whitespace runs
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(100)
      .union(Seq(
        (91001L, "\talpha beta gamma delta", "x", "x", 0L),
        (91002L, "alpha beta gamma delta\t", "x", "x", 0L),
        (91003L, "alpha \t beta\n\ngamma  delta", "x", "x", 0L))
        .toDF(docs0Cols: _*))
    val compositional = docs.select(
      col("doc_id"),
      array_sort(transform(Dedup.wordShingles(col("text"), 3), s => xxhash64(s))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs.select(
      col("doc_id"),
      graft.functions.WordNgramHashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === compositional) // bit-identical hash sets
  }

  test("MinHashSignature equals the relational 64-min-buffer aggregation") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(100)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size(col("__set")) > 0)
    val k = 64
    val minCols = (0 until k).map(i => min(xxhash64(lit(i), col("__s"))).as(s"__m$i"))
    val relational = sets
      .select(col("__id"), explode(col("__set")).as("__s"))
      .groupBy("__id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("__id"), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fused = sets
      .select(col("__id"), graft.functions.MinHashSignature(col("__set"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused === relational) // bit-identical signatures
  }

  test("SimHash60 equals the relational md5 bit-vote aggregation") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(100)
      .union(Seq((90001L, "", "x", "x", 0L), (90002L, "  ", "x", "x", 0L),
        (90003L, "\tleading tab", "x", "x", 0L)).toDF(docs0Cols: _*))
    val toks = split(trim(col("text")), "\\s+")
    val bitSums = (0 until 60).map(j =>
      sum(shiftright(col("__h"), j).bitwiseAND(1)).as(s"__b$j"))
    val aggd = docs
      .select(col("doc_id").as("__id"), explode(toks).as("__t"))
      .select(
        col("__id"),
        conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long").as("__h"))
      .groupBy("__id")
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("__n")): _*)
    val fpExpr = (0 until 60)
      .map(j => when(col(s"__b$j") * 2 > col("__n"), lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    val relational = aggd.select(col("__id"), fpExpr.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused === relational) // bit-identical fingerprints, edge cases included
  }

  private lazy val docs0Cols =
    graft.core.Tables.documents(spark, sf("sf0.001")).columns.toSeq

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(corpus, "text", "doc_id")
      .orderBy("canonical_id").collect()
    assert(out.length === 4)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dupGroup.getAs[Long]("canonical_id") === 1L)
  }

  test("ngram jaccard finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs.contains((1L, 2L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs: asymmetric truncation dup, symmetric exact dup, no noise") {
    import org.apache.spark.sql.functions._
    // doc 6 is a strict PREFIX of doc 1: every shingle of 6 lives in 1, so
    // C(6→1) = 1.0; the reverse direction scores |6|/|1| < 0.7 and must
    // NOT appear — the asymmetry Jaccard can't express (J(1,6) ≈ 0.58
    // would need a threshold low enough to drown in noise)
    val docs = corpus.union(Seq(
      (6L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
    val rows = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact dups 1/2 both ways; near dup 3 both ways vs each copy
    // (10/12 shared trigrams); prefix 6 INTO 1, 2, and 3 — never out of
    assert(rows.map(t => (t._1, t._2)).toSet === Set(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L),
      (6L, 1L), (6L, 2L), (6L, 3L)))
    val byPair = rows.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair((6L, 1L)) === 1.0 && byPair((1L, 2L)) === 1.0)
    assert(byPair((3L, 1L)) === 10.0 / 12.0)
    // jaccard at the same threshold: exact dups plus the near-dup pairs
    // (10/14 ≈ 0.714) — but NOT the prefix doc (7/12 ≈ 0.58), the
    // subsumption case only containment catches
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ngram maxDf cut drops hot-shingle-only candidates, keeps real dups") {
    // docs 6/7 share ONLY the boilerplate opener (a hot shingle present in
    // every doc); 1/2 are genuine dups through distinctive shingles
    val boiler = "terms of service apply here"
    val withBoiler = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (2L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (6L, s"$boiler one unique sentence about gardening tools"),
      (7L, s"$boiler a wholly separate line regarding astronomy charts"))
      .toDF("doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(withBoiler, "doc_id", "text", 3, 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((6L, 7L))) // connected only via the boilerplate
    val cut = Dedup.ngramJaccardPairs(withBoiler, "doc_id", "text", 3, 0.05, maxDf = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut.contains((1L, 2L)))   // real dup survives (distinctive shingles)
    assert(!cut.contains((6L, 7L)))  // hot-shingle-only pair gone
  }

  test("dupSpanCoverage: interval union, within-doc repeats, short docs") {
    // corpus gram counts (trigrams): "a b c" appears 4× (docs 1, 2, and
    // twice in 6), "p q r" 2× (docs 3, 7), "m m m" 4× (all within doc 4);
    // every other gram once
    val docs = Seq(
      (1L, "a b c d e f"),        // dup start {0} → 3 of 6
      (2L, "a b c x y z"),        // dup start {0} → 3 of 6
      (3L, "p q r s t u"),        // dup start {0} → 3 of 6
      (4L, "m m m m m m"),        // starts {0,1,2,3} → 1+1+1+3 = 6 of 6
      (5L, "hello"),              // shorter than n → no grams, 0 coverage
      (6L, "a b c z z a b c"),    // starts {0,5} → 3 + 3 = 6 of 8
      (7L, "p q r w w v"))        // dup start {0} → 3 of 6
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanCoverage(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac"))))
      .toMap
    assert(out(1L) === ((6L, 3L, 0.5)))
    assert(out(2L) === ((6L, 3L, 0.5)))
    assert(out(3L) === ((6L, 3L, 0.5)))
    assert(out(4L) === ((6L, 6L, 1.0)))   // within-doc repetition counts
    assert(out(5L) === ((1L, 0L, 0.0)))   // no grams, still reported
    assert(out(6L) === ((8L, 6L, 0.75)))  // overlapping spans union once
    assert(out(7L) === ((6L, 3L, 0.5)))
    // a stricter occurrence floor: "p q r" (2 occurrences) dies at 3,
    // "a b c" (4 occurrences) survives
    val strict = Dedup.dupSpanCoverage(docs, "doc_id", "text", 3, minOccurrences = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(strict(3L) === 0L && strict(1L) === 3L && strict(4L) === 6L)
  }

  test("dupSpanClean removes exactly the covered spans, preserves order") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "p q r s t u"),
      (4L, "m m m m m m"),
      (5L, "hello"),
      (6L, "a b c z z a b c"),
      (7L, "p q r w w v"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpanClean(docs, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("clean_text"))))
      .toMap
    assert(out(1L) === ((3L, "d e f")))
    assert(out(2L) === ((3L, "x y z")))
    assert(out(3L) === ((3L, "s t u")))
    assert(out(4L) === ((0L, "")))        // fully duplicated → empty
    assert(out(5L) === ((1L, "hello")))   // too short for grams → untouched
    assert(out(6L) === ((2L, "z z")))     // middle survives both spans
    assert(out(7L) === ((3L, "w w v")))
  }

  test("contaminatedSpan coverage/clean cut exactly the bench-shared spans") {
    import org.apache.spark.sql.functions.col
    val train = Seq(
      (1L, "a b c d e f"),        // leaks "a b c" → 3 of 6 cut
      (2L, "x y z a b c"),        // leaks at the tail → 3 of 6 cut
      (3L, "s t u v w"),          // clean
      (4L, "a b c d e f a b c"),  // two leaked spans + "c d e"/"d e f" etc? only bench grams cut
      (5L, "hi"))                 // too short for grams
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")

    val cov = Dedup.contaminatedSpanCoverage(train, bench, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cont_tokens"))))
      .toMap
    // only contaminated docs are reported
    assert(cov.keySet === Set(1L, 2L, 4L))
    assert(cov(1L) === ((6L, 3L)))
    assert(cov(2L) === ((6L, 3L)))
    assert(cov(4L) === ((9L, 6L)))  // spans at 0 and 6, disjoint

    val clean = Dedup.contaminatedSpanClean(train, bench, "doc_id", "text", 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))))
      .toMap
    // ALL training docs pass through the clean form
    assert(clean.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(clean(1L) === ((6L, 3L, "d e f")))
    assert(clean(2L) === ((6L, 3L, "x y z")))
    assert(clean(3L) === ((5L, 5L, "s t u v w")))  // untouched
    assert(clean(4L) === ((9L, 3L, "d e f")))
    assert(clean(5L) === ((1L, 1L, "hi")))
    // coverage + kept sum to n_tokens on every contaminated doc
    for (id <- cov.keySet)
      assert(cov(id)._2 + clean(id)._2 === cov(id)._1)
  }

  test("decontaminateHybrid output is identical to the exact join") {
    val bench = Seq(
      (100L, "the quick brown fox"),
      (101L, "what is the capital of france is it paris"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "completely unrelated words here and more of them"),
      (3L, "capital of france is paris"),
      (4L, "short doc"),
      (5L, "yet another clean document about something else"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val hybrid = Dedup.decontaminateHybrid(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(hybrid === exact)
    assert(exact.map(_.head) === Seq(1L, 3L))
    Dedup.unpersistIntermediates()
  }

  test("ngram maxCandidates budget fails fast on dense vocab, passes under") {
    // corpus is tiny: its true candidate volume is a handful of pairs, so
    // budget=1 must abort pre-shuffle and a loose budget must be silent
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5,
        maxCandidates = Some(1L)).collect()
    }
    assert(e.getMessage.contains("minhashLshPairs"))
    val ok = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5,
      maxCandidates = Some(1000000L)).collect()
    assert(ok.nonEmpty)
    // hot shingles are CUT, so they must not count against the budget:
    // every pair here rides one boilerplate shingle; with the cut active
    // the kept-candidate estimate is 0 and the tightest budget passes
    val boiler = "terms of service apply here"
    val hotOnly = Seq(
      (6L, s"$boiler one unique sentence about gardening tools"),
      (7L, s"$boiler a wholly separate line regarding astronomy charts"))
      .toDF("doc_id", "text")
    val cutOk = Dedup.ngramJaccardPairs(hotOnly, "doc_id", "text", 3, 0.05,
      maxDf = Some(1), maxCandidates = Some(0L)).collect()
    assert(cutOk.isEmpty)
  }

  test("decontaminate maxMatches budget fails fast, silent under") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.decontaminate(corpus, bench, "doc_id", "text", 3,
        maxMatches = Some(0L)).collect()
    }
    assert(e.getMessage.contains("BenchShingleHit"))
    val ok = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3,
      maxMatches = Some(1000000L)).collect()
    assert(ok.length === Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
      .collect().length)
  }

  test("lsh band + simhash quarter budgets fail fast on degenerate corpora, silent under") {
    // 40 identical docs: every band bucket / quarter block collapses to
    // one key → the self-join is output-quadratic (40·39/2 ≥ 700 pairs)
    val degenerate = (1L to 40L)
      .map(i => (i, "the exact same sentence repeated everywhere"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalStateException] {
      Dedup.minhashLshPairs(degenerate, "doc_id", "text",
        maxCandidates = Some(100L)).collect()
    }
    assert(e1.getMessage.contains("exact"))
    val e1m = intercept[IllegalStateException] {
      Dedup.minhashLshPairsMd5(degenerate, "doc_id", "text",
        maxCandidates = Some(100L)).collect()
    }
    assert(e1m.getMessage.contains("exact"))
    val e2 = intercept[IllegalStateException] {
      Dedup.simhashPairs(degenerate, "doc_id", "text",
        maxCandidates = Some(100L)).collect()
    }
    assert(e2.getMessage.contains("minhashLshPairs"))
    // the healthy corpus sails under a generous budget on all three
    assert(Dedup.minhashLshPairs(corpus, "doc_id", "text",
      maxCandidates = Some(1000000L)).collect().nonEmpty)
    assert(Dedup.minhashLshPairsMd5(corpus, "doc_id", "text",
      maxCandidates = Some(1000000L)).collect().nonEmpty)
    Dedup.simhashPairs(corpus, "doc_id", "text",
      maxCandidates = Some(1000000L)).collect()
  }

  test("defaultVolumeBudget: conf override, else shuffle-partition-derived") {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toLong
    assert(Dedup.defaultVolumeBudget(spark) === parts * 32L * 1000 * 1000)
    spark.conf.set("graft.volumeBudget", "123")
    try {
      assert(Dedup.defaultVolumeBudget(spark) === 123L)
      // wired default fires on a dense corpus when the conf tightens it
      val degenerate = (1L to 40L)
        .map(i => (i, "the exact same sentence repeated everywhere"))
        .toDF("doc_id", "text")
      intercept[IllegalStateException] {
        Dedup.minhashLshPairs(degenerate, "doc_id", "text",
          maxCandidates = Some(Dedup.defaultVolumeBudget(spark))).collect()
      }
    } finally spark.conf.unset("graft.volumeBudget")
    // at the partition-derived default the spec corpus is far under budget
    assert(Dedup.minhashLshPairs(corpus, "doc_id", "text",
      maxCandidates = Some(Dedup.defaultVolumeBudget(spark))).collect().nonEmpty)
  }

  test("minhash LSH recovers the same dup pairs as exact jaccard here") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh) || lsh.subsetOf(exact))
    assert(lsh.contains((1L, 2L)))
  }

  test("md5-family minhash bridges the xxhash64 production family") {
    // the two hash families estimate the same Jaccard; on the real corpus
    // their LSH pair sets coincide (deterministic — both pipelines are
    // pure functions of the fixed corpus), and both recover the known dup
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(300)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .union(corpus)
    val xx = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val md = Dedup.minhashLshPairsMd5(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(md.contains((1L, 2L)))
    // families agree on the corpus (any drift would be a borderline pair;
    // require symmetric-difference empty so regressions surface loudly)
    assert(md === xx, s"families disagree: only-md5=${md -- xx} only-xx=${xx -- md}")
  }

  test("incremental probe equals the full LSH restricted to probe-touching pairs") {
    import org.apache.spark.sql.functions.col
    // the continuously-growing-corpus contract: probing the batch against
    // the standing index finds EXACTLY the full-recompute pairs that
    // touch the batch — no more (corpus x corpus) and no fewer
    // cache: limit(300) gives NO cross-job row-selection guarantee — the
    // full/probe/index branches must see the same rows
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(300)
      .select(col("doc_id"), col("text"))
      .union(corpus)
      .cache()
    docs.count()
    val full = Dedup.minhashLshPairsMd5(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val probeIds = docs.filter(col("doc_id") % 3 === 0)
    val indexIds = docs.filter(col("doc_id") % 3 =!= 0)
    val probe = Dedup.minhashSignaturesMd5(probeIds, "doc_id", "text", 3, 64)
    val index = Dedup.minhashSignaturesMd5(indexIds, "doc_id", "text", 3, 64)
    val inc = Dedup.minhashLshPairsAgainst(probe, index, "doc_id", 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val touching = full.filter(p => p._1 % 3 == 0 || p._2 % 3 == 0)
    assert(inc === touching,
      s"only-inc=${inc -- touching} only-full=${touching -- inc}")
    // family-agnostic: the xxhash64 production signatures probe the same way
    val xfull = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xprobe = Dedup.minhashSignatures(probeIds, "doc_id", "text", 3, 64)
    val xindex = Dedup.minhashSignatures(indexIds, "doc_id", "text", 3, 64)
    val xinc = Dedup.minhashLshPairsAgainst(xprobe, xindex, "doc_id", 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(xinc === xfull.filter(p => p._1 % 3 == 0 || p._2 % 3 == 0))
    docs.unpersist()
  }

  test("incremental probe budget fails fast on a saturated index, silent under") {
    import org.apache.spark.sql.functions.col
    val degenerate = (0L until 200L).map(i => (i, "same text " * 10))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesMd5(degenerate, "doc_id", "text", 3, 64)
    val e = intercept[IllegalStateException] {
      Dedup.minhashLshPairsAgainst(
        sigs.filter(col("doc_id") < 20), sigs.filter(col("doc_id") >= 20),
        "doc_id", maxCandidates = Some(100L)).count()
    }
    assert(e.getMessage.contains("minhashLshPairsAgainst"))
    assert(Dedup.minhashLshPairsAgainst(
      sigs.filter(col("doc_id") < 20), sigs.filter(col("doc_id") >= 20),
      "doc_id", maxCandidates = Some(10000000L)).count() > 0)
  }

  test("simhash: identical docs hash identically; near dups are close") {
    val fps = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(fps(1L) === fps(2L))
    val hammingNear = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    val hammingFar = java.lang.Long.bitCount(fps(1L) ^ fps(4L))
    assert(hammingNear < hammingFar)
  }

  test("simhashPairs finds the identical pair at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("per-pipeline pin scopes: releasing one pipeline keeps the other's caches") {
    Dedup.unpersistIntermediates() // start from a clean default scope
    spark.catalog.clearCache()
    val docs = graft.core.Tables.documents(spark, sf("sf0.001")).limit(60)
    val s1 = new Dedup.PinScope
    val s2 = new Dedup.PinScope
    val p1 = Dedup.withPinScope(s1)(Dedup.simhashPairs(docs, "doc_id", "text"))
    val p2 = Dedup.withPinScope(s2)(Dedup.minhashLshPairs(docs, "doc_id", "text"))
    val n2 = p2.count()
    assert(p1.count() >= 0)
    val before = spark.sparkContext.getPersistentRDDs.size
    s1.release() // pipeline 1 done — must not evict pipeline 2's caches
    val mid = spark.sparkContext.getPersistentRDDs.size
    assert(mid < before, "releasing scope 1 freed nothing")
    assert(mid > 0, "releasing scope 1 also evicted scope 2's caches")
    assert(p2.count() === n2) // pipeline 2 still correct on its live caches
    s2.release()
    assert(spark.sparkContext.getPersistentRDDs.size < mid)
    s2.release() // idempotent
  }

  test("connectedComponents matches driver-side union-find on a mixed graph") {
    import org.apache.spark.sql.functions._
    // chain 0-1-…-17 (deep: forces multiple star rounds), a 5-clique,
    // a triangle sharing node 100 with the clique via an extra edge,
    // duplicate + reversed edges (must canonicalize away)
    val chain = (0L until 17L).map(i => (i, i + 1))
    val clique = for { a <- 100L to 104L; b <- 100L to 104L if a < b } yield (a, b)
    val bridge = Seq((104L, 200L), (200L, 201L), (201L, 202L), (202L, 200L))
    val noise = Seq((1L, 0L), (0L, 1L), (300L, 301L)) // reversed, dup, pair
    val edges = chain ++ clique ++ bridge ++ noise

    // reference: union-find over the same edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap

    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)

    // the Catalyst reference form computes the identical map (the RDD
    // fast path above is the default; this keeps the two from drifting)
    val sql = Dedup.connectedComponentsSql(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql === expected)
    // every component labeled by its min member
    assert(got.groupBy(_._2).forall { case (c, m) => m.keys.min == c })
  }

  test("dedupByComponents keeps exactly the component minima plus unpaired docs") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // 1-2-3 one cluster
    val kept = Dedup.dedupByComponents(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L))
  }

  test("canonicalByScore keeps the highest-score member, min id on ties") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // component {1,2,3} → keep 2
      (4L, 5L), (5L, 5L),              // component {4,5}, tie → keep 4
      (6L, 1L))                        // unpaired → survives untouched
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalByScore(docs, "doc_id", pairs, "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(2L, 4L, 6L))
    // empty pair frame: everything survives
    val none = Dedup.canonicalByScore(
      docs, "doc_id", spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"), "score")
    assert(none.count() === 6)
  }

  test("connectedComponents of an empty pair frame is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0L)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown", "quick brown fox" w/ bench 100
      (2L, "completely unrelated words here"),
      (3L, "capital of france is paris"),  // shares "capital of france", "of france is" w/ bench 101
      (4L, "short doc"))                   // < 3 tokens: no shingles
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox"),
      (101L, "what is the capital of france is it paris"))
      .toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: shingles {the quick brown, quick brown fox} both in bench 100
    // doc 3: {capital of france, of france is} both in bench 101
    assert(got === Seq((1L, 2L, 1L), (3L, 2L, 1L)))
    val clean = Dedup.decontaminated(train, bench, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq === Seq(2L, 4L))
  }

  test("groupOverlapMatrix: union-sketch min-fold identity, exact extremes, short-doc drop") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "a", "one two three four five six seven eight nine"),
      (3L, "b", "alpha beta gamma delta epsilon zeta eta theta"), // == doc 1: a∩b nonempty
      (4L, "b", "red orange yellow green blue indigo violet saturated"),
      (5L, "c", "totally disjoint vocabulary nothing shared here at all"),
      (6L, "d", "alpha beta gamma delta epsilon zeta eta theta"), // d's shingle
      (7L, "d", "one two three four five six seven eight nine"),  //   population == a's
      (8L, "e", "too short"))                                     // < n tokens: no shingles
      .toDF("doc_id", "source", "text")
    val m = Dedup.groupOverlapMatrix(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // group e never signed a shingle → absent entirely; pairs are a<b only
    assert(!m.keys.exists { case (x, y) => x == "e" || y == "e" })
    assert(m.keySet === Set(("a","b"), ("a","c"), ("a","d"), ("b","c"), ("b","d"), ("c","d")))
    // identical shingle populations → identical union sketches → est 1.0
    assert(m(("a", "d")) === 1.0)
    // disjoint vocabularies → no position can match (no 64-bit collisions here)
    assert(m(("a", "c")) === 0.0 && m(("b", "c")) === 0.0 && m(("c", "d")) === 0.0)
    // overlap orders correctly: a shares a full doc with b, nothing with c
    assert(m(("a", "b")) > 0.0 && m(("a", "b")) < 1.0)
    // independent route: min-fold the PER-DOC md5 signatures driver-side
    // (min distributes over set union) and recount position matches — the
    // operator's posexplode/groupBy/broadcast-join plumbing must agree
    val perDoc = Dedup.minhashSignaturesMd5(docs, "doc_id", "text", 3, 64)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("source", "signature").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
    val folded = perDoc.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).reduce((x, y) => x.zip(y).map(t => math.min(t._1, t._2)))
    }
    for { ga <- folded.keys; gb <- folded.keys if ga < gb } {
      val expect = folded(ga).zip(folded(gb)).count(t => t._1 == t._2) / 64.0
      assert(m((ga, gb)) === expect, s"pair ($ga,$gb)")
    }
  }
}
