package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Splits}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)

  test("hashSplit is deterministic, total, and near the requested proportions") {
    val ids = spark.range(0, 20000).toDF("id")
    val split = Splits.hashSplit(ids, "id", weights, salt = "seed1")
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L) // total: every row assigned
    assert(math.abs(counts("train") / 20000.0 - 0.75) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.125) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.125) < 0.01)
    // deterministic: a second evaluation is identical row-for-row
    val a = split.orderBy("id").select("split").as[String].collect().toSeq
    val b = Splits.hashSplit(ids, "id", weights, salt = "seed1")
      .orderBy("id").select("split").as[String].collect().toSeq
    assert(a === b)
    // salt changes the assignment (not a constant function)
    val c = Splits.hashSplit(ids, "id", weights, salt = "seed2")
      .orderBy("id").select("split").as[String].collect().toSeq
    assert(a !== c)
  }

  test("md5 family behaves like the production family (proportions)") {
    val ids = spark.range(0, 20000).toDF("id")
    val counts = Splits.hashSplitMd5(ids, "id", weights, salt = "seed1")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.75) < 0.02)
  }

  test("leakageSafeSplit pins every near-dup pair to one split") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    // chains of near-dups crossing arbitrary ids, plus a bigger cluster
    val pairs = ((0L until 200L).map(i => (i * 3, i * 3 + 1)) ++
      Seq((900L, 901L), (901L, 902L), (902L, 903L)))
      .toDF("id_a", "id_b")
    val split = Splits.leakageSafeSplit(docs, "doc_id", pairs, weights, salt = "s")
    val byId = split.select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(byId(a) === byId(b), s"pair ($a,$b) straddles splits")
    }
    // an unpaired doc keeps its plain hashSplit assignment
    val plain = Splits.hashSplit(docs, "doc_id", weights, salt = "s")
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val paired = pairs.as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    byId.keys.filterNot(paired).foreach(id => assert(byId(id) === plain(id)))
  }

  test("stratifiedSample keeps per-stratum rates and is repartition-stable") {
    val rows = spark.range(0, 30000)
      .withColumn("stratum",
        when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val rates = Seq("a" -> 0.5, "b" -> 0.25) // c falls to defaultRate 0
    val kept = graft.pipeline.Splits.stratifiedSample(rows.toDF(), "id", "stratum", rates, salt = "z")
    val counts = kept.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") / 10000.0 - 0.5) < 0.03)
    assert(math.abs(counts("b") / 10000.0 - 0.25) < 0.03)
    assert(!counts.contains("c"))
    // membership is a pure function of (salt, id): repartitioning the
    // input changes nothing (sampleBy's per-partition RNG would)
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = graft.pipeline.Splits.stratifiedSample(
        rows.toDF().repartition(7), "id", "stratum", rates, salt = "z")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("withPrefixSum equals the single-task window scan") {
    import graft.pipeline.Packing
    val df = spark.range(0, 50000).select(
      col("id"), (pmod(hash(col("id")), lit(37)) + 1).cast("long").as("v"))
    // force several range partitions (AQE coalesces 50k rows to one), so
    // the scan must agree with the window ACROSS partition boundaries;
    // the premise check is on the ranged input — the output frame's count
    // is post-AQE and legitimately collapses on tiny data
    assert(df.repartitionByRange(8, col("id")).rdd.getNumPartitions === 8)
    val scanned = Packing.withPrefixSum(df, "id", "v", "cum", numPartitions = Some(8))
    val naive = df.withColumn("cum",
      sum(col("v")).over(org.apache.spark.sql.expressions.Window.orderBy("id")))
    val gotMap = scanned.select("id", "cum").as[(Long, Long)].collect().toMap
    naive.select("id", "cum").as[(Long, Long)].collect().foreach { case (id, c) =>
      assert(gotMap(id) === c, s"prefix sum diverges at id=$id")
    }
  }

  test("packSequences: every document starts inside its bin's budget window") {
    import graft.pipeline.Packing
    val docs = graft.core.Tables.documents(spark, sf("sf0.001"))
    val packed = Packing.packSequences(docs, "doc_id", "text", 512L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    var cum = 0L
    packed.foreach { case (_, tokens, bin) =>
      assert(bin === cum / 512L) // start offset decides the bin
      cum += tokens
    }
    assert(packed.map(_._3).distinct.length > 1) // corpus spans several bins
  }

  test("packedText concatenates each bin's documents in id order") {
    import graft.pipeline.Packing
    val docs = Seq(
      (1L, "a b c"),   // 3 tokens, cum-before 0  -> bin 0
      (2L, "d e"),     // cum-before 3            -> bin 0
      (3L, "f g h i"), // cum-before 5            -> bin 1
      (4L, "j"))       // cum-before 9            -> bin 2
      .toDF("doc_id", "text")
    val got = Packing.packedText(docs, "doc_id", "text", 4L)
      .orderBy("bin")
      .select("bin", "n_docs", "total_tokens", "packed_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 5L, "a b c d e"),
      (1L, 1L, 4L, "f g h i"),
      (2L, 1L, 1L, "j")))
  }

  test("topTerms equals the naive count on a known corpus") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma  beta"), // double space: empty tokens must not count
      (3L, "alpha delta")).toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.topTerms(docs, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("alpha", 3L), ("beta", 3L), ("delta", 1L)))
  }

  test("shuffleOrder assigns a deterministic permutation, stable under repartitioning") {
    val ids = spark.range(0, 5000).toDF("id")
    val pos = Splits.shuffleOrder(ids, "id", salt = "sh1")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // a permutation of 0..n-1
    assert(pos.values.toSeq.sorted === (0L until 5000L))
    // not the identity (it actually shuffles)
    assert((0L until 5000L).count(i => pos(i) == i) < 50)
    // physical layout does not change the logical order
    val repos = Splits.shuffleOrder(ids.repartition(17), "id", salt = "sh1")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(repos === pos)
    // a different salt is a different permutation
    val other = Splits.shuffleOrder(ids, "id", salt = "sh2")
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(other !== pos)
  }

  test("shuffleOrder: appends only displace, never reorder, existing rows") {
    val base = spark.range(0, 2000).toDF("id")
    val grown = spark.range(0, 3000).toDF("id")
    val a = Splits.shuffleOrder(base, "id", salt = "sh1")
      .select("id", "pos").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1).toSeq
    val b = Splits.shuffleOrder(grown, "id", salt = "sh1")
      .select("id", "pos").as[(Long, Long)].collect()
      .sortBy(_._2).map(_._1).filter(_ < 2000L).toSeq
    assert(a === b) // old ids keep their relative order in the grown corpus
  }

  test("md5 shuffle family is also a valid permutation") {
    val ids = spark.range(0, 2000).toDF("id")
    val pos = Splits.shuffleOrderMd5(ids, "id", salt = "sh1")
      .select("pos").as[Long].collect().sorted
    assert(pos.toSeq === (0L until 2000L))
  }

  test("mixtureSample hits target token proportions; binding source keeps rate 1") {
    // four equal sources of 1000 docs x 10 tokens; s3 is untargeted
    val docs = spark.range(0, 4000).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 4))
      .withColumn("text", lit(Seq.fill(10)("w").mkString(" ")))
    val kept = Splits.mixtureSample(
        docs, "id", "source", "text",
        Seq("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2), salt = "m1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates: s0 = 1.0 (binding), s1 = 0.6, s2 = 0.4, s3 dropped
    assert(kept("s0") === 1000L)
    assert(math.abs(kept("s1") / 1000.0 - 0.6) < 0.05)
    assert(math.abs(kept("s2") / 1000.0 - 0.4) < 0.05)
    assert(!kept.contains("s3"))
    // kept token mass proportions track the targets
    val total = kept.values.sum.toDouble
    assert(math.abs(kept("s0") / total - 0.5) < 0.03)
    assert(math.abs(kept("s1") / total - 0.3) < 0.03)
    assert(math.abs(kept("s2") / total - 0.2) < 0.03)
  }

  test("temperatureSample flattens shares toward sqrt-mass; smallest source binds at rate 1") {
    // heavily skewed sources: 6400 / 1600 / 100 docs of 10 tokens each
    val docs = spark.range(0, 8100).toDF("id")
      .withColumn("source",
        when(col("id") < 6400, lit("s0")).when(col("id") < 8000, lit("s1")).otherwise(lit("s2")))
      .withColumn("text", lit(Seq.fill(10)("w").mkString(" ")))
    // masses 64000/16000/1000 -> isqrt targets 252/126/31 ->
    // M = 1000/31; rates s0 = 252*(1000/31)/64000 ≈ 0.1270,
    // s1 = 126*(1000/31)/16000 ≈ 0.2540, s2 = 1 (binding)
    val kept = Splits.temperatureSample(docs, "id", "source", "text", salt = "t1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("s2") === 100L)
    assert(math.abs(kept("s0") / 6400.0 - 252.0 * (1000.0 / 31.0) / 64000.0) < 0.03)
    assert(math.abs(kept("s1") / 1600.0 - 126.0 * (1000.0 / 31.0) / 16000.0) < 0.03)
    // the flattening: share ratio s0:s2 collapses from 64:1 toward sqrt(64):1
    val ratio = kept("s0").toDouble / kept("s2").toDouble
    assert(ratio > 4 && ratio < 13, s"expected ~8:1 flattened ratio, got $ratio")
    // md5 twin and general-alpha pow form agree with the gate family
    val keptMd5 = Splits.temperatureSampleMd5(docs, "id", "source", "text", salt = "t1")
      .count()
    assert(math.abs(keptMd5 - kept.values.sum.toDouble) / kept.values.sum < 0.10)
    val keptPow = Splits.temperatureSampleAlpha(docs, "id", "source", "text", 0.5, salt = "t1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // same family + same salt as the sqrt form: memberships may differ only
    // where the isqrt quantization moves a rate across a doc's hash draw
    assert(keptPow("s2") === 100L)
    assert(math.abs(keptPow("s0").toDouble - kept("s0")) / kept("s0") < 0.05)

    // quarter-power family: quarters=2 IS the sqrt form bit-for-bit
    val q2 = Splits.temperatureSampleQuarters(
        docs, "id", "source", "text", quarters = 2, salt = "t1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q2 === kept)
    // α=1/4 flattens HARDER than α=1/2 (s0:s2 toward 64^0.25 ≈ 2.8:1),
    // α=3/4 SOFTER (toward 64^0.75 ≈ 22.6:1); binding source at rate 1
    val q1 = Splits.temperatureSampleQuarters(
        docs, "id", "source", "text", quarters = 1, salt = "t1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q3 = Splits.temperatureSampleQuarters(
        docs, "id", "source", "text", quarters = 3, salt = "t1")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q1("s2") === 100L && q3("s2") === 100L)
    val r1 = q1("s0").toDouble / q1("s2")
    val r3 = q3("s0").toDouble / q3("s2")
    assert(r1 > 1.5 && r1 < 4.5, s"expected ~2.8:1 at alpha=1/4, got $r1")
    assert(r3 > 15 && r3 < 32, s"expected ~22.6:1 at alpha=3/4, got $r3")
    assert(r1 < ratio && ratio < r3)
  }

  test("isqrt is the exact integer square root across rounding edges") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 24L, 25L, 26L, 999999L, 1000000L,
      (1L << 31) * (1L << 31) - 1, (1L << 31) * (1L << 31),
      999999999999L, 1000000000000L, 4611686018427387903L)
    val got = xs.toDF("x").select(Splits.isqrt(col("x")).as("s"))
      .as[Long].collect().toSeq
    val want = xs.map(x => BigInt(x).bigInteger.sqrt().longValueExact())
    assert(got === want)
  }

  test("chunkDocs shards with overlap; every token covered; short docs one chunk") {
    val docs = Seq(
      (1L, "a b c d e"),     // 5 toks, size 3 stride 2 -> [a b c] [c d e]
      (2L, "x y"),           // fits one chunk
      (3L, "p q r s t u"))   // -> [p q r] [r s t] [t u]
      .toDF("doc_id", "text")
    val got = graft.pipeline.Packing.chunkDocs(docs, "doc_id", "text", 3, 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"),
      (2L, 0L, 2L, "x y"),
      (3L, 0L, 3L, "p q r"), (3L, 1L, 3L, "r s t"), (3L, 2L, 2L, "t u")))
  }

  test("rankNormalize equals the window form, invariant to partitioning") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // negative metrics + deep ties: key bias and id tie-break both matter
    val rows = (0L until 97L).map(i => (i, (i % 7) - 3))
    val df = rows.toDF("id", "m")
    val expect = df.withColumn("pct_rank",
        (row_number().over(Window.orderBy(col("m"), col("id"))) - 1)
          .cast("double") / lit(96L))
      .select("id", "m", "pct_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    for (parts <- Seq(1, 5)) {
      val got = graft.pipeline.Splits.rankNormalize(df.repartition(parts), "id", "m")
        .select("id", "m", "pct_rank")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got === expect, s"parts=$parts")
    }
    // degenerate single row -> 0.0
    val one = Seq((7L, 42L)).toDF("id", "m")
    assert(graft.pipeline.Splits.rankNormalize(one, "id", "m")
      .select("pct_rank").as[Double].head() === 0.0)
    // out-of-domain metric (>= 2^62) fails LOUDLY instead of silently
    // inverting the key order (r10 review: the bias would wrap)
    val big = Seq((1L, 4611686018427387904L), (2L, 1L)).toDF("id", "m")
    val e = intercept[Exception] {
      graft.pipeline.Splits.rankNormalize(big, "id", "m").collect()
    }
    assert(e.getMessage != null)
  }

  test("qualityWeightedSampleMd5 keeps more of higher deciles, is id-stable") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 2000L).map(i => (i, i)).toDF("id", "m")
    val steep = Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.5, 1.0)
    val kept = graft.pipeline.Splits.qualityWeightedSampleMd5(
        df, "id", "m", steep, salt = "t")
      .select("id").as[Long].collect().toSet
    // rate-0 deciles contribute nothing; the top decile is kept whole
    assert(kept.forall(_ >= 1600L))
    assert((1800L until 2000L).forall(kept)) // decile 9, rate 1.0
    val d8 = kept.count(id => id >= 1600 && id < 1800) / 200.0
    assert(d8 > 0.3 && d8 < 0.7, s"decile-8 keep fraction $d8")
    // deterministic under repartition
    val again = graft.pipeline.Splits.qualityWeightedSampleMd5(
        df.repartition(7), "id", "m", steep, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(again === kept)
    // exactly 10 rates, all in [0,1]
    intercept[IllegalArgumentException] {
      graft.pipeline.Splits.qualityWeightedSampleMd5(df, "id", "m", Seq(0.5))
    }
  }

  test("replicateSample: rate 1.0 is the identity (up ∘ down composes)") {
    val docs = spark.range(0, 3000).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 3))
    val out = Splits.replicateSample(
        docs, "id", "source", Seq("s0" -> 1.0, "s1" -> 1.0, "s2" -> 1.0),
        salt = "r1")
      .select("id", "epoch").as[(Long, Long)].collect().toSeq.sorted
    // exactly one copy of every row, all at epoch 0 — so a rate-1.0
    // up-sample after a rate-1.0 down-sample is the identity corpus
    assert(out === (0L until 3000L).map(i => (i, 0L)))
  }

  test("replicateSample: floor copies always, frac extra hash-drawn, epochs contiguous") {
    val docs = spark.range(0, 4000).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 4))
    val out = Splits.replicateSample(
        docs, "id", "source",
        Seq("s0" -> 2.5, "s1" -> 0.25, "s2" -> 3.0), salt = "r2")
    val byId = out.select("id", "epoch").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // s0 (ids ≡ 0 mod 4): 2 or 3 copies each, ~2.5 on average
    val s0 = (0L until 4000L by 4).map(id => byId.getOrElse(id, Seq()).size)
    assert(s0.forall(n => n == 2 || n == 3))
    assert(math.abs(s0.sum / 1000.0 - 2.5) < 0.1)
    // s2: exactly 3 copies (integer rate, no draw)
    (2L until 4000L by 4).foreach(id => assert(byId(id) === Seq(0L, 1L, 2L)))
    // s1: 0 or 1 copies, ~25% kept — degenerates to stratifiedSample
    val s1n = (1L until 4000L by 4).count(byId.contains)
    assert(math.abs(s1n / 1000.0 - 0.25) < 0.05)
    // s3 absent from rates -> dropped entirely
    assert((3L until 4000L by 4).forall(id => !byId.contains(id)))
    // epochs are 0..n-1 per id (contiguous, 0-based)
    byId.values.foreach(es => assert(es === (0L until es.size).toSeq))
    // repartition-stable
    val again = Splits.replicateSample(
        docs.repartition(7), "id", "source",
        Seq("s0" -> 2.5, "s1" -> 0.25, "s2" -> 3.0), salt = "r2")
      .select("id", "epoch").as[(Long, Long)].collect().toSeq.sorted
    assert(again === out.select("id", "epoch").as[(Long, Long)].collect().toSeq.sorted)
  }

  test("replicateSample: maxRate guard raises instead of exploding silently") {
    val docs = spark.range(0, 10).toDF("id").withColumn("source", lit("s0"))
    val e = intercept[Exception] {
      Splits.replicateSample(docs, "id", "source", Seq("s0" -> 50.0),
        maxRate = 10.0).count()
    }
    assert(e.getMessage != null)
    intercept[IllegalArgumentException] {
      Splits.replicateSample(docs, "id", "source", Seq("s0" -> -0.5))
    }
  }

  test("mixtureResample replicates under-target sources to hit proportions") {
    // four equal sources of 1000 docs x 10 tokens; targets want s0 at 60%
    // of the SAME total mass -> rate 1.8 (replication); s2 thins to 0.3
    val docs = spark.range(0, 4000).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 4))
      .withColumn("text", lit(Seq.fill(10)("w").mkString(" ")))
    val out = Splits.mixtureResample(
        docs, "id", "source", "text",
        Seq("s0" -> 0.6, "s1" -> 0.3, "s2" -> 0.1),
        budgetFactor = 1.0, salt = "mr")
    val counts = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates: s0 = 0.6*30000/10000 = 1.8, s1 = 0.9, s2 = 0.3, s3 dropped
    assert(math.abs(counts("s0") / 1000.0 - 1.8) < 0.1)
    assert(math.abs(counts("s1") / 1000.0 - 0.9) < 0.05)
    assert(math.abs(counts("s2") / 1000.0 - 0.3) < 0.05)
    assert(!counts.contains("s3"))
    // emitted mixture tracks the targets (every doc is 10 tokens)
    val total = counts.values.sum.toDouble
    assert(math.abs(counts("s0") / total - 0.6) < 0.03)
    assert(math.abs(counts("s1") / total - 0.3) < 0.03)
    assert(math.abs(counts("s2") / total - 0.1) < 0.03)
    // s0 really replicates: rate 1.8 -> ~80% of ids carry an epoch-1 copy
    val e1 = out.filter(col("source") === "s0" && col("epoch") === 1L).count()
    assert(math.abs(e1 / 1000.0 - 0.8) < 0.05, s"epoch-1 count $e1")
  }

  test("shuffleOrderEpochs: valid permutation over replicas, scattered not adjacent") {
    val docs = spark.range(0, 2000).toDF("id").withColumn("source", lit("s0"))
    val up = Splits.replicateSample(docs, "id", "source", Seq("s0" -> 3.0), salt = "e")
    val n = up.count() // 6000: integer rate, no draw
    assert(n === 6000L)
    val pos = Splits.shuffleOrderEpochs(up, "id", "epoch", salt = "sh")
      .select("id", "epoch", "pos").as[(Long, Long, Long)].collect()
    // a complete 0..n-1 permutation
    assert(pos.map(_._3).sorted.toSeq === (0L until n))
    // replicas of one id scatter: across 2000 ids with 3 replicas each,
    // adjacency of two replicas is ~rare — assert most ids are spread
    val spread = pos.groupBy(_._1).values.count { rs =>
      val ps = rs.map(_._3).sorted
      ps.zip(ps.tail).forall { case (a, b) => b - a > 1 }
    }
    assert(spread > 1900, s"only $spread of 2000 ids fully scattered")
    // stable under repartitioning
    val again = Splits.shuffleOrderEpochs(up.repartition(7), "id", "epoch", salt = "sh")
      .select("id", "epoch", "pos").as[(Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq === pos.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("sampleExact takes exactly n, append-monotone, under-n keeps all") {
    val docs = spark.range(0, 5000).toDF("id")
    val kept = Splits.sampleExact(docs, "id", 700L, salt = "x")
      .select("id", "pos").as[(Long, Long)].collect()
    assert(kept.length === 700)
    assert(kept.map(_._2).sorted.toSeq === (0L until 700L)) // positions 0..n-1
    // under-n corpus keeps everything
    assert(Splits.sampleExact(docs.filter(col("id") < 50), "id", 700L, salt = "x")
      .count() === 50L)
    // repartition-stable
    val again = Splits.sampleExact(docs.repartition(9), "id", 700L, salt = "x")
      .select("id").as[Long].collect().toSet
    assert(again === kept.map(_._1).toSet)
    // appends displace only: the bigger corpus's sample members drawn
    // from the old id range are a subset of the old sample
    val bigger = Splits.sampleExact(spark.range(0, 8000).toDF("id"), "id", 700L, salt = "x")
      .select("id").as[Long].collect().toSet
    assert(bigger.filter(_ < 5000).subsetOf(kept.map(_._1).toSet))
  }

  test("capPerGroup keeps at most k per group, hash-stable under repartition and append") {
    val docs = spark.range(0, 1000).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 4)) // 250 each
    val kept = Splits.capPerGroup(docs, "id", "source", k = 40, salt = "c")
      .select("id", "source").as[(Long, String)].collect()
    val byGroup = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGroup.values.forall(_.size == 40)) // 250 > k -> exactly k kept
    // a group under the cap keeps everything
    val small = docs.filter(col("id") < 30) // ~8 per source
    val keptSmall = Splits.capPerGroup(small, "id", "source", 40, salt = "c").count()
    assert(keptSmall === 30L)
    // repartition-stable
    val again = Splits.capPerGroup(docs.repartition(7), "id", "source", 40, salt = "c")
      .select("id").as[Long].collect().toSet
    assert(again === kept.map(_._1).toSet)
    // appends displace at most: adding docs can only swap members whose
    // hash outranks an incumbent — every survivor of the bigger corpus
    // that existed before was already kept or displaced an old member,
    // and no group exceeds k
    val more = spark.range(0, 1500).toDF("id")
      .withColumn("source", concat(lit("s"), col("id") % 4))
    val keptMore = Splits.capPerGroup(more, "id", "source", 40, salt = "c")
      .select("id", "source").as[(Long, String)].collect()
    assert(keptMore.groupBy(_._2).values.forall(_.size == 40))
    // old members still present in the new kept set were kept before too
    // (hash order is append-monotone: survivors from the old id range
    // must be a subset of the old kept set)
    val oldSurvivors = keptMore.map(_._1).filter(_ < 1000).toSet
    assert(oldSurvivors.subsetOf(kept.map(_._1).toSet))
  }

  test("capPerGroup threshold-join path is bit-identical to the direct-window reference") {
    // a Zipf-headed corpus: 90% of rows in ONE group — the exact shape
    // the threshold form exists for; 11 input partitions so the map-side
    // partial aggregation actually combines across partitions
    val docs = spark.range(0, 2000).toDF("id")
      .withColumn("source",
        when(col("id") < 1800, lit("hot")).otherwise(concat(lit("s"), col("id") % 5)))
      .withColumn("payload", concat(lit("p"), col("id") * 7))
      .repartition(11)
    for (k <- Seq(1, 13, 40, 5000)) {
      val prod = Splits.capPerGroupMd5(docs, "id", "source", k, salt = "pc")
        .select("id", "source", "payload").as[(Long, String, String)]
        .collect().sortBy(_._1)
      val ref = Splits.capPerGroupMd5Reference(docs, "id", "source", k, salt = "pc")
        .select("id", "source", "payload").as[(Long, String, String)]
        .collect().sortBy(_._1)
      assert(prod === ref, s"threshold cap diverged from reference at k=$k")
    }
    // the xxhash64 family too (different key derivation path)
    val p64 = Splits.capPerGroup(docs, "id", "source", 13, salt = "pc")
      .select("id").as[Long].collect().toSet
    assert(p64.nonEmpty && p64.size <= 13 + 5 * 13)
    // a NULL group is its own group (null-safe join), like the window form
    val withNull = docs.withColumn("source",
      when(col("id") % 100 === 0, lit(null: String)).otherwise(col("source")))
    val prodN = Splits.capPerGroupMd5(withNull, "id", "source", 7, salt = "pc")
      .select("id").as[Long].collect().sorted
    val refN = Splits.capPerGroupMd5Reference(withNull, "id", "source", 7, salt = "pc")
      .select("id").as[Long].collect().sorted
    assert(prodN === refN)
    assert(prodN.length === 7 * 7) // hot, s0..s4, null: 7 groups all over the cap
    // a NULL id refuses loudly (the threshold agg would silently drop it
    // where the window's nulls-first order kept it)
    val nullId = Seq((java.lang.Long.valueOf(1L), "a"), (null.asInstanceOf[java.lang.Long], "a"))
      .toDF("id", "source")
    val e = intercept[Exception] {
      Splits.capPerGroupMd5(nullId, "id", "source", 5, salt = "pc").collect()
    }
    assert(e.getMessage.contains("non-null") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null")))
  }

  test("cutByQuantileExact keeps exactly n - floor(q*n) rows, boundary ties broken by id") {
    // a heavily plateaued metric: most rows share the boundary value, so a
    // `metric >= threshold` filter would over-keep — the rank cut may not
    val docs = spark.range(0, 1000).toDF("id")
      .withColumn("m", when(col("id") < 900, lit(50L)).otherwise(col("id")))
    val q = 0.8
    val kept = Splits.cutByQuantileExact(docs, "id", "m", q)
      .select("id", "m").as[(Long, Long)].collect()
    assert(kept.length === 1000 - math.floor(q * 1000).toLong)
    // the kept set is the top 200 of the (m, id) total order: ids 800..999
    // (ids 900..999 have m > 50; the 100 highest ids at m=50 fill the rest)
    assert(kept.map(_._1).toSet === (800L until 1000L).toSet)
    // deterministic under repartitioning
    val again = Splits.cutByQuantileExact(docs.repartition(7), "id", "m", q)
      .select("id").as[Long].collect().toSet
    assert(again === kept.map(_._1).toSet)
    // single-row corpus: floor(q*1) = 0 -> the row is kept
    assert(Splits.cutByQuantileExact(docs.limit(1), "id", "m", 0.5).count() === 1L)
  }

  test("cutByQuantileExactPerGroup: each group keeps exactly its own top fraction") {
    // disjoint metric ranges (the per-group motivation): a GLOBAL cut
    // would keep nothing of group c — the per-group cut keeps its head
    val docs = spark.range(0, 900).toDF("id")
      .withColumn("g",
        when(col("id") < 300, lit("a"))
          .when(col("id") < 600, lit("b")).otherwise(lit("c")))
      .withColumn("m",
        when(col("g") === "a", col("id") + 10000L)
          .when(col("g") === "b", col("id") + 5000L).otherwise(col("id") % 7))
    val kept = Splits.cutByQuantileExactPerGroup(docs, "id", "g", "m", q = 0.8)
      .groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n_g = 300 each; floor(0.8*300) = 240 -> exactly 60 kept per group,
    // including c (plateaued m: the id tie-break keeps the count exact)
    assert(kept === Map("a" -> 60L, "b" -> 60L, "c" -> 60L))
    // deterministic under repartitioning
    val k1 = Splits.cutByQuantileExactPerGroup(docs, "id", "g", "m", 0.8)
      .select("id").as[Long].collect().toSet
    val k2 = Splits.cutByQuantileExactPerGroup(docs.repartition(7), "id", "g", "m", 0.8)
      .select("id").as[Long].collect().toSet
    assert(k1 === k2)
    // matches the single-group form when there IS one group
    val one = docs.withColumn("g", lit("only"))
    val viaGroup = Splits.cutByQuantileExactPerGroup(one, "id", "g", "m", 0.8)
      .select("id").as[Long].collect().toSet
    val viaGlobal = Splits.cutByQuantileExact(one, "id", "m", 0.8)
      .select("id").as[Long].collect().toSet
    assert(viaGroup === viaGlobal)
  }

  test("sampleByTokenBudgetPerGroup: hash-order fill to the budget, straddler included") {
    // 3 sources x 40 docs x 10 tokens = 400 tokens/source; budget 105
    // -> docs 1..10 in hash order kept wherever boundaries align, and
    // the doc STARTING at 100 (tokens_before = 100 < 105) straddles in
    val docs = spark.range(0, 120).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("text", lit(Seq.fill(10)("w").mkString(" ")))
    val kept = Splits.sampleByTokenBudgetPerGroup(
        docs, "id", "g", "text", budgetTokens = 105L, salt = "s1")
      .select("id", "g", "tokens", "tokens_before")
      .collect()
    // every doc is 10 tokens: kept per group = ceil(105/10) = 11 (the
    // 11th starts at 100 < 105 — the packing bin rule)
    val perGroup = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perGroup === Map("0" -> 11, "1" -> 11, "2" -> 11))
    assert(kept.forall(_.getLong(3) < 105L))
    assert(kept.forall(_.getLong(2) === 10L))
    // matches a driver-side recomputation of the same hash order (one
    // engine round trip for ALL keys, not a job per id)
    val hexOf: Map[Long, String] = spark.range(0, 120).toDF("id")
      .select(col("id"), org.apache.spark.sql.functions.lpad(
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.hex(
          org.apache.spark.sql.functions.shiftrightunsigned(
            org.apache.spark.sql.functions.xxhash64(lit("s1"), col("id")), 4))),
        15, "0").as("hx"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0L until 120L).groupBy(_ % 3).flatMap { case (_, ids) =>
      ids.sortBy(id => (hexOf(id), id)).take(11)
    }.toSet
    assert(kept.map(_.getLong(0)).toSet === want)
    // deterministic under repartitioning
    val again = Splits.sampleByTokenBudgetPerGroup(
        docs.repartition(7), "id", "g", "text", 105L, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(again === kept.map(_.getLong(0)).toSet)
  }

  test("sampleByTokenBudgetPerGroup: tokensCol budgets by a real tokenizer's counts") {
    val docs = spark.range(0, 30).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("text", lit("w w w")) // estimate would say 3
      .withColumn("tk", lit(10L))       // the "real tokenizer" says 10
    // budget 25 with tk=10: 3 docs/group (third straddles at 20 < 25);
    // the estimate path would keep ceil(25/3) = 9
    val byReal = Splits.sampleByTokenBudgetPerGroup(
        docs, "id", "g", "text", budgetTokens = 25L, salt = "s2",
        tokensCol = Some("tk"))
      .collect()
    assert(byReal.length === 9) // 3 groups x 3 docs
    assert(byReal.forall(_.getAs[Long]("tokens") === 10L))
    val byEstimate = Splits.sampleByTokenBudgetPerGroup(
        docs, "id", "g", "text", budgetTokens = 25L, salt = "s2")
      .collect()
    assert(byEstimate.length === 27) // 3 groups x 9 docs
    // lengthBucketBatches takes the same plug-in: tk=10 -> bucket 3
    // everywhere (the estimate would say bucket 1)
    val buckets = Splits.lengthBucketBatches(
        docs, "id", "text", batchSize = 4, salt = "s2", tokensCol = Some("tk"))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    assert(buckets === Seq(3))
    // null token counts refuse loudly (the estimate path's discipline)
    val err = intercept[Exception] {
      Splits.sampleByTokenBudgetPerGroup(
        docs.withColumn("tk",
          when(col("id") === 7, lit(null: java.lang.Long)).otherwise(col("tk"))),
        "id", "g", "text", 25L, salt = "s2", tokensCol = Some("tk")).collect()
    }
    assert(err.getMessage != null && err.getMessage.contains("null tk"))
  }

  test("lengthBucketBatches: exact log2 buckets bound padding waste; batches fill") {
    // token counts crossing the power-of-2 boundaries: 1,2,3,4,7,8,15,16
    val docs = spark.range(0, 400).toDF("id")
      .withColumn("n", (col("id") % 16 + 1).cast("int"))
      .withColumn("text",
        org.apache.spark.sql.functions.expr(
          "array_join(transform(sequence(1, n), x -> 'w'), ' ')"))
    val out = Splits.lengthBucketBatches(docs, "id", "text", batchSize = 8, salt = "b1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // bucket = floor(log2(tokens)): 1->0, 2..3->1, 4..7->2, 8..15->3, 16->4
    out.foreach { case (_, tk, b, _, _) =>
      assert(b === (63 - java.lang.Long.numberOfLeadingZeros(tk)), s"tokens $tk")
    }
    // the padding-waste bound: within ANY batch max/min tokens < 2
    out.groupBy(r => (r._3, r._5)).foreach { case (key, batch) =>
      val tks = batch.map(_._2)
      assert(tks.max < 2 * tks.min, s"batch $key spans ${tks.min}..${tks.max}")
      assert(batch.length <= 8)
    }
    // batches fill: per bucket, only the LAST batch may be short
    out.groupBy(_._3).foreach { case (b, rows) =>
      val sizes = rows.groupBy(_._5).toSeq.sortBy(_._1).map(_._2.length)
      assert(sizes.init.forall(_ == 8), s"bucket $b sizes $sizes")
    }
    // batch_pos is a dense 0..n-1 numbering within the bucket
    out.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // deterministic under repartitioning
    val again = Splits.lengthBucketBatches(
        docs.repartition(7), "id", "text", 8, salt = "b1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("per-group cut: prefix-adversarial group names stay contiguous; null group raises") {
    // group "a" vs "a-05": with a bare 'g || -' key prefix, "a-05..."
    // lands INSIDE group a's metric digit range ('0'..'9') and the
    // groups interleave — the length prefix prevents exactly this
    val docs = spark.range(0, 200).toDF("id")
      .withColumn("g", when(col("id") % 2 === 0, lit("a")).otherwise(lit("a-05")))
      .withColumn("m", col("id"))
    val kept = Splits.cutByQuantileExactPerGroup(docs, "id", "g", "m", 0.5)
      .groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("a" -> 50L, "a-05" -> 50L))
    // and the kept rows are each group's own top half
    val ids = Splits.cutByQuantileExactPerGroup(docs, "id", "g", "m", 0.5)
      .select("id").as[Long].collect().toSet
    assert(ids === (100L until 200L).toSet)
    val withNull = docs.withColumn("g",
      when(col("id") === 0, lit(null: String)).otherwise(col("g")))
    val e = intercept[Exception] {
      Splits.cutByQuantileExactPerGroup(withNull, "id", "g", "m", 0.5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null")), msgs(e).mkString(" | "))
  }

  test("order-key id guard refuses >20-char and negative ids loudly") {
    val neg = Seq((-1L, 5L), (2L, 7L)).toDF("id", "m")
    val e1 = intercept[Exception] { Splits.shuffleOrder(neg, "id").collect() }
    assert(e1.getMessage.contains("non-negative") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-negative")))
    val long = Seq(("x" * 21, 5L)).toDF("id", "m")
    val e2 = intercept[Exception] { Splits.rankNormalize(long, "id", "m").collect() }
    assert(e2.getMessage.contains("20 chars") ||
      Option(e2.getCause).exists(_.getMessage.contains("20 chars")))
  }
}
