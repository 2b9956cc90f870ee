package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, MostAggregate, SmokeAggregate}
import graft.query.{AggSpec, QueryEngine}
import graft.core.Tables

class AggregateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SmokeAggregate.ntileAverages matches SQL ntile semantics") {
    // 7 values, 3 buckets → sizes 3,2,2
    val got = SmokeAggregate.ntileAverages(Array(1, 2, 3, 4, 5, 6, 7).map(_.toDouble), 3)
    assert(got.toSeq === Seq(2.0, 4.5, 6.5))
    // fewer values than buckets → identity
    assert(SmokeAggregate.ntileAverages(Array(5.0, 9.0), 20).toSeq === Seq(5.0, 9.0))
  }

  test("native smoke equals the compositional smokeByGroup on real data") {
    val ev = Tables.tsEvents(spark, sf("sf0.001"))
    val native = ev.groupBy("stream_id")
      .agg(SmokeAggregate.smoke(col("value")).as("smoke"))
      .orderBy("stream_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val compositional = QueryEngine
      .smokeByGroup(ev, Seq("stream_id"), col("value"), "smoke")
      .orderBy("stream_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(native.length === compositional.length)
    native.zip(compositional).foreach { case ((id1, s1), (id2, s2)) =>
      assert(id1 === id2)
      s1.zip(s2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("native most: mode with deterministic tie-break; null-only group → null") {
    val df = Seq(
      (1, Some("x")), (1, Some("x")), (1, Some("y")), (1, Some("y")), (1, Some("z")),
      (2, None), (2, None))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(MostAggregate.most(col("v")).as("m"))
      .orderBy("g").collect()
    assert(out(0).getString(1) === "x") // tie x/y → smaller wins
    assert(out(1).isNullAt(1))
  }

  test("native most agrees with compositional mostByGroup on real data") {
    val ev = Tables.tsEvents(spark, sf("sf0.001"))
    val native = ev.groupBy("stream_id")
      .agg(MostAggregate.most(col("event_type")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val comp = QueryEngine.mostByGroup(ev, Seq("stream_id"), "event_type", "m")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native === comp)
  }

  test("SQL registration: smoke/most usable from spark.sql") {
    GraftExtensions.register(spark)
    Tables.tsEvents(spark, sf("sf0.001")).createOrReplaceTempView("ev")
    val rows = spark.sql(
      """SELECT stream_id, smoke(value) AS sm, most(event_type) AS mo
        |FROM ev GROUP BY stream_id ORDER BY stream_id""".stripMargin).collect()
    assert(rows.length === 15)
    assert(rows.forall(r => r.getSeq[Double](1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("SQL registration: wrong arity yields the signature, not IndexOutOfBounds") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).limit(5).createOrReplaceTempView("d_arity")
    // too few args for a builder that indexes exprs(1): used to throw raw
    // IndexOutOfBoundsException from inside the registry lambda
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngram_hashes(text) FROM d_arity").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("word_ngram_hashes(text, n)")),
      s"expected the signature in: ${msgs(e)}")
    // too many args on a unary function
    val e2 = intercept[Exception] {
      spark.sql("SELECT simhash60(text, 3) FROM d_arity").collect()
    }
    assert(msgs(e2).exists(m => m != null && m.contains("simhash60(text)")))
  }

  test("SQL registration: fused pipeline scalars usable from spark.sql") {
    GraftExtensions.register(spark)
    Tables.documents(spark, sf("sf0.001")).limit(50)
      .createOrReplaceTempView("docs_sql")
    val rows = spark.sql(
      """SELECT doc_id,
        |       text_fingerprint(text) AS fp,
        |       simhash60(text) AS sh,
        |       text_profile(text).n_tokens AS nt,
        |       size(word_ngram_hashes(text, 3)) AS ng,
        |       size(minhash_signature(word_ngram_hashes(text, 3), 16)) AS mh,
        |       size(minhash_signature_md5(text, 3, 16)) AS mhm
        |FROM docs_sql ORDER BY doc_id""".stripMargin).collect()
    assert(rows.length === 50)
    assert(rows.forall(_.getString(1).length === 32))
    assert(rows.forall(r => r.getLong(3) > 0))
    assert(rows.forall(r => r.getInt(5) === 16 && r.getInt(6) === 16))
    Tables.embeddings(spark, sf("sf0.001")).limit(5)
      .createOrReplaceTempView("emb_sql")
    val dots = spark.sql(
      "SELECT dot_product(embedding, embedding) AS d FROM emb_sql").collect()
    assert(dots.forall(_.getDouble(0) > 0))
    // raw n-grams + the three container-header parsers
    val more = spark.sql(
      """SELECT size(word_ngrams(text, 2)) AS ng,
        |       image_header(encode(text, 'UTF-8')).format AS img,
        |       audio_header(encode(text, 'UTF-8')).format AS aud,
        |       video_header(encode(text, 'UTF-8')).format AS vid
        |FROM docs_sql""".stripMargin).collect()
    assert(more.forall(r => r.getInt(0) > 0))
    assert(more.forall(r =>
      r.getString(1) == "unknown" && r.getString(2) == "unknown" &&
        r.getString(3) == "unknown")) // plain text is no container
    // positional n-gram hashes: index = token position, no dedup/sort
    val posr = spark.sql(
      """SELECT size(word_ngram_pos_hashes(text, 3)) AS np,
        |       size(split(trim(text), '\\s+')) AS nt
        |FROM docs_sql""".stripMargin).collect()
    assert(posr.forall(r => r.getInt(0) === math.max(0, r.getInt(1) - 2)))
    // second-moment aggregate: [n, d sums, d(d+1)/2 products]
    val op = spark.sql(
      "SELECT outer_product(embedding, 64, 1000000.0) AS op FROM emb_sql")
      .collect()(0).getSeq[Long](0)
    assert(op.length === 1 + 64 + 64 * 65 / 2 && op(0) === 5L)
    // bloom primitives: positions are k-per-distinct-gram, the bitmap
    // OR-fold is one fixed-size row
    val bloom = spark.sql(
      """SELECT bitmap_or(bloom_ngram_positions(text, 3, 65536, 4, false), 65536) AS bm
        |FROM docs_sql""".stripMargin).collect()(0).getSeq[Long](0)
    assert(bloom.length === 65536 / 64)
    assert(bloom.map(java.lang.Long.bitCount).sum > 0)
  }

  test("most_array: mode over an array-valued column (A3)") {
    // the reference round-trips arrays through array_to_string; Spark
    // groups on array values directly
    val df = Seq(
      (1, Seq(1, 2)), (1, Seq(1, 2)), (1, Seq(9)),
      (2, Seq(7)))
      .toDF("g", "arr")
    val out = QueryEngine.mostByGroup(df, Seq("g"), "arr", "m")
      .orderBy("g").collect()
    assert(out(0).getSeq[Int](1) === Seq(1, 2))
    assert(out(1).getSeq[Int](1) === Seq(7))
  }

  test("most_array: string-form tie-break is deterministic (A3)") {
    // two arrays tie on count → winner is the smaller '|'-joined string,
    // matching the reference's array_to_string round-trip collation
    val df = Seq(
      (1, Seq("b", "x")), (1, Seq("b", "x")),
      (1, Seq("a", "z")), (1, Seq("a", "z")))
      .toDF("g", "arr")
    val out = QueryEngine.mostArrayByGroup(df, Seq("g"), "arr", "m").collect()
    assert(out.length === 1)
    assert(out(0).getSeq[String](1) === Seq("a", "z"))
  }

  test("smokearray semantics: flatten array column then smoke (A5)") {
    val df = Seq(
      (1, Seq(1.0, 5.0)), (1, Seq(3.0)), (1, Seq(2.0, 4.0)))
      .toDF("g", "arr")
    val out = QueryEngine.smokeByGroup(
      df.withColumn("__sv", explode(col("arr"))), Seq("g"), col("__sv"), "sm")
      .collect()(0).getSeq[Double](1)
    assert(out === Seq(1.0, 2.0, 3.0, 4.0, 5.0)) // 5 values < 20 buckets
  }

  test("ModeMapAggregate: build / merge / pick ride one agg pass (tier mode partials)") {
    import graft.functions.ModeMapAggregate
    // build: value→count map per group; null values ignored; all-null → NULL
    val df = Seq(
      (1, Some("a")), (1, Some("a")), (1, Some("b")),
      (2, Some("x")), (2, None),
      (3, None)).toDF("g", "v")
      .repartition(4) // force partial buffers + serde through the shuffle
    val built = df.groupBy("g").agg(ModeMapAggregate.modeMap(col("v")).as("m"))
    val rows = built.collect().map(r => r.getInt(0) -> Option(r.getMap[String, Long](1))).toMap
    assert(rows(1).get === Map("a" -> 2L, "b" -> 1L))
    assert(rows(2).get === Map("x" -> 1L))
    assert(rows(3).isEmpty, "all-null group yields NULL (join-miss parity)")

    // merge: count maps sum per key across partial rows (the tier fold)
    val merged = built.groupBy(lit(1)).agg(ModeMapAggregate.mergeMaps(col("m")).as("m"))
      .collect()(0).getMap[String, Long](1)
    assert(merged === Map("a" -> 2L, "b" -> 1L, "x" -> 1L))

    // pick: argmax under (count DESC, value ASC) — mostByGroup collation;
    // the tie at count 1 between b and x resolves to b
    val picked = built.groupBy(lit(1))
      .agg(ModeMapAggregate.mostOfMaps(col("m")).as("most"))
      .collect()(0).getString(1)
    assert(picked === "a")
    val tieOnly = built.filter(col("g") =!= 1).groupBy(lit(1))
      .agg(ModeMapAggregate.mostOfMaps(col("m")).as("most"))
      .collect()(0).getString(1)
    assert(tieOnly === "x") // g=3's NULL map is skipped; only x remains
    val tie = Seq((1, Map("b" -> 1L)), (1, Map("x" -> 1L)))
      .toDF("g", "m").groupBy("g")
      .agg(ModeMapAggregate.mostOfMaps(col("m")).as("most"))
      .collect()(0).getString(1)
    assert(tie === "b")

    // long keys use the numeric codec face
    val longs = Seq((1, 7L), (1, 7L), (1, 9L)).toDF("g", "v").repartition(3)
      .groupBy("g").agg(ModeMapAggregate.modeMap(col("v")).as("m"))
      .collect()(0).getMap[Long, Long](1)
    assert(longs === Map(7L -> 2L, 9L -> 1L))
  }

  test("kth_smallest: threshold semantics, staged compaction, unicode byte order") {
    import graft.functions.KthSmallestAggregate.kthSmallest
    // repartition forces serialize/merge across partial buffers; 2k+
    // rows per group exercise the staged compaction
    val df = (0 until 3000).map(i => (s"g${i % 3}", f"k$i%05d")).toDF("g", "key")
      .repartition(7)
    val got = df.groupBy("g").agg(kthSmallest(col("key"), 10).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // group g0 holds k00000, k00003, ...: its 10th smallest is k00027
    assert(got("g0") === "k00027")
    assert(got("g1") === "k00028" && got("g2") === "k00029")
    // a group under k returns its MAX (the keep-everything threshold)
    val small = Seq(("a", "x2"), ("a", "x1")).toDF("g", "key")
    assert(small.groupBy("g").agg(kthSmallest(col("key"), 10))
      .collect()(0).getString(1) === "x2")
    // all-null group → null; nulls skipped otherwise
    val withNulls = Seq(("a", null), ("a", "m"), ("b", null))
      .toDF("g", "key")
    val n = withNulls.groupBy("g").agg(kthSmallest(col("key"), 1).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(n("a") === "m" && n("b") === null)
    // code-point order: U+E000 (3-byte UTF-8) sorts BELOW U+10000
    // (supplementary, 4-byte) in UTF-8/DuckDB byte order — java String
    // compareTo would invert this (the surrogate pair 0xD800.. sorts
    // below 0xE000 in UTF-16 units and would win the "smallest" here)
    val uni = Seq(("u", "\uE000"), ("u", new String(Character.toChars(0x10000))))
      .toDF("g", "key")
    assert(uni.groupBy("g").agg(kthSmallest(col("key"), 1))
      .collect()(0).getString(1) === "\uE000")
  }
}
