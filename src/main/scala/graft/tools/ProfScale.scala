package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.pipeline.{Multimodal, Similarity, TextAnalysis}

/** Round-10 scale measurements (solo, noop-sink materialization):
  *
  *   runMain graft.tools.ProfScale <sfDir> mm        — multimodal feature
  *     extraction, per-row mapPartitions vs Arrow-batched columnar form
  *   runMain graft.tools.ProfScale <sfDir> sim       — semantic-dedup and
  *     IVF top-k solo times (the sf1-vs-sf10 scaling proof)
  *   runMain graft.tools.ProfScale <sfDir> twolevel  — nearest-cell
  *     assignment over the whole corpus, flat vs forced two-level at the
  *     corpus's own autoCells count
  *
  * Each section warms once and reports the second run (codegen + scan
  * caches absorbed), matching Bench's warmup discipline.
  */
object ProfScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.lift(1).getOrElse("mm")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime()
      f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROFSCALE $name%-32s $t%8.2f s")
      t
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    what match {
      case "mm" =>
        val media = Multimodal.mediaTableEncoded(Tables.documents(spark, sfDir))
        val tRow = timed("features row-form")(sink(
          Multimodal.extractFeatures(spark, media).toDF()))
        val tArrow = timed("features arrow-form")(sink(
          Multimodal.extractFeaturesArrow(spark, media).toDF()))
        println(f"PROFSCALE arrow/row ratio ${tArrow / tRow}%.2f")
        // the REAL codec-free kernels: map-only scans, expected ~linear
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(spark, sfDir)
        timed("ppm decode (real pixels)")(sink(
          Multimodal.mediaTablePpm(docs)
            .select(graft.functions.PpmDecode(col("payload")).as("d"))))
        timed("ppm resize 4x3 + re-decode")(sink(
          Multimodal.mediaTablePpm(docs)
            .select(graft.functions.PpmDecode(
              graft.functions.PpmResize(col("payload"), 4, 3)).as("d"))))
        timed("pcm decode (real samples)")(sink(
          Multimodal.mediaTableEncodedAudio(docs)
            .select(graft.functions.PcmDecode(col("payload")).as("d"))))
        timed("y4m frame-sample step 2")(sink(
          Multimodal.mediaTableY4m(docs)
            .select(graft.functions.Y4mSample(col("payload"), 2).as("d"))))

      case "sim" =>
        val emb = Tables.embeddings(spark, sfDir)
        val n = emb.count()
        println(s"PROFSCALE corpus vectors=$n autoCells=${Similarity.autoCells(n)}")
        val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding")
        timed("semantic_dedup")(sink(
          Similarity.semanticDedupWith(emb, cents, "vec_id", "embedding", 0.3)))
        timed("ivf_topk")(sink(
          Similarity.ivfTopKWith(emb, cents, "vec_id", "embedding", (0L until 50L), 10)))

      case "twolevel" =>
        val emb = Tables.embeddings(spark, sfDir)
        import org.apache.spark.sql.functions.col
        val n = emb.count()
        // measure AT the dispatch point: the local corpora never reach
        // 8M+ vectors (autoCells > TwoLevelCells), so train a matrix of
        // the size the two-level path exists for and time the assignment
        // scan itself — assignment cost depends on k and d, not on how
        // well-populated the cells are
        val k = math.max(Similarity.autoCells(n), 2 * Similarity.TwoLevelCells)
        println(s"PROFSCALE corpus vectors=$n cells=$k")
        val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = k)
        val flat = Similarity.CellIndex(cents, twoLevelAt = Int.MaxValue)
        val two = Similarity.CellIndex(cents, twoLevelAt = 1)
        val tF = timed("assign flat")(sink(
          emb.select(flat.nearest(col("embedding"), 1).getItem(0).as("c"))))
        val tT = timed("assign two-level")(sink(
          emb.select(two.nearest(col("embedding"), 1).getItem(0).as("c"))))
        println(f"PROFSCALE twolevel speedup ${tF / tT}%.2fx at k=$k")

      case "hiertrain" =>
        // hierarchical coarse→fine training vs flat training at a
        // past-threshold cell count: wall time AND assignment agreement
        // with the exact flat scan (the recall proxy — how often the
        // two-level probe lands on the true nearest fine cell)
        val emb = Tables.embeddings(spark, sfDir)
        import org.apache.spark.sql.functions.{col, sum => fsum, when => fwhen, lit}
        val n = emb.count()
        val k = math.max(Similarity.autoCells(n), 2 * Similarity.TwoLevelCells)
        println(s"PROFSCALE corpus vectors=$n cells=$k")
        var flatCents: Seq[Seq[Double]] = Nil
        var cb: Similarity.Codebook = null
        val tFlatTrain = timed("train flat (derived grouping)") {
          flatCents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = k)
        }
        val tHier = timed("train hierarchical") {
          cb = Similarity.trainCodebook(emb, "vec_id", "embedding", cells = k,
            twoLevelAt = Similarity.TwoLevelCells)
        }
        println(f"PROFSCALE hier/flat train ratio ${tHier / tFlatTrain}%.2f")
        // assignment agreement: two-level probe vs exact flat scan over
        // the SAME matrix (flat matrix with derived grouping, then the
        // trained codebook with its trained grouping)
        def agree(fine: Seq[Seq[Double]],
            g: Option[(Seq[Seq[Double]], Seq[Seq[Int]])]): Double = {
          val exact = Similarity.CellIndex(fine, twoLevelAt = Int.MaxValue)
          val probe = Similarity.CellIndex(fine, twoLevelAt = 1, pretrained = g)
          val r = emb.select(
            fwhen(exact.nearest(col("embedding"), 1).getItem(0) ===
              probe.nearest(col("embedding"), 1).getItem(0), lit(1L))
              .otherwise(lit(0L)).as("m"))
            .agg(fsum(col("m"))).collect()(0).getLong(0)
          r.toDouble / n
        }
        println(f"PROFSCALE assign agreement derived  ${agree(flatCents, None)}%.4f")
        println(f"PROFSCALE assign agreement trained  ${agree(cb.fine, cb.grouping)}%.4f")

      case "nrtier" =>
        // nearest-rank tier build/serve vs the interpolated default: the
        // byte-parity mode stores 19 extra longs per (stream, bin) row
        // (smoken__) and swaps the grid interpolation for index lookups —
        // quantify what parity costs at tier-build and serve time
        import graft.query.AggSpec
        val ev = Tables.tsEvents(spark, sfDir)
        val labels = graft.SparkEntry.labelsFor(spark, sfDir)
        def build(nr: Boolean) = graft.rollup.Rollup.buildMulti(
          ev, 3600, Seq("value"), smokeCols = Seq("value"), smokeNearestRank = nr)
        timed("tier build interpolated")(sink(build(false)))
        timed("tier build nearest-rank")(sink(build(true)))
        // serve from DISK (the production read path), not from cache —
        // two cached sf10 tiers overflow a default-size heap, and the
        // serving economy being measured reads tier parquet anyway
        val tmp = java.nio.file.Files.createTempDirectory("profscale_nr").toString
        graft.streaming.RollupStream.appendPartials(
          ev, 3600, "value", s"$tmp/interp", epoch = 0L, smokeCols = Seq("value"))
        graft.streaming.RollupStream.appendPartials(
          ev, 3600, "value", s"$tmp/nr", epoch = 0L, smokeCols = Seq("value"),
          smokeNearestRank = true)
        val tInterp = graft.streaming.RollupStream.readTier(spark, s"$tmp/interp")
        val tNr = graft.streaming.RollupStream.readTier(spark, s"$tmp/nr")
        timed("serve interpolated")(sink(graft.rollup.Rollup.aggregatedFromTier(
          tInterp, labels, Seq(AggSpec("value", "avg"), AggSpec("value", "smoke")),
          graft.SparkEntry.Start, graft.SparkEntry.Stop, binsize = 21600,
          primaryCol = "value")))
        timed("serve nearest-rank+clamp")(sink(graft.rollup.Rollup.aggregatedFromTier(
          tNr, labels, Seq(AggSpec("value", "avg"), AggSpec("value", "smoke")),
          graft.SparkEntry.Start, graft.SparkEntry.Stop, binsize = 21600,
          primaryCol = "value", sparseClamp = true, smokeNearestRank = true)))

      case "tierranged" =>
        // heap-bounded tier build: single-pass buildMulti holds every
        // (stream, bin) group's collect_list grid concurrently (the
        // ~48 GB single-JVM sf100 observation); the ranged form builds
        // per stream-id range under its own epoch — peak aggregate state
        // divided by `ranges`, serve byte-identical (spec-pinned). Run
        // this at sf100 with SPARK_DRIVER_MEM=16g: the whole-pass arm is
        // EXPECTED to spill hard or die there; the ranged arm must not.
        val ev = Tables.tsEvents(spark, sfDir)
          .select("stream_id", "timestamp", "value")
        val ranges = args.lift(2).map(_.toInt).getOrElse(16)
        println(s"PROFSCALE heap=${Runtime.getRuntime.maxMemory / (1 << 20)} MB ranges=$ranges")
        val tmp = java.nio.file.Files.createTempDirectory("profscale_tr").toString
        val tR0 = System.nanoTime()
        graft.streaming.RollupStream.appendPartialsRanged(
          ev, 3600, "value", s"$tmp/ranged", baseEpoch = 0L, ranges = ranges,
          smokeCols = Seq("value"))
        println(f"PROFSCALE tier build ranged               ${(System.nanoTime() - tR0) / 1e9}%8.2f s")
        try {
          val tW0 = System.nanoTime()
          graft.streaming.RollupStream.appendPartials(
            ev, 3600, "value", s"$tmp/whole", epoch = 0L, smokeCols = Seq("value"))
          println(f"PROFSCALE tier build whole                ${(System.nanoTime() - tW0) / 1e9}%8.2f s")
          // row-count parity witness (full byte parity is spec-pinned)
          val nR = graft.streaming.RollupStream.readTier(spark, s"$tmp/ranged").count()
          val nW = graft.streaming.RollupStream.readTier(spark, s"$tmp/whole").count()
          println(s"PROFSCALE tier rows ranged=$nR whole=$nW " +
            (if (nR == nW) "(equal)" else "(MISMATCH)"))
        } catch {
          case e: Throwable =>
            println(s"PROFSCALE tier build whole                FAILED: " +
              s"${e.getClass.getSimpleName} (single-pass aggregate state " +
              "exceeds this heap; the ranged build above completed)")
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))

      case "textops" =>
        // round-10 text/embedding additions: solo scale measurements
        val docs = Tables.documents(spark, sfDir)
        val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
        val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
        timed("bm25_topk")(sink(
          TextAnalysis.bm25TopK(docs, "doc_id", "text",
            Seq("spark", "join", "window", "vector"), topK = 15)))
        timed("lm_familiarity")(sink(
          TextAnalysis.lmFamiliarity(docs, "doc_id", "text")))
        timed("bloom_decontaminate")(sink(
          graft.pipeline.Dedup.decontaminateBloom(
            train, bench, "doc_id", "text", 3)))
        timed("exact_decontaminate")(sink(
          graft.pipeline.Dedup.decontaminate(
            train, bench, "doc_id", "text", 3)))
        timed("cont_span")(sink(
          graft.pipeline.Dedup.contaminatedSpanCoverage(
            train, bench, "doc_id", "text", 3)))
        timed("cont_span_clean")(sink(
          graft.pipeline.Dedup.contaminatedSpanClean(
            train, bench, "doc_id", "text", 3)))
        timed("random_projection")(sink(
          Similarity.randomProjection(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding", 64, 16)))
        // round-16 additions: fused map-only text expressions, solo
        locally {
          import org.apache.spark.sql.functions.{col, concat, lit}
          timed("token_entropy")(sink(docs.select(
            graft.functions.TokenEntropy(col("text")).as("e"))))
          timed("html_extract")(sink(docs.select(
            graft.functions.HtmlExtract(concat(
              lit("<html><body><p>"), col("text"),
              lit("</p><script>x=1</script></body></html>"))).as("c"))))
          timed("url_parts")(sink(docs.select(
            graft.functions.UrlParts(concat(
              lit("https://Host.Example.com:8080/p/"), col("doc_id"),
              lit("?utm_s=1&b=2&a=3#f"))).as("u"))))
          timed("wordpiece_encode")(sink(docs.select(
            graft.functions.WordPieceEncode(
              col("text"), graft.functions.WordPieceEncode.GateVocab).as("w"))))
          timed("winnow_fingerprint")(sink(docs.select(
            graft.functions.WinnowFingerprint(col("text"), 3, 4).as("f"))))
        }

      case "pii" =>
        // q_pii_scan decomposition: which of the 8 regexp passes (4
        // counts + 4 layered replaces) carries the cost, and what a
        // fused hand scanner could win
        import org.apache.spark.sql.functions.col
        val docsP = Tables.documents(spark, sfDir).select("doc_id", "text")
          .localCheckpoint()
        val n = docsP.count()
        timed(s"pii counts only x$n")(sink(docsP.select(
          col("doc_id"),
          TextAnalysis.emailCount(col("text")).as("n_emails"),
          TextAnalysis.ipv4Count(col("text")).as("n_ipv4"),
          TextAnalysis.phoneCount(col("text")).as("n_phones"),
          TextAnalysis.idNumberCount(col("text")).as("n_idnums"))))
        timed(s"pii redact only x$n")(sink(docsP.select(
          col("doc_id"), TextAnalysis.piiRedact(col("text")).as("redacted"))))
        timed(s"pii full scan  x$n")(sink(
          TextAnalysis.piiScan(docsP, "doc_id", "text")))

      case "textfast" =>
        // the sf100-endurance subset of textops: the scale-path
        // operators only (the exact decontaminate join's saturated-
        // vocabulary blowup is already demonstrated at sf10 — 89 s —
        // and unbudgeted it would run for hours here)
        val docs = Tables.documents(spark, sfDir)
        val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
        val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
        timed("bloom_decontaminate")(sink(
          graft.pipeline.Dedup.decontaminateBloom(
            train, bench, "doc_id", "text", 3)))
        timed("cont_span")(sink(
          graft.pipeline.Dedup.contaminatedSpanCoverage(
            train, bench, "doc_id", "text", 3)))
        timed("bm25_topk")(sink(
          TextAnalysis.bm25TopK(docs, "doc_id", "text",
            Seq("spark", "join", "window", "vector"), topK = 15)))
        timed("lm_familiarity")(sink(
          TextAnalysis.lmFamiliarity(docs, "doc_id", "text")))
        timed("corpus_card")(sink(
          TextAnalysis.corpusCard(docs, "source", "text", "lang")))
        timed("random_projection")(sink(
          Similarity.randomProjection(
            Tables.embeddings(spark, sfDir), "vec_id", "embedding", 64, 16)))

      case "lm" =>
        // skew-hardening A/B: the salted hot-gram lookup vs the plain
        // gram equi-join (hotK = 0) on the same corpus — the delta is
        // the straggler cost of the Zipf head
        val docs = Tables.documents(spark, sfDir)
        timed("lm_salted")(sink(
          TextAnalysis.lmFamiliarity(docs, "doc_id", "text", hotK = 4096)))
        timed("lm_unsalted")(sink(
          TextAnalysis.lmFamiliarity(docs, "doc_id", "text")))

      case "incdedup" =>
        // incremental-vs-full A/B: a 10% batch arrives against a 90%
        // standing corpus. Full recompute re-signs everything and
        // regenerates corpus×corpus pairs; the incremental probe signs
        // only the batch and joins the persisted index. The gap is the
        // recurring per-batch cost a growing corpus pays forever.
        import graft.pipeline.Dedup
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(spark, sfDir)
        val batch = docs.filter(col("doc_id") % 10 === 0)
        val standing = docs.filter(col("doc_id") % 10 =!= 0)
        val tmp = java.nio.file.Files.createTempDirectory("graft_inc_idx").toString
        val tb0 = System.nanoTime()
        Dedup.minhashSignatures(standing, "doc_id", "text", 3, 64)
          .write.mode("overwrite").parquet(s"$tmp/index")
        println(f"PROFSCALE index_build_once                ${(System.nanoTime() - tb0) / 1e9}%8.2f s")
        val index = spark.read.parquet(s"$tmp/index")
        // isolate the two arms: pinned signature caches from one run must
        // not pressure the other (Bench.run's per-query discipline)
        Dedup.unpersistIntermediates(); spark.catalog.clearCache()
        timed("probe_incremental") {
          sink(Dedup.minhashLshPairsAgainst(
            Dedup.minhashSignatures(batch, "doc_id", "text", 3, 64),
            index, "doc_id", 64, 16, 0.5))
          Dedup.unpersistIntermediates()
        }
        spark.catalog.clearCache()
        timed("full_recompute") {
          sink(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 64, 16, 0.5))
          Dedup.unpersistIntermediates()
        }
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))

      case "incdedupkb" =>
        // the incdedup A/B again, on KB-SIZED documents: the sf corpora's
        // ~30-token docs make banding joins the cost center, understating
        // the probe's advantage (r11 measured only 5.3 vs 6.6 s at sf10).
        // Real web documents are KBs — shingling + 64-hash signing
        // dominates, and THAT is the work the incremental probe avoids
        // re-doing over the standing corpus. Build KB docs by folding 30
        // source docs into one (distinct texts, so shingles stay varied).
        import graft.pipeline.Dedup
        import org.apache.spark.sql.functions.{col, collect_list, concat_ws, length => flength}
        val kb = Tables.documents(spark, sfDir)
          .groupBy((col("doc_id") / 30).cast("long").as("doc_id"))
          .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
          .localCheckpoint()
        val stats = kb.agg(
          org.apache.spark.sql.functions.count(col("doc_id")),
          org.apache.spark.sql.functions.avg(flength(col("text")))).collect()(0)
        println(f"PROFSCALE kb corpus docs=${stats.getLong(0)} avg_chars=${stats.getDouble(1)}%.0f")
        val batch = kb.filter(col("doc_id") % 10 === 0)
        val standing = kb.filter(col("doc_id") % 10 =!= 0)
        val tmp = java.nio.file.Files.createTempDirectory("graft_inckb_idx").toString
        val tb0 = System.nanoTime()
        Dedup.minhashSignatures(standing, "doc_id", "text", 3, 64)
          .write.mode("overwrite").parquet(s"$tmp/index")
        println(f"PROFSCALE index_build_once                ${(System.nanoTime() - tb0) / 1e9}%8.2f s")
        val index = spark.read.parquet(s"$tmp/index")
        Dedup.unpersistIntermediates(); spark.catalog.clearCache()
        val tProbe = timed("probe_incremental") {
          sink(Dedup.minhashLshPairsAgainst(
            Dedup.minhashSignatures(batch, "doc_id", "text", 3, 64),
            index, "doc_id", 64, 16, 0.5))
          Dedup.unpersistIntermediates()
        }
        spark.catalog.clearCache()
        val tFull = timed("full_recompute") {
          sink(Dedup.minhashLshPairs(kb, "doc_id", "text", 3, 64, 16, 0.5))
          Dedup.unpersistIntermediates()
        }
        println(f"PROFSCALE incdedupkb full/probe ratio ${tFull / tProbe}%.2fx")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))

      case "wire" =>
        // serve-layer scale point (VERDICT r10 #6): the socket surface —
        // aggregate, full-corpus history backfill (Service chunking +
        // JSON + zlib + Wire framing), and the subscribe live seam under
        // publish load — measured at a real sf, not just spec-green
        import java.io.{DataInputStream, DataOutputStream}
        import java.net.Socket
        import graft.serve.{Service, Wire, WireServer}
        import graft.streaming.Markers
        val events = Tables.tsEvents(spark, sfDir)
        val ids = events.select("stream_id").distinct()
          .collect().map(_.getLong(0)).sorted
        val svc = new Service(
          spark,
          data = Map("amp-external" -> events),
          streams = Map("amp-external" -> events.select("stream_id").distinct()))

        def readFrame(in: DataInputStream): Wire.Message = {
          val header = new Array[Byte](Wire.HeaderLen)
          in.readFully(header)
          val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
          val body = new Array[Byte](len)
          in.readFully(body)
          Wire.Message(
            header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
        }
        def labelsJson(nLabels: Int): String =
          ids.zipWithIndex.groupBy(_._2 % nLabels).toSeq.sortBy(_._1)
            .map { case (i, xs) => s""""g$i":[${xs.map(_._1).mkString(",")}]""" }
            .mkString("{", ",", "}")

        // 1. aggregate over the socket: all streams, 2 labels, 600 s bins
        {
          val server = new WireServer(svc)
          val req =
            s"""{"request":"aggregate","collection":"amp-external",
               |"labels":${labelsJson(2)},
               |"start":${graft.SparkEntry.Start},"stop":${graft.SparkEntry.Stop},
               |"binsize":600,
               |"aggs":[["value","avg"],["value","max"],["value","count"]]}""".stripMargin
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sock = new Socket("127.0.0.1", server.boundPort)
          var bytes = 0L
          try {
            val out = new DataOutputStream(sock.getOutputStream)
            out.write(Wire.pack(0, req.getBytes("UTF-8"))); out.flush()
            sock.shutdownOutput()
            val in = sock.getInputStream
            val buf = new Array[Byte](1 << 16)
            var n = in.read(buf)
            while (n >= 0) { bytes += n; n = in.read(buf) }
          } finally { sock.close(); server.close() }
          val t = (System.nanoTime() - t0) / 1e9
          println(f"PROFSCALE wire_aggregate                  $t%8.2f s  (${bytes / 1e6}%.1f MB)")
        }

        // 2. full-corpus history backfill through subscribe (bounded
        //    stop): every row crosses chunking (10k + more), JSON
        //    encode, zlib, framing, and the socket
        {
          val server = new WireServer(svc)
          val req =
            s"""{"request":"subscribe","collection":"amp-external",
               |"labels":${labelsJson(4)},"columns":["value"],
               |"start":${graft.SparkEntry.Start},"stop":${graft.SparkEntry.Stop}}""".stripMargin
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sock = new Socket("127.0.0.1", server.boundPort)
          var frames = 0L
          var bytes = 0L
          try {
            sock.setSoTimeout(600000)
            val out = new DataOutputStream(sock.getOutputStream)
            val in = new DataInputStream(sock.getInputStream)
            out.write(Wire.pack(0, req.getBytes("UTF-8"))); out.flush()
            var m = readFrame(in)
            if (m.msgType == Wire.VersionCheck) m = readFrame(in) // greeting
            while (m.msgType == Wire.History) {
              frames += 1; bytes += m.body.length; m = readFrame(in)
            }
            require(m.msgType == Wire.Subscribe, s"expected ack, got ${m.msgType}")
          } finally { sock.close(); server.close() }
          val t = (System.nanoTime() - t0) / 1e9
          println(f"PROFSCALE wire_history_backfill           $t%8.2f s  ($frames frames, ${bytes / 1e6}%.1f MB zlib)")
        }

        // 3. live seam under load: publish batches INTO the backfill
        //    (relay buffers them), then keep publishing after the ack —
        //    every row must arrive exactly once across the seam
        {
          import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
          val mbus = new Markers.MarkerBus
          val lbus = new Markers.LiveBus
          val server = new WireServer(svc, markers = Some(mbus), live = Some(lbus))
          val schema = StructType(Seq(
            StructField("stream_id", LongType), StructField("timestamp", LongType),
            StructField("value", DoubleType)))
          def row(sid: Long, ts: Long, v: Double) =
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
              Array[Any](sid, ts, v), schema)
          val batches = 200
          val rowsPer = 500
          val expected = batches.toLong * rowsPer
          val req =
            s"""{"request":"subscribe","collection":"amp-external",
               |"labels":${labelsJson(2)},"columns":["value"],
               |"start":${graft.SparkEntry.Start},"stop":0}""".stripMargin
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sock = new Socket("127.0.0.1", server.boundPort)
          try {
            sock.setSoTimeout(600000)
            val out = new DataOutputStream(sock.getOutputStream)
            val in = new DataInputStream(sock.getInputStream)
            out.write(Wire.pack(0, req.getBytes("UTF-8"))); out.flush()
            // publisher: starts on the FIRST frame from the server — by
            // then the relay is registered (registration precedes history
            // streaming in dispatch), so no batch can be published into
            // the void. Early batches land during backfill (buffered by
            // the relay), the rest after the ack (passthrough).
            val pub = new Thread(() => {
              var i = 0
              while (i < batches) {
                val ts = 1906745601L + i
                lbus.publish(Markers.LiveBatch("amp-external",
                  (0 until rowsPer).map(r => row(ids(r % ids.length), ts, r.toDouble))))
                if (i % 20 == 0) mbus.publish(Markers.Marker("amp-external", ts, i.toLong))
                i += 1
              }
            })
            pub.setDaemon(true)
            var ackAt = 0.0
            var liveRows = 0L
            var liveBytes = 0L
            var started = false
            while (liveRows < expected) {
              val m = readFrame(in)
              // the greeting precedes relay registration — a publisher
              // started on it would publish into the void
              if (!started && m.msgType != Wire.VersionCheck) {
                started = true; pub.start()
              }
              if (m.msgType == Wire.Subscribe) ackAt = (System.nanoTime() - t0) / 1e9
              else if (m.msgType == Wire.Live) {
                val s = new String(m.body, "UTF-8")
                liveRows += "\"stream_id\"".r.findAllIn(s).size
                liveBytes += m.body.length
              }
            }
            pub.join(60000)
            val t = (System.nanoTime() - t0) / 1e9
            println(f"PROFSCALE wire_subscribe_seam             $t%8.2f s  (backfill+ack $ackAt%.2f s, $liveRows live rows, ${liveBytes / 1e6}%.1f MB)")
          } finally { sock.close(); server.close() }
        }

      case "lineops" =>
        // line-granularity family solo timings: the fused per-doc rule
        // filter (map-only), corpus-global first-occurrence dedup (agg +
        // hash join + per-doc rebuild), boilerplate removal, and the
        // exact containment pair miner (shares the jaccard engine).
        // Docs are synthesized multi-line with the gate's replace trick.
        val docsL = Tables.documents(spark, sfDir).select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.replace(
            org.apache.spark.sql.functions.col("text"),
            org.apache.spark.sql.functions.lit(" merge "),
            org.apache.spark.sql.functions.lit("\n")).as("text"))
        timed("filter_lines (fused rule filter)") {
          Tables.documents(spark, sfDir).select(
            graft.functions.FilterLines(
              org.apache.spark.sql.functions.col("text"), 3,
              Seq("slow", "dup"), requireTerminalPunct = true).as("r"))
            .selectExpr("sum(r.n_kept)").collect()
        }
        timed("line dedup (corpus-global firsts)") {
          graft.pipeline.Lines.dedupLines(docsL, "doc_id", "text")
            .selectExpr("sum(n_kept)").collect()
        }
        timed("boilerplate lines (hot-line cut)") {
          graft.pipeline.Lines.boilerplateLines(docsL, "doc_id", "text", 3)
            .selectExpr("sum(n_kept)").collect()
        }
        try {
          timed("containment pairs (exact, shared engine)") {
            graft.pipeline.Dedup.containmentPairs(
              Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.5,
              maxDf = Some(500L),
              maxCandidates = Some(graft.pipeline.Dedup.defaultVolumeBudget(spark)))
              .count()
          }
        } catch {
          case e: IllegalStateException =>
            // the designed outcome on a saturated vocabulary: the exact
            // measure aborts fast and points at the LSH scale path
            println(s"PROFSCALE containment pairs: budget abort (by design) — ${e.getMessage.take(120)}")
        }
        graft.pipeline.Dedup.unpersistIntermediates()

      case "dictscan" =>
        // Aho–Corasick multi-pattern scan vs the naive per-term form.
        // The automaton is ONE pass over the text regardless of |dict|;
        // the naive form ((len(text)-len(replace(text,t)))/len(t) summed
        // over terms) re-scans the corpus once per term — linear in
        // |dict|. Dictionary = corpus top terms (deterministic).
        import org.apache.spark.sql.functions.{col, length => flen,
          lit, replace => freplace}
        val docsD = Tables.documents(spark, sfDir).select("doc_id", "text")
          .localCheckpoint()
        val allTerms = graft.pipeline.TextAnalysis.topTerms(docsD, "text", 5000)
          .collect().map(_.getString(0)).toSeq
        def acScan(k: Int): Long = {
          val d = allTerms.take(k)
          docsD.select(graft.functions.DictScan(col("text"), d).as("r"))
            .selectExpr("sum(r.n_hits)").collect()(0).getLong(0)
        }
        def naiveScan(k: Int): Long = {
          val d = allTerms.take(k)
          val total = d.map(t =>
            ((flen(col("text")) - flen(freplace(col("text"), lit(t), lit("")))) /
              lit(t.length)).cast("long"))
            .reduce(_ + _)
          docsD.select(total.as("h")).selectExpr("sum(h)").collect()(0).getLong(0)
        }
        acScan(100) // warm codegen once
        var h100 = 0L; var h1000 = 0L; var h5000 = 0L; var hN = 0L
        timed("dict_scan |dict|=100")  { h100 = acScan(100) }
        timed("dict_scan |dict|=1000") { h1000 = acScan(1000) }
        timed("dict_scan |dict|=5000") { h5000 = acScan(5000) }
        timed("naive replace-count |dict|=100") { hN = naiveScan(100) }
        // parity guard: overlapping vs non-overlapping counts agree here
        // because corpus top TERMS are whole words (no self-overlap)
        require(h100 == hN, s"hit-count parity broke: ac $h100 vs naive $hN")
        println(s"PROFSCALE dictscan hits: 100=$h100 1000=$h1000 5000=$h5000")

      case "mm18" =>
        // the round-18 kernels solo: payloads materialized once
        // (localCheckpoint) so timings isolate DECODE from the
        // fixtures' generator cost; all four are map-only fused
        // expressions, expected ~linear in corpus size
        import org.apache.spark.sql.functions.col
        val docs18 = Tables.documents(spark, sfDir)
        val flacTab = Multimodal.mediaTableFlac(spark, docs18)
          .select("media_id", "payload").localCheckpoint()
        val nFl = flacTab.count()
        var flacSamples = 0L
        val tFl = timed(s"flac_decode x$nFl") {
          val r = flacTab
            .select(graft.functions.FlacDecode(col("payload")).as("d"))
            .selectExpr("sum(d.n_frames)", "count(d.n_frames)").collect()(0)
          require(r.getLong(1) > 0, "no flac decoded")
          flacSamples = r.getLong(0)
        }
        println(f"PROFSCALE flac throughput ${flacSamples / tFl / 1e6}%.1f Msamples/s")
        val audTab = Multimodal.mediaTableAudioMixed(spark, docs18)
          .select("media_id", "payload").localCheckpoint()
        val nAu = audTab.count()
        timed(s"audio_sniff x$nAu") {
          val r = audTab
            .select(graft.functions.AudioDecode(col("payload")).as("d"))
            .selectExpr("count(d.format)").collect()(0)
          require(r.getLong(0) > 0, "no audio decoded")
        }
        val oriTab = Multimodal.mediaTableJpegOriented(spark, docs18)
          .select("media_id", "payload").localCheckpoint()
        val nOr = oriTab.count()
        timed(s"jpeg_oriented x$nOr") {
          val r = oriTab
            .select(graft.functions.JpegOriented(col("payload")).as("d"))
            .selectExpr("count(d.orientation)").collect()(0)
          require(r.getLong(0) > 0, "no oriented jpeg decoded")
        }
        val cmykTab = Multimodal.mediaTableCmyk(spark, docs18)
          .select("media_id", "payload").localCheckpoint()
        val nCk = cmykTab.count()
        timed(s"cmyk_decode x$nCk") {
          val r = cmykTab
            .select(graft.functions.JpegDecode(col("payload")).as("d"))
            .selectExpr("count(d.n_px)").collect()(0)
          require(r.getLong(0) > 0, "no cmyk decoded")
        }

      case "mm19" =>
        // the round-19 kernels solo, mm18 conventions: payloads
        // materialized once so timings isolate the fused kernels
        import org.apache.spark.sql.functions.col
        val docs19 = Tables.documents(spark, sfDir)
        val webpTab = Multimodal.mediaTableWebp(spark, docs19)
          .select("media_id", "payload").localCheckpoint()
        val nWp = webpTab.count()
        var wpPx = 0L
        val tWp = timed(s"webp_decode x$nWp") {
          val r = webpTab
            .select(graft.functions.WebpDecode(col("payload")).as("d"))
            .selectExpr("sum(d.n_px)", "count(d.n_px)").collect()(0)
          require(r.getLong(1) > 0, "no webp decoded")
          wpPx = r.getLong(0)
        }
        println(f"PROFSCALE webp throughput ${wpPx / tWp / 1e6}%.1f Mpx/s")
        val fpTab = Multimodal.mediaTableAudioMixed(spark, docs19)
          .select("media_id", "payload").localCheckpoint()
        val nFp = fpTab.count()
        var fpFrames = 0L
        val tFp = timed(s"audio_fingerprint x$nFp") {
          val r = fpTab
            .select(graft.functions.AudioFingerprint(col("payload"), 9).as("d"))
            .selectExpr("sum(d.n_frames)", "count(d.fp)").collect()(0)
          require(r.getLong(1) > 0, "no audio fingerprinted")
          fpFrames = r.getLong(0)
        }
        println(f"PROFSCALE audiofp throughput ${fpFrames / tFp / 1e6}%.1f Mframes/s")
        val vidTab = Multimodal.mediaTableVideoPairs(docs19)
          .select("media_id", "payload").localCheckpoint()
        val nVd = vidTab.count()
        timed(s"video_frame_sigs x$nVd") {
          val r = vidTab
            .select(graft.functions.VideoFrameSigs(col("payload"), 2, 9, 8).as("d"))
            .selectExpr("count(d.n_sampled)").collect()(0)
          require(r.getLong(0) > 0, "no video signatures")
        }
        val dhTab = Multimodal.mediaTableDhashMixed(spark, docs19)
          .select("media_id", "payload").localCheckpoint()
        val nDh = dhTab.count()
        timed(s"image_dhash_mixed x$nDh") {
          val r = dhTab
            .select(graft.functions.ImageDHash(col("payload"), 9, 8).as("d"))
            .selectExpr("count(d.dhash)").collect()(0)
          require(r.getLong(0) >= 0, "dhash failed")
        }

      case "mm20" =>
        // the round-19 second-sitting kernels solo, mm18 conventions:
        // TIFF (gate arms + a 64×48 LZW raster for per-byte throughput)
        // and the AIFF-inclusive audio sniff
        import org.apache.spark.sql.functions.{col, md5 => fmd5}
        import spark.implicits._
        val docs20 = Tables.documents(spark, sfDir)
        val tiffTab = Multimodal.mediaTableTiff(spark, docs20)
          .select("media_id", "payload").localCheckpoint()
        val nTf = tiffTab.count()
        timed(s"tiff_decode gate-arms x$nTf") {
          val r = tiffTab
            .select(graft.functions.TiffDecode(col("payload")).as("d"))
            .selectExpr("count(d.n_px)").collect()(0)
          require(r.getLong(0) > 0, "no tiff decoded")
        }
        val bigTiff = docs20.select(col("doc_id"), fmd5(col("text")).as("m"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, m) =>
            val need = 64 * 48 * 3
            val sb = new java.lang.StringBuilder(need)
            while (sb.length < need) sb.append(m)
            val comp = Seq(5, 8, 32773, 1)((id % 4).toInt)
            (id, Multimodal.encodeTiff(
              le = id % 2 == 0, photometric = 2, compression = comp,
              predictor = if (id % 3 == 0 && (comp == 5 || comp == 8)) 2 else 1,
              rowsPerStrip = 16, 64, 48, sb.substring(0, need)))
          })
          .toDF("media_id", "payload").localCheckpoint()
        val nBig = bigTiff.count()
        var tfPx = 0L
        val tBig = timed(s"tiff_decode 64x48 x$nBig") {
          val r = bigTiff
            .select(graft.functions.TiffDecode(col("payload")).as("d"))
            .selectExpr("sum(d.n_px)", "count(d.n_px)").collect()(0)
          require(r.getLong(1) == nBig, "big tiff rows dropped")
          tfPx = r.getLong(0)
        }
        println(f"PROFSCALE tiff throughput ${tfPx / tBig / 1e6}%.1f Mpx/s")
        val audTab20 = Multimodal.mediaTableAudioMixed(spark, docs20)
          .select("media_id", "payload").localCheckpoint()
        val nAu = audTab20.count()
        var auFrames = 0L
        val tAu = timed(s"audio_sniff wav/flac/aiff x$nAu") {
          val r = audTab20
            .select(graft.functions.AudioDecode(col("payload")).as("d"))
            .selectExpr("sum(d.n_frames)", "count(d.n_frames)").collect()(0)
          require(r.getLong(1) > 0, "no audio decoded")
          auFrames = r.getLong(0)
        }
        println(f"PROFSCALE audio_sniff throughput ${auFrames / tAu / 1e6}%.1f Mframes/s")

      case "png" =>
        // the real PNG decode kernel solo: payloads are materialized once
        // (localCheckpoint) so the timing isolates the Inflater+unfilter
        // decode from the fixture's ImageIO encode. Two shapes: the
        // gate's tiny images (per-row overhead) and 64×48 rasters
        // (per-byte throughput — the shape a thumbnail/feature pipeline
        // actually decodes).
        import org.apache.spark.sql.functions.{col, md5 => fmd5}
        import spark.implicits._
        val docsP = Tables.documents(spark, sfDir)
        val tiny = graft.pipeline.Multimodal.mediaTablePng(spark, docsP)
          .select("media_id", "payload").localCheckpoint()
        val nTiny = tiny.count()
        timed(s"png_decode tiny x$nTiny") {
          val ok = tiny.select(graft.functions.PngDecode(col("payload")).as("d"))
            .selectExpr("count(d.n_px)").collect()(0).getLong(0)
          require(ok > 0, "no tiny png decoded")
        }
        val big = docsP.select(col("doc_id"), fmd5(col("text")).as("m"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, m) =>
            val rgba = id % 2 == 1
            val need = 64 * 48 * (if (rgba) 4 else 3)
            (id, graft.pipeline.Multimodal.encodeRaster(
              "png", 64, 48, rgba, (m * 384).substring(0, need)))
          })
          .toDF("media_id", "payload").localCheckpoint()
        val nBig = big.count()
        val rasterBytes = nBig * 64L * 48 * 7 / 2 // avg of bpp 3 and 4
        var t = 0.0
        t = timed(s"png_decode 64x48 x$nBig") {
          val ok = big.select(graft.functions.PngDecode(col("payload")).as("d"))
            .selectExpr("count(d.n_px)").collect()(0).getLong(0)
          require(ok == nBig, s"decoded $ok of $nBig")
        }
        println(f"PROFSCALE png raster throughput ${rasterBytes / t / 1e6}%.1f MB/s")
        // the non-truecolor variants (palette lookup / gray expansion)
        // and Adam7 at the same 64×48 shape — palette is 1 byte/px so
        // the per-byte rate divides differently; report per-PIXEL rates
        for ((label, variant, il) <- Seq(
            ("palette", 0, false), ("gray", 1, false), ("grayalpha", 2, false),
            ("palette Adam7", 0, true), ("rgb Adam7", -1, true))) {
          val bpv = variant match { case 2 => 2; case -1 => 3; case _ => 1 }
          val enc = docsP.select(col("doc_id"), fmd5(col("text")).as("m"))
            .as[(Long, String)]
            .mapPartitions(_.map { case (id, m) =>
              val need = 64 * 48 * bpv
              val px = (m * 384).substring(0, need)
              (id,
                if (variant < 0)
                  graft.pipeline.Multimodal.encodeRaster(
                    "png", 64, 48, rgba = false, px, interlaced = il)
                else
                  graft.pipeline.Multimodal.encodeRasterIndexedOrGray(
                    variant, 64, 48, px, interlaced = il))
            })
            .toDF("media_id", "payload").localCheckpoint()
          val nE = enc.count()
          val tv = timed(s"png_decode $label 64x48 x$nE") {
            val ok = enc.select(graft.functions.PngDecode(col("payload")).as("d"))
              .selectExpr("count(d.n_px)").collect()(0).getLong(0)
            require(ok == nE, s"$label: decoded $ok of $nE")
          }
          println(f"PROFSCALE png $label%-14s ${nE * 64L * 48 / tv / 1e6}%.1f Mpx/s")
        }

      case "bpe" =>
        // the real tokenizer solo: training (one word-count agg + driver
        // loop over the top-2048 vocab) and fused encode (merge table in
        // the closure, per-thread segmentation cache) — both expected
        // ~linear in corpus bytes, training driver phase O(vocab·merges)
        import org.apache.spark.sql.functions.col
        val docsB = Tables.documents(spark, sfDir).select("doc_id", "text")
          .localCheckpoint()
        val n = docsB.count()
        var merges: Seq[(String, String)] = Nil
        timed(s"bpe train (48 merges, $n docs)") {
          merges = graft.pipeline.Bpe.trainMerges(docsB, "text",
            vocabCap = 2048, maxMerges = 48)
        }
        timed(s"bpe encode x$n") {
          val toks = docsB
            .select(graft.functions.BpeEncode(col("text"), merges).as("b"))
            .selectExpr("sum(b.n_tokens)").collect()(0).getLong(0)
          println(s"PROFSCALE   $toks tokens")
        }

      case "bpeprod" =>
        // BPE at PRODUCTION vocab scale. The sf corpora replicate a
        // 31-word vocabulary, so a corpus-trained table saturates at a
        // few dozen merges and the segmentation cache hides any
        // table-size cost — this arm instead builds a seeded Zipfian
        // pseudo-corpus with ~60k DISTINCT words (cache misses dominate,
        // the honest regime), trains a 32k-merge table with the indexed
        // trainer, and A/Bs the ranked (Sennrich priority) encode
        // against the replay (oracle-twin) encode at that table size.
        import org.apache.spark.sql.functions.col
        // shared with BpeSpec's production-scale divergence pin — both
        // run on the same corpus definition (ZipfCorpus scaladoc)
        val pseudo = ZipfCorpus.build(spark)
        val nP = pseudo.count()
        val distinctWords = pseudo
          .select(org.apache.spark.sql.functions.explode(
            graft.pipeline.Bpe.wordsCol(col("text"))).as("w"))
          .distinct().count()
        println(s"PROFSCALE bpeprod corpus: $nP docs, $distinctWords distinct words")
        var bigTable: Seq[(String, String)] = Nil
        val tTrain = {
          val t0 = System.nanoTime()
          bigTable = graft.pipeline.Bpe.trainMergesIndexed(pseudo, "text",
            vocabCap = 49152, maxMerges = 32768, minPairCount = 2L)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROFSCALE bpeprod train indexed   $tTrain%8.2f s (${bigTable.length} merges)")
        def encodeTokens(ranked: Boolean): Long = pseudo
          .select(graft.functions.BpeEncode(col("text"), bigTable, ranked).as("b"))
          .selectExpr("sum(b.n_tokens)").collect()(0).getLong(0)
        var toksRanked = 0L
        val tRanked = timed(s"bpeprod encode RANKED x$nP") { toksRanked = encodeTokens(true) }
        println(f"PROFSCALE bpeprod ranked ${toksRanked / tRanked / 1e6}%.1f M tokens/s (${toksRanked} tokens)")
        var toksReplay = 0L
        val tReplay = timed(s"bpeprod encode REPLAY x$nP") { toksReplay = encodeTokens(false) }
        println(f"PROFSCALE bpeprod replay ${toksReplay / tReplay / 1e6}%.1f M tokens/s")
        require(toksRanked == toksReplay,
          s"ranked/replay token totals diverged: $toksRanked vs $toksReplay")
        // indexed-vs-naive trainer A/B at a size the naive form can still
        // do (2048 merges) — the scaling justification for the index
        val tIdx2k = timed("bpeprod train indexed 2048") {
          graft.pipeline.Bpe.trainMergesIndexed(pseudo, "text",
            vocabCap = 16384, maxMerges = 2048, minPairCount = 2L)
        }
        val tNaive2k = timed("bpeprod train naive   2048") {
          graft.pipeline.Bpe.trainMerges(pseudo, "text",
            vocabCap = 16384, maxMerges = 2048, minPairCount = 2L)
        }
        println(f"PROFSCALE bpeprod trainer speedup at 2048: ${tNaive2k / tIdx2k}%.1fx")

      case "groupscan" =>
        // the group-prefix machinery (token-budget sampler, length-bucket
        // batcher) solo at scale: one corpus prefix scan each, group/
        // bucket offsets joined back — expected ~linear, no one-task sort
        import org.apache.spark.sql.functions.col
        val docsG = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
          .localCheckpoint()
        val n = docsG.count()
        println(s"PROFSCALE corpus docs=$n")
        timed("token-budget sampler (per source)") {
          val kept = graft.pipeline.Splits.sampleByTokenBudgetPerGroup(
            docsG, "doc_id", "source", "text",
            budgetTokens = math.max(1000L, n / 10), salt = "gs").count()
          println(s"PROFSCALE   kept $kept of $n")
        }
        timed("length-bucket batches (batch 1024)") {
          val batches = graft.pipeline.Splits.lengthBucketBatches(
            docsG.select("doc_id", "text"), "doc_id", "text", 1024, salt = "gs")
            .selectExpr("count(distinct (bucket, batch_id))").collect()(0).getLong(0)
          println(s"PROFSCALE   $batches batches over $n docs")
        }

      case "lineopskb" =>
        // line family at REALISTIC document shape: KB-sized docs (30
        // source docs folded, newline-joined) with a HOT FOOTER line
        // appended to EVERY document — the shape that breaks naive
        // designs (a corpus-wide window over lines puts the whole corpus
        // in the footer's partition). The verdict aggregate must fold the
        // footer map-side: we pin that with the measured shuffle-record
        // count — the verdict shuffle carries ~distinct-lines-per-
        // partition rows, NOT one row per line occurrence. Run at
        // sf100-folded for the 100x proof (GenScale docs-only chain).
        import org.apache.spark.sql.functions.{col, collect_list, concat,
          concat_ws, lit}
        val kbL = Tables.documents(spark, sfDir)
          .groupBy((col("doc_id") / 30).cast("long").as("doc_id"))
          .agg(concat_ws("\n", collect_list(col("text"))).as("text"))
          .withColumn("text",
            concat(col("text"), lit("\nsubscribe to our newsletter for updates")))
          .localCheckpoint()
        val st = kbL.agg(
          org.apache.spark.sql.functions.count(col("doc_id")),
          org.apache.spark.sql.functions.avg(
            org.apache.spark.sql.functions.length(col("text")))).collect()(0)
        println(f"PROFSCALE kb corpus docs=${st.getLong(0)} avg_chars=${st.getDouble(1)}%.0f (hot footer in every doc)")
        val totalLines = kbL.selectExpr(
          "sum(size(split(text, '\n')))").collect()(0).getLong(0)
        // count shuffle records across the job: the fold ratio
        val shuffled = new java.util.concurrent.atomic.AtomicLong()
        val lis = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
        }
        def foldRatio[T](name: String)(body: => T): Unit = {
          shuffled.set(0L)
          spark.sparkContext.addSparkListener(lis)
          try { timed(name)(body) }
          finally {
            spark.sparkContext.removeSparkListener(lis)
            val s = shuffled.get()
            println(f"PROFSCALE   $name: $totalLines lines -> $s shuffle records " +
              f"(fold ratio ${totalLines.toDouble / math.max(1L, s)}%.1fx)")
          }
        }
        foldRatio("kb filter_lines (fused, map-only)") {
          kbL.select(
            graft.functions.FilterLines(col("text"), 3,
              Seq("slow", "dup"), requireTerminalPunct = false).as("r"))
            .selectExpr("sum(r.n_kept)").collect()
        }
        var dedupShuffleA = 0L
        foldRatio("kb line dedup (corpus firsts, hot footer)") {
          graft.pipeline.Lines.dedupLines(kbL, "doc_id", "text")
            .selectExpr("sum(n_kept)").collect()
          dedupShuffleA = shuffled.get()
        }
        foldRatio("kb boilerplate (hot footer cut)") {
          val out = graft.pipeline.Lines.boilerplateLines(kbL, "doc_id", "text", 3)
            .selectExpr("sum(n_kept)", "sum(n_lines)").collect()(0)
          // the footer is in every doc (> 3 occurrences): every copy cut
          require(out.getLong(0) <= out.getLong(1) - st.getLong(0),
            s"hot footer survived: kept=${out.getLong(0)} lines=${out.getLong(1)}")
        }
        // THE fold proof: corpus B interleaves the hot footer between
        // every pair of lines — ~totalLines EXTRA occurrences of ONE
        // line. If the verdict aggregate folds map-side, the dedup
        // shuffle grows by ~(partitions) records, not by ~totalLines;
        // the marginal ratio (added occurrences / added shuffle records)
        // is the hot-line partial-aggregation ratio.
        val kbHot = kbL.withColumn("text",
          org.apache.spark.sql.functions.regexp_replace(
            col("text"), "\n", "\nsubscribe to our newsletter for updates\n"))
          .localCheckpoint()
        val hotLines = kbHot.selectExpr(
          "sum(size(split(text, '\n')))").collect()(0).getLong(0)
        shuffled.set(0L)
        spark.sparkContext.addSparkListener(lis)
        try {
          timed("kb line dedup (footer interleaved everywhere)") {
            graft.pipeline.Lines.dedupLines(kbHot, "doc_id", "text")
              .selectExpr("sum(n_kept)").collect()
          }
        } finally spark.sparkContext.removeSparkListener(lis)
        val added = hotLines - totalLines
        println(f"PROFSCALE   end-to-end marginal: +$added occurrences of ONE line -> " +
          f"+${shuffled.get() - dedupShuffleA} shuffle records " +
          "(the verdict join + rebuild carry every REAL row once each — " +
          "structural, per-key-flat; the hot join partition is AQE skew-split)")
        // isolate the VERDICT AGGREGATE (the piece that must never build
        // a posting list for a hot line): min(struct(id,ord)) on md5(line),
        // solo, on both corpora — the marginal shuffle records per added
        // hot occurrence is the partial-aggregation (map-side fold) proof
        import org.apache.spark.sql.functions.{length => flen, md5,
          min, posexplode, split, struct, trim}
        def verdictAggRecords(src: org.apache.spark.sql.DataFrame): Long = {
          shuffled.set(0L)
          spark.sparkContext.addSparkListener(lis)
          try {
            src.select(col("doc_id").as("__id"),
                posexplode(split(col("text"), "\n", -1)).as(Seq("__ord", "__line")))
              .filter(flen(trim(col("__line"))) >= 1)
              .groupBy(md5(col("__line")).as("__h"))
              .agg(min(struct(col("__id"), col("__ord"))).as("__first"))
              .selectExpr("count(1)", "min(__first.__id)").collect()
          } finally spark.sparkContext.removeSparkListener(lis)
          shuffled.get()
        }
        val aggA = verdictAggRecords(kbL)
        val aggB = verdictAggRecords(kbHot)
        println(f"PROFSCALE   verdict agg solo: +$added hot occurrences -> " +
          f"+${aggB - aggA} agg shuffle records " +
          f"(hot-line partial-aggregation ratio ${
            added.toDouble / math.max(1L, aggB - aggA)}%.0fx)")

      case "pump" =>
        // prefetch-pump A/B (r12 notes' "next floor"): the history
        // backfill's two serial phases — partition compute and driver-side
        // encode (JSON + zlib + framing + socket) — overlap under
        // Prefetch.rows. Same subscribe-drain harness as the `wire`
        // section; one untimed warmup absorbs JVM/listing cold cost, then
        // each arm toggles spark.graft.serve.prefetch.
        import java.io.{DataInputStream, DataOutputStream}
        import java.net.Socket
        import graft.serve.{Service, Wire, WireServer}
        val events = Tables.tsEvents(spark, sfDir)
        val ids = events.select("stream_id").distinct()
          .collect().map(_.getLong(0)).sorted
        val svc = new Service(
          spark,
          data = Map("amp-external" -> events),
          streams = Map("amp-external" -> events.select("stream_id").distinct()))
        def labelsJson(nLabels: Int): String =
          ids.zipWithIndex.groupBy(_._2 % nLabels).toSeq.sortBy(_._1)
            .map { case (i, xs) => s""""g$i":[${xs.map(_._1).mkString(",")}]""" }
            .mkString("{", ",", "}")
        def readFrame(in: DataInputStream): Wire.Message = {
          val header = new Array[Byte](Wire.HeaderLen)
          in.readFully(header)
          val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
          val body = new Array[Byte](len)
          in.readFully(body)
          Wire.Message(
            header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
        }
        def backfill(): (Double, Long) = {
          val server = new WireServer(svc)
          val req =
            s"""{"request":"subscribe","collection":"amp-external",
               |"labels":${labelsJson(4)},"columns":["value"],
               |"start":${graft.SparkEntry.Start},"stop":${graft.SparkEntry.Stop}}""".stripMargin
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sock = new Socket("127.0.0.1", server.boundPort)
          var frames = 0L
          try {
            sock.setSoTimeout(600000)
            val out = new DataOutputStream(sock.getOutputStream)
            val in = new DataInputStream(sock.getInputStream)
            out.write(Wire.pack(0, req.getBytes("UTF-8"))); out.flush()
            var m = readFrame(in)
            if (m.msgType == Wire.VersionCheck) m = readFrame(in) // greeting
            while (m.msgType == Wire.History) { frames += 1; m = readFrame(in) }
            require(m.msgType == Wire.Subscribe, s"expected ack, got ${m.msgType}")
          } finally { sock.close(); server.close() }
          ((System.nanoTime() - t0) / 1e9, frames)
        }
        backfill() // untimed warmup (prefetch on — the default)
        spark.conf.set("spark.graft.serve.prefetch", "false")
        val (tOff, fOff) = backfill()
        println(f"PROFSCALE pump_backfill_tolocal           $tOff%8.2f s  ($fOff frames)")
        spark.conf.set("spark.graft.serve.prefetch", "true")
        val (tOn, fOn) = backfill()
        println(f"PROFSCALE pump_backfill_prefetch          $tOn%8.2f s  ($fOn frames)")
        require(fOn == fOff, s"frame counts differ: $fOn vs $fOff")
        println(f"PROFSCALE pump_speedup                    ${tOff / tOn}%8.2fx")
        // encode-pool A/B on top of the pump (the r12 "next floor": at
        // sf10 the pump hides compute and ENCODE dominates the drain) —
        // pool 1 = serial encode, pool 4 = the default
        spark.conf.set("spark.graft.serve.encodepool", "1")
        val (tE1, fE1) = backfill()
        println(f"PROFSCALE pump_backfill_encpool1          $tE1%8.2f s  ($fE1 frames)")
        spark.conf.set("spark.graft.serve.encodepool", "4")
        val (tE4, fE4) = backfill()
        println(f"PROFSCALE pump_backfill_encpool4          $tE4%8.2f s  ($fE4 frames)")
        require(fE1 == fE4, s"frame counts differ: $fE1 vs $fE4")
        println(f"PROFSCALE encpool_speedup                 ${tE1 / tE4}%8.2fx")
        // windowed partition fetch A/B on the full e2e drain (encode pool
        // at its default): serial toLocalIterator vs 4 concurrent
        // single-partition jobs with ordered emission
        spark.conf.set("spark.graft.serve.pump.window", "1")
        val (tW1, fW1) = backfill()
        println(f"PROFSCALE pump_backfill_window1           $tW1%8.2f s  ($fW1 frames)")
        spark.conf.set("spark.graft.serve.pump.window", "4")
        val (tW4, fW4) = backfill()
        println(f"PROFSCALE pump_backfill_window4           $tW4%8.2f s  ($fW4 frames)")
        require(fW1 == fW4, s"frame counts differ: $fW1 vs $fW4")
        println(f"PROFSCALE pumpwindow_speedup              ${tW1 / tW4}%8.2fx")

      case "pumpfloor" =>
        // component ceilings of the backfill drain (the r12-carried
        // "per-label parallel pump" candidate): with the pump hiding
        // compute and the pool hiding encode, which stage is the FLOOR —
        // distributed compute, the single pump thread (toLocalIterator
        // fetch + deserialize), chunk assembly, frame encode, or the
        // socket? Cumulative stage drains, each full-result:
        //   compute   — the history plan executed with NO driver fetch
        //   chunks    — Service.history iterated, rows discarded
        //               (adds: driver fetch + deserialize + chunking)
        //   enc1/enc4 — + JSON+zlib frame encode, serial / pooled
        //   e2e       — the full socket backfill (pump arm's harness)
        // A per-label parallel pump only pays if (chunks − compute) —
        // the single-thread driver-fetch component — dominates e2e.
        import graft.serve.{Service, Wire, JsonMini}
        val eventsF = Tables.tsEvents(spark, sfDir)
        val idsF = eventsF.select("stream_id").distinct()
          .collect().map(_.getLong(0)).sorted
        val svcF = new Service(
          spark,
          data = Map("amp-external" -> eventsF),
          streams = Map("amp-external" -> eventsF.select("stream_id").distinct()))
        val labelsF: Map[String, Seq[Long]] =
          idsF.zipWithIndex.groupBy(_._2 % 4)
            .map { case (i, xs) => s"g$i" -> xs.map(_._1).toSeq }
        def tsec(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        def historyIt() = svcF.history(
          "amp-external", labelsF, Seq("value"),
          graft.SparkEntry.Start, graft.SparkEntry.Stop)
        // warmup (codegen + page cache + listing)
        locally { var n = 0L; historyIt().foreach(c => n += c.rows.length); require(n > 0) }
        // compute ceiling: same frame, executed without driver collection
        val histPlan = graft.query.QueryEngine
          .selectData(eventsF, labelsF, Seq("value"),
            graft.SparkEntry.Start, graft.SparkEntry.Stop)
          .withColumn("binstart", org.apache.spark.sql.functions.col("timestamp"))
          .orderBy(graft.query.QueryEngine.LabelCol, "timestamp")
        val tCompute = tsec {
          histPlan.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        }
        // fetch ceiling: the same per-partition job stream toLocalIterator
        // drives, but yielding raw UnsafeRows (copy only, NO external-Row
        // conversion) — splits the driver component into fetch vs convert
        val tFetchInternal = tsec {
          var n = 0L
          val it = histPlan.queryExecution.toRdd.toLocalIterator
          while (it.hasNext) { it.next(); n += 1 }
          require(n > 0)
        }
        var rowsN = 0L; var chunksN = 0L
        spark.conf.set("spark.graft.serve.pump.window", "1")
        val tChunks = tsec {
          historyIt().foreach { c => rowsN += c.rows.length; chunksN += 1 }
        }
        // the windowed pump (k concurrent single-partition jobs, ordered
        // emission) against the serial toLocalIterator drain above
        var rowsW = 0L
        spark.conf.set("spark.graft.serve.pump.window", "4")
        val tChunksW = tsec { historyIt().foreach(c => rowsW += c.rows.length) }
        require(rowsW == rowsN, s"windowed pump row parity broke: $rowsW vs $rowsN")
        spark.conf.set("spark.graft.serve.pump.window", "1")
        def encodeChunk(c: Service.HistoryChunk): Array[Byte] = {
          val body =
            s"""{"label":${JsonMini.str(c.label)},"more":${c.more},""" +
              s""""freq":${c.freq},"rows":${JsonMini.rows(c.rows)}}"""
          Wire.pack(Wire.History, Wire.compress(body.getBytes("UTF-8")))
        }
        var b1 = 0L
        val tEnc1 = tsec { historyIt().foreach(c => b1 += encodeChunk(c).length) }
        var b4 = 0L
        val tEnc4 = tsec {
          val enc = graft.serve.EncodePipeline.mapOrdered(historyIt(), 4)(encodeChunk)
          try enc.foreach(f => b4 += f.length) finally enc.close()
        }
        require(b1 == b4, s"encode byte parity broke: $b1 vs $b4")
        println(f"PROFSCALE pumpfloor compute               $tCompute%8.2f s  (no driver fetch)")
        println(f"PROFSCALE pumpfloor fetch_internal        $tFetchInternal%8.2f s  (UnsafeRow, no convert)")
        println(f"PROFSCALE pumpfloor chunks                $tChunks%8.2f s  ($rowsN rows, $chunksN chunks)")
        println(f"PROFSCALE pumpfloor chunks_window4        $tChunksW%8.2f s  (${tChunks / tChunksW}%.2fx)")
        println(f"PROFSCALE pumpfloor chunks+enc1           $tEnc1%8.2f s  (${b1 / 1e6}%.1f MB)")
        println(f"PROFSCALE pumpfloor chunks+enc4           $tEnc4%8.2f s")
        println(f"PROFSCALE pumpfloor driver_fetch_component ${tChunks - tCompute}%7.2f s  (chunks - compute)")

      case "capskew" =>
        // per-group cap on a Zipf-headed corpus (90% of rows in ONE
        // domain): the direct window funnels every hot-group row through
        // one sort task before discarding all but k; the production
        // threshold form computes each group's k-th-smallest-key cutoff
        // in a map-side-combined k-bounded aggregate and keeps members
        // with a broadcast-joined filter — the corpus never shuffles.
        // Same output (spec-pinned bit-identical) — the delta here is
        // the straggler, and it grows with the hot group.
        import org.apache.spark.sql.functions.{col, concat, explode, lit, sequence, when => fwhen}
        import graft.pipeline.Splits
        // replicate ×10 with distinct ids (same text payload — the cap
        // measures shuffle/sort volume, not content) so the hot group is
        // millions of WIDE rows, the shape whose one-task sort straggles
        val rep = args.lift(2).map(_.toInt).getOrElse(10)
        val base = Tables.documents(spark, sfDir).select("doc_id", "source", "text")
          .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
          .select((col("doc_id") * rep + col("__r")).as("doc_id"), col("source"), col("text"))
        val n = base.count()
        val skewed = base.withColumn("source",
          fwhen(col("doc_id") % 10 =!= 0, lit("hot.example.com"))
            .otherwise(concat(lit("site"), col("doc_id") % 1000)))
          .repartition(32)
          .localCheckpoint() // freeze the input so both arms read identically
        println(s"PROFSCALE corpus rows=$n hot-group=${(n * 9) / 10} k=100")
        val tPre = timed("cap threshold-join (production)")(sink(
          Splits.capPerGroup(skewed, "doc_id", "source", 100, salt = "sk")))
        // the reference arm CAN die here: the hot group funnels through
        // one window-sort task, and past ~10M wide rows that task OOMs —
        // which is the finding, not a harness bug; report it and survive
        try {
          val tRef = timed("cap direct window (reference)")(sink(
            Splits.capPerGroupReference(skewed, "doc_id", "source", 100, salt = "sk")))
          println(f"PROFSCALE capskew speedup ${tRef / tPre}%.2fx (hot-group funnel removed)")
        } catch {
          case e: Throwable =>
            println(s"PROFSCALE cap direct window (reference)   FAILED: " +
              s"${e.getClass.getSimpleName} (hot-group one-task sort; " +
              f"production threshold form finished in $tPre%.2f s)")
        }
        // per-group EXACT quantile cut on the same skewed corpus: the
        // prefix-scan machinery range-partitions on (group, metric, id) —
        // the hot group simply SPANS several ranges instead of funneling
        // one task, so the cut should scale with the corpus, not the
        // hot group. Keep-count sanity: ~10% of every group survives.
        val tQg = timed("per-group exact quantile cut (same skew)") {
          val out = Splits.cutByQuantileExactPerGroup(
            skewed.withColumn("m", org.apache.spark.sql.functions.length(col("text"))),
            "doc_id", "source", "m", q = 0.9)
          val kept = out.count()
          require(kept >= n / 20 && kept <= n / 5, s"kept $kept of $n (expected ~10%)")
        }
        println(f"PROFSCALE pergroup quantile on 90%%-hot corpus: ok ($tQg%.2f s)")

      case "wirearrow" =>
        // backfill encoding A/B on one socket: JSON+zlib (the reference's
        // body shape) vs opt-in Arrow IPC frames — same protocol, same
        // chunking, different bodies. The JSON path's floor is per-cell
        // text assembly (~305k rows/s measured at sf10 after the JsonMini
        // fix); Arrow writes columnar buffers.
        import java.io.{DataInputStream, DataOutputStream}
        import java.net.Socket
        import graft.serve.{ArrowFrames, Service, Wire, WireServer}
        val events = Tables.tsEvents(spark, sfDir)
        val ids = events.select("stream_id").distinct()
          .collect().map(_.getLong(0)).sorted
        val svc = new Service(
          spark,
          data = Map("amp-external" -> events),
          streams = Map("amp-external" -> events.select("stream_id").distinct()))
        def labelsJson(nLabels: Int): String =
          ids.zipWithIndex.groupBy(_._2 % nLabels).toSeq.sortBy(_._1)
            .map { case (i, xs) => s""""g$i":[${xs.map(_._1).mkString(",")}]""" }
            .mkString("{", ",", "}")
        def readFrame(in: DataInputStream): Wire.Message = {
          val header = new Array[Byte](Wire.HeaderLen)
          in.readFully(header)
          val len = java.nio.ByteBuffer.wrap(header, 3, 4).getInt
          val body = new Array[Byte](len)
          in.readFully(body)
          Wire.Message(
            header(0) & 0xff, ((header(1) & 0xff) << 8) | (header(2) & 0xff), body)
        }
        def backfill(encoding: String): (Double, Long, Long, Long) = {
          val server = new WireServer(svc)
          val enc =
            if (encoding == "json") ""
            else s""","encoding":"$encoding""""
          val req =
            s"""{"request":"subscribe","collection":"amp-external",
               |"labels":${labelsJson(4)},"columns":["value"]$enc,
               |"start":${graft.SparkEntry.Start},"stop":${graft.SparkEntry.Stop}}""".stripMargin
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val sock = new Socket("127.0.0.1", server.boundPort)
          var frames = 0L
          var bytes = 0L
          var rows = 0L
          try {
            sock.setSoTimeout(600000)
            val out = new DataOutputStream(sock.getOutputStream)
            val in = new DataInputStream(sock.getInputStream)
            out.write(Wire.pack(0, req.getBytes("UTF-8"))); out.flush()
            var m = readFrame(in)
            if (m.msgType == Wire.VersionCheck) m = readFrame(in) // greeting
            while (m.msgType == Wire.History) {
              frames += 1; bytes += m.body.length
              // count rows the way a real client would: decode the body
              rows +=
                (if (ArrowFrames.isArrow(m.body)) ArrowFrames.decode(m.body).rows.length
                 else """"stream_id"""".r
                   .findAllIn(new String(Wire.decompress(m.body), "UTF-8")).size)
              m = readFrame(in)
            }
            require(m.msgType == Wire.Subscribe, s"expected ack, got ${m.msgType}")
          } finally { sock.close(); server.close() }
          ((System.nanoTime() - t0) / 1e9, frames, bytes, rows)
        }
        backfill("json") // warm the scan + codegen once
        val (tJ, fJ, bJ, rJ) = backfill("json")
        val (tA, fA, bA, rA) = backfill("arrow")
        val (tZ, fZ, bZ, rZ) = backfill("arrow+zstd")
        // no lz4 variant: commons-compress LZ4_FRAME (the only encoder
        // available) measured 674 s for this same sf1 backfill — ~270x
        // slower than zstd-jni — so the server does not offer it
        println(f"PROFSCALE wire_backfill_json              $tJ%8.2f s  ($fJ frames, ${bJ / 1e6}%.1f MB, $rJ rows, ${rJ / tJ / 1000}%.0fk rows/s)")
        println(f"PROFSCALE wire_backfill_arrow             $tA%8.2f s  ($fA frames, ${bA / 1e6}%.1f MB, $rA rows, ${rA / tA / 1000}%.0fk rows/s)")
        println(f"PROFSCALE wire_backfill_arrow_zstd        $tZ%8.2f s  ($fZ frames, ${bZ / 1e6}%.1f MB, $rZ rows, ${rZ / tZ / 1000}%.0fk rows/s)")
        require(rJ == rA && rJ == rZ,
          s"row-count parity broke: json $rJ / arrow $rA / zstd $rZ")
        println(f"PROFSCALE wirearrow speedup ${tJ / tA}%.2fx plain, " +
          f"${tJ / tZ}%.2fx zstd (bytes ${bZ.toDouble / bJ}%.2fx of zlib json)")

      case "livearrow" =>
        // judge-carried candidate: should LIVE frames (Wire.Live, one
        // frame per foreachBatch commit per label) move from JSON to
        // Arrow IPC like the backfill's opt-in? The live path is
        // LATENCY-bound at small batch sizes — measure per-frame encode
        // cost for both bodies across realistic live batch sizes and
        // let the crossover decide. (Backfill chunks are 10k rows;
        // live commits are typically 1-100 rows per label.)
        import org.apache.spark.sql.functions.col
        val evRows = Tables.tsEvents(spark, sfDir)
          .select(col("stream_id"), col("timestamp"), col("value"))
          .limit(1000).collect()
        val schema = evRows.head.schema
        def jsonBody(rs: Array[org.apache.spark.sql.Row]): Array[Byte] = {
          val body = s"""{"collection":"amp-external","label":"g0",""" +
            s""""rows":${graft.serve.JsonMini.rows(rs.toSeq)}}"""
          graft.serve.Wire.pack(graft.serve.Wire.Live, body.getBytes("UTF-8"))
        }
        def arrowBody(rs: Array[org.apache.spark.sql.Row]): Array[Byte] =
          graft.serve.Wire.pack(graft.serve.Wire.Live,
            graft.serve.ArrowFrames.encode("g0", more = false, freq = 0L,
              schema, rs.toSeq, codec = None))
        for (bs <- Seq(1, 10, 100, 1000)) {
          val batch = evRows.take(bs)
          val iters = math.max(200, 20000 / bs)
          def time(f: Array[org.apache.spark.sql.Row] => Array[Byte]): (Double, Int) = {
            var bytes = 0
            var i = 0
            while (i < iters) { bytes = f(batch).length; i += 1 } // warm
            val t0 = System.nanoTime()
            i = 0
            while (i < iters) { bytes = f(batch).length; i += 1 }
            ((System.nanoTime() - t0) / 1e3 / iters, bytes)
          }
          val (tj, bj) = time(jsonBody)
          val (ta, ba) = time(arrowBody)
          println(f"PROFSCALE livearrow batch=$bs%-5d json $tj%8.1f us/frame ($bj B)  " +
            f"arrow $ta%8.1f us/frame ($ba B)  json/arrow ${tj / ta}%.2fx")
        }

      case "detect" =>
        // series detectors: shuffle-by-series + per-partition window sort
        val ev = Tables.tsEvents(spark, sfDir)
          .select("stream_id", "timestamp", "event_id", "value")
        timed("rolling_zscore")(sink(
          graft.query.TimeSeriesOps.rollingZScore(
            ev, "stream_id", "timestamp", "event_id", "value", 20, 10, 2.5)))
        timed("cusum")(sink(
          graft.query.TimeSeriesOps.cusum(
            ev, "stream_id", "timestamp", "event_id", "value", 60.0, 500.0)))
        timed("plateaus")(sink(
          graft.query.TimeSeriesOps.plateaus(
            ev, "stream_id", "timestamp", "event_id", "value", 100.0, 2)))
        timed("rank_normalize")(sink(
          graft.pipeline.Splits.rankNormalize(
            Tables.documents(spark, sfDir).select("doc_id", "n_chars"),
            "doc_id", "n_chars")))
        timed("top_terms_by_source")(sink(
          TextAnalysis.topTermsByGroup(
            Tables.documents(spark, sfDir), "source", "text", 5)))

      case "pq" =>
        // PQ ADC vs brute force: same 10-query top-5, one arm scanning
        // raw 256-byte vectors, the other scanning 16-byte codes through
        // literal LUTs (encode isolated separately — at 100 TB it runs
        // once and persists, like the IVF index build).
        val emb = graft.core.Tables.embeddings(spark, sfDir)
        val n = emb.count()
        println(s"PROFSCALE corpus vectors=$n")
        val model = graft.pipeline.Pq.pqTrain(emb, "vec_id", "embedding")
        val qids = (0L until 10L)
        val tBrute = timed("ann brute force (raw vectors)")(sink(
          graft.pipeline.Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 5)))
        val tEncode = timed("pq encode (one-time, persists)")(sink(
          graft.pipeline.Pq.pqEncode(emb, "vec_id", "embedding", model)))
        val enc = graft.pipeline.Pq.pqEncode(emb, "vec_id", "embedding", model)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        enc.count() // materialize: the standing-index shape
        val qs = graft.pipeline.Pq.adcQueries(emb, "vec_id", "embedding", model, qids)
        val tAdc = timed("pq adc scan (codes only)")(sink(
          graft.pipeline.Pq.pqTopKAdc(enc, "vec_id", model, qs, 5)))
        enc.unpersist()
        println(f"PROFSCALE adc/brute ratio ${tAdc / tBrute}%.2f  " +
          f"(encode ${tEncode}%.2f s; code bytes/vec = ${model.m} vs ${64 * 4} raw)")

      case "importance" =>
        // DSIR importance: relational (explode + broadcast model join +
        // per-doc agg) vs fused (one reference-object expression). Same
        // scores (ImportanceSpec pins bit-parity); the A/B is the cost of
        // the explode/join/agg the fused form deletes.
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(spark, sfDir)
        val n = docs.count()
        println(s"PROFSCALE corpus docs=$n")
        val tRel = timed("importance relational")(sink(
          graft.pipeline.Importance.importanceWeight(
            docs, "doc_id", "text", col("source") === "src0")))
        val model = graft.pipeline.Importance.trainModel(
          docs, "doc_id", "text", col("source") === "src0")
        val tFused = timed("importance fused score")(sink(
          graft.pipeline.Importance.scoreWith(docs, "doc_id", "text", model)))
        println(f"PROFSCALE fused/relational ratio ${tFused / tRel}%.2f")

      case other => sys.error(s"unknown section: $other")
    }
    spark.stop()
  }
}
