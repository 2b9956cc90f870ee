package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-side gate of a training-data
  * pipeline: a document stream is admitted only the first time its content
  * is seen, BEFORE it costs downstream storage/compute. Batch dedup
  * (`Dedup.exact`) cleans a corpus after the fact; this keeps one from
  * accumulating.
  *
  * Spark-native shape: the fused `TextFingerprint` normalizes and hashes
  * each document in one pass (formatting noise collapses to the same
  * fingerprint), then Structured Streaming's stateful `dropDuplicates`
  * keeps one state-store entry per fingerprint. State grows with distinct
  * content; at 100 TB use the watermarked variant — duplicates of a
  * document arriving within the horizon are dropped, state older than the
  * horizon is evicted (the standard unbounded-state escape hatch; the
  * RocksDB state backend carries it on a real cluster).
  */
object StreamingDedup {

  val FingerprintCol = "fingerprint"

  /** Admit only the first document per normalized-content fingerprint,
    * forever (state never evicted — bounded-corpus / backfill use).
    */
  def exactDedupStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn(FingerprintCol, graft.functions.TextFingerprint(col(textCol)))
      .dropDuplicates(FingerprintCol)

  /** Watermarked variant: `eventTimeCol` (timestamp type) carries the
    * document's event time; duplicates arriving within `horizon` of each
    * other are dropped, and fingerprint state older than the watermark is
    * evicted — state stays bounded by the horizon's distinct-content rate.
    */
  def exactDedupStreamWithin(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      horizon: String): DataFrame =
    docs
      .withColumn(FingerprintCol, graft.functions.TextFingerprint(col(textCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(FingerprintCol)

  /** Ingest-side benchmark decontamination — the streaming twin of
    * [[Dedup.decontaminate]]: an arriving document sharing ANY word
    * n-gram with the benchmark corpus is dropped BEFORE it reaches
    * training storage.
    *
    * Stateless by construction: an "is any of my shingles in the bench
    * set" decision is per-document, so it must not be a join at all in a
    * stream (the per-doc complement of an exploded semi-join needs a
    * stream-side aggregation or stream-stream anti-join — state either
    * way). Instead the distinct bench shingle hashes are collected ONCE
    * (eval suites are tiny against a crawl — same reference-object
    * rationale as the IVF centroids) into a sorted array riding a single
    * boolean expression ([[graft.functions.BenchShingleHit]], binary
    * search per shingle). The stream side is a pure map filter: no state
    * store, no watermark, no join; batch/stream agreement is asserted in
    * the spec against [[Dedup.decontaminated]].
    */
  def decontaminateStream(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    // one direct pass over the bench — NOT Dedup.shingleSets, whose
    // pin (persist + eager count) would stay resident for the life of
    // the streaming service after this single collect
    val hashes = bench
      .select(explode(graft.functions.WordNgramHashes(col(textCol), n)).as("__s"))
      .distinct()
      .collect().map(_.getLong(0)).sorted
    // null text hits nothing and is KEPT (coalesce) — the batch twin
    // keeps null-text docs too (no shingles -> absent from the
    // contaminated index -> survives the anti-join), and a bare
    // filter(!NULL) would silently drop such rows at ingest
    docs.filter(
      !coalesce(graft.functions.BenchShingleHit(col(textCol), n, hashes), lit(false)))
  }

  /** Streaming near-dup flagger: each arriving document's MinHash
    * signature band-joins the STANDING corpus's persisted signature
    * index ([[Dedup.minhashSignatures]] / [[Dedup.minhashSignaturesMd5]],
    * a static table) — Structured Streaming's stream-static inner join
    * is STATELESS: no state store, no watermark, nothing grows with the
    * stream. Emits one row per (arriving doc, matching index doc,
    * colliding band) whose estimated Jaccard clears the threshold; a
    * pair matching on several bands emits several rows (collapsing them
    * would need a stateful aggregate — consumers treat any row as "this
    * doc near-dups the corpus", an idempotent flag, or dropDuplicates
    * per micro-batch in foreachBatch). Stream×stream near-dups are out
    * of scope by design (that is a stateful problem — run
    * [[exactDedupStream]] upstream for exact repeats and periodic batch
    * LSH for the rest); the spec pins distinct (id, match) pairs equal
    * to [[Dedup.minhashLshPairsAgainst]]'s stream×index slice.
    *
    * Signature family must MATCH the index's: `md5Family = false` (the
    * xxhash64 production family) or true (the oracle-parity family).
    * All per-row work is fused map-only expressions; the only exchange
    * is the band equi-join against the static index.
    */
  def nearDupPairsStream(
      docs: DataFrame,
      indexSigs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      md5Family: Boolean = false,
      // doc columns carried through to the output untouched — the
      // distinct variant threads its event-time column here (a watermark
      // rides its attribute: projecting the column away would drop it)
      passThrough: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val pt = passThrough.map(col)
    val sig =
      if (md5Family) graft.functions.MinHashSignatureMd5(col(textCol), n, numHashes)
      else graft.functions.MinHashSignature(
        graft.functions.WordNgramHashes(col(textCol), n), numHashes)
    def bandKeys(sigCol: org.apache.spark.sql.Column) =
      transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(sigCol, b * rows + 1, lit(rows))))
    val streamBands = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__sid") +: sig.as("__ssig") +: pt: _*)
      .filter(size(col("__ssig")) > 0)
      .select(
        col("__sid") +: col("__ssig") +:
          posexplode(bandKeys(col("__ssig"))).as(Seq("__band", "__bh")) +: pt: _*)
    // a mismatched index (built with a different numHashes or hash
    // family) would SILENTLY yield near-zero est_jaccard — equalCount
    // walks min(len) positions against the stream's numHashes-length
    // signature, so every pair just misses the threshold: false
    // negatives with no error (ADVICE r11). Signature LENGTH is checked
    // per index row (one codegen'd compare); the hash FAMILY is not
    // detectable from the data — `md5Family` must match the index
    // builder's, which is the documented contract above.
    val indexBands = indexSigs
      .select(col(idCol).as("match_id"),
        when(size(col("signature")) =!= numHashes,
          raise_error(concat(
            lit(s"nearDupPairsStream: index signature length != numHashes=$numHashes: "),
            size(col("signature")).cast("string"),
            lit(" — the persisted index was built with different MinHash parameters"))))
          .otherwise(col("signature")).as("__isig"))
      .select(
        col("match_id"), col("__isig"),
        posexplode(bandKeys(col("__isig"))).as(Seq("__band", "__bh")))
    streamBands.join(indexBands, Seq("__band", "__bh"))
      .filter(col("__sid") =!= col("match_id"))
      .withColumn(
        "est_jaccard",
        graft.functions.VectorOps.equalCount(col("__ssig"), col("__isig"))
          .cast("double") / size(col("__ssig")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("__sid").as(idCol) +: col("match_id") +: col("__band").as("band") +:
        col("est_jaccard") +: pt: _*)
  }

  /** [[nearDupPairsStream]] with the per-band duplication collapsed: one
    * row per distinct (doc, match) pair. The raw form emits one row per
    * COLLIDING BAND — fine for consumers that treat any row as an
    * idempotent "this doc near-dups the corpus" flag, an over-count trap
    * for anything that tallies rows (VERDICT r11). Collapsing needs
    * state, so this variant takes an event-time column + horizon and
    * rides `dropDuplicatesWithinWatermark` keyed on the pair: state
    * holds one entry per distinct pair seen within the horizon and is
    * evicted as the watermark passes — bounded by the horizon's pair
    * rate, never the stream's life. (A pair's rows all carry the SAME
    * event time — they come from one arriving document — so
    * within-watermark dedup is exact for them; the horizon only governs
    * how long a RE-ARRIVING duplicate document's pairs stay suppressed.)
    * The `band` column is dropped (meaningless once collapsed);
    * `eventTimeCol` rides along for downstream windowing.
    */
  def nearDupPairsStreamDistinct(
      docs: DataFrame,
      indexSigs: DataFrame,
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      horizon: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      md5Family: Boolean = false): DataFrame =
    nearDupPairsStream(
        docs.withWatermark(eventTimeCol, horizon),
        indexSigs, idCol, textCol, n, numHashes, bands, threshold, md5Family,
        passThrough = Seq(eventTimeCol))
      .drop("band")
      .dropDuplicatesWithinWatermark(idCol, "match_id")

  /** Bloom variant of [[decontaminateStream]] for benchmark suites too
    * large to ride as a sorted hash ARRAY (the exact set costs 8 bytes
    * per distinct bench shingle inside every executor and the stream's
    * checkpointed plan; the bitmap is a FIXED `mBits/8` bytes — 128 KB at
    * m = 2^20 — however large the suite). Same stateless shape: no
    * state store, no join, one boolean map filter; may drop extra
    * documents at the Bloom false-positive rate, never leaks a true
    * contamination through (the safe direction at ingest). Geometry and
    * hashing are [[Dedup.bloomBitmap]]'s — batch/stream probes agree
    * bit-for-bit (spec-asserted against [[Dedup.decontaminateBloom]]).
    */
  def decontaminateStreamBloom(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      mBits: Int = 1 << 20,
      kHashes: Int = 4): DataFrame = {
    val words = Dedup.bloomBitmap(bench, textCol, n, mBits, kHashes)
    // null text keeps the row, same contract as the exact form
    docs.filter(
      coalesce(
        graft.functions.BloomNgramHitCount(
          col(textCol), n, mBits, kHashes, md5Family = false, words),
        lit(0L)) === 0L)
  }
}
