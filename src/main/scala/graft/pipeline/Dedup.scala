package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash. All are expressed as DataFrame
  * pipelines over shuffles Spark already optimizes (map-side combine,
  * AQE-sized partitions) — no driver-side loops, no per-group collects
  * except bounded signature arrays.
  *
  * Scale notes (100 TB): every candidate-generation step is blocking-based
  * (hash buckets / shared shingles / LSH bands), never an all-pairs cross
  * join; the verify step only touches candidate pairs.
  */
object Dedup {

  /** Exact dedup: group rows by content digest, keep the smallest id as the
    * canonical document. Hashing first means the shuffle moves 16-byte
    * digests, not full document bodies.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Exploded (id, shingle, n_shingles) relation — the inverted index that
    * drives both Jaccard verification and candidate blocking.
    */
  private def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(
        col(idCol).as("__id"),
        wordShingles(col(textCol), n).as("__sh"))
      .withColumn("__n", size(col("__sh")))
      .select(col("__id"), col("__n"), explode(col("__sh")).as("__s"))

  /** n-gram Jaccard near-duplicate pairs: candidates = pairs sharing >= 1
    * shingle (inverted-index self-join — blocking, not cross join);
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|) from exact integer counts.
    * Output: (id_a < id_b, jaccard) for jaccard >= threshold.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, n)
    val a = idx.select(col("__id").as("id_a"), col("__n").as("n_a"), col("__s"))
    val b = idx.select(col("__id").as("id_b"), col("__n").as("n_b"), col("__s"))
    a.join(b, Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"), first("n_a").as("n_a"), first("n_b").as("n_b"))
      .withColumn(
        "jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64(seed, shingle) over the document's shingle set.
    * Computed relationally: explode shingles × hash index, min per
    * (doc, index), collect ordered signature. Shuffles carry (id, idx, min)
    * triples — bounded by docs × numHashes regardless of document size.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int): DataFrame =
    shingleIndex(df, idCol, textCol, n)
      .select(
        col("__id"),
        posexplode(transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, col("__s"))))
          .as(Seq("__hi", "__hv")))
      .groupBy("__id", "__hi")
      .agg(min("__hv").as("__mh"))
      .groupBy("__id")
      .agg(
        transform(
          array_sort(collect_list(struct(col("__hi"), col("__mh")))),
          p => p.getField("__mh")).as("signature"))
      .withColumnRenamed("__id", idCol)

  /** MinHash + LSH near-dup candidate pairs. Signatures are cut into
    * `bands` bands; docs colliding on any band hash become candidates;
    * estimated similarity = fraction of matching minhashes. Returns
    * (id_a < id_b, est_jaccard >= threshold).
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, n, numHashes)
    val banded = sigs.select(
      col(idCol).as("__id"),
      col("signature"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, concat_ws(",", slice(col("signature"), b * rows + 1, lit(rows))))))
        .as(Seq("__band", "__bh")))
    val l = banded.select(col("__band"), col("__bh"), col("__id").as("id_a"), col("signature").as("__sa"))
    val r = banded.select(col("__band"), col("__bh"), col("__id").as("id_b"), col("signature").as("__sb"))
    l.join(r, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
      .distinct()
      .withColumn(
        "est_jaccard",
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y), b => b))
          .cast("double") / size(col("__sa")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** 60-bit SimHash fingerprint from md5-derived token hashes (md5 keeps the
    * hash reproducible in any engine). Bit j of the fingerprint is the sign
    * of Σ_tokens (bit_j(h(token)) ? +1 : -1).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("__id"), explode(toks).as("__t"))
      .withColumn("__h", conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long"))
      .select(
        col("__id"),
        posexplode(
          transform(
            sequence(lit(0), lit(59)),
            b => when(call_function("shiftright", col("__h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)))
          .as(Seq("__bit", "__sgn")))
      .groupBy("__id", "__bit")
      .agg(sum("__sgn").as("__s"))
      .groupBy("__id")
      .agg(
        sum(when(col("__s") > 0, call_function("shiftleft", lit(1L), col("__bit"))).otherwise(0L))
          .as("simhash"))
      .withColumnRenamed("__id", idCol)
  }

  /** SimHash near-dup pairs: block on 15-bit quarters of the fingerprint
    * (a pair within hamming distance <= 3 of 60 bits must agree on at least
    * one quarter — pigeonhole), then verify with an exact popcount.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val blocked = fp.select(
      col(idCol).as("__id"),
      col("simhash"),
      posexplode(
        transform(
          sequence(lit(0), lit(3)),
          q => call_function("shiftright", col("simhash"), q * 15).bitwiseAND(0x7fff)))
        .as(Seq("__q", "__qk")))
    val l = blocked.select(col("__q"), col("__qk"), col("__id").as("id_a"), col("simhash").as("__fa"))
    val r = blocked.select(col("__q"), col("__qk"), col("__id").as("id_b"), col("simhash").as("__fb"))
    l.join(r, Seq("__q", "__qk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__fa"), col("__fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("__fa").bitwiseXOR(col("__fb"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
