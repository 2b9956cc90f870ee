package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic FAMILY-PRESERVING corpus slice — the sf10 oracle
  * certification path for gates whose DuckDB oracles are quadratic in
  * the duplicate-family structure (minhash/ngram pair recomputes that
  * OOM or blow past the time cap on the full 500k-doc corpus).
  *
  *   runMain graft.tools.GenSlice <srcDir> <dstDir> <docMod> <embMod> <oneInN>
  *
  * [[GenScale]] replica k shifts every key by k·(max source key + 1),
  * so a scaled corpus's near-dup family is the residue class
  * `key % familyMod` (familyMod = the ORIGINAL tier's row count — per
  * table, hence the separate doc/embedding moduli; for a chained
  * sf0.1→sf1→sf10 corpus the sf0.1 counts — residues mod the
  * smallest tier select whole families at every chain level). Keeping
  * `xxhash64(key % familyMod) % oneInN == 0` keeps 1/oneInN of the
  * FAMILIES with all ~100 members intact — the dup structure the gates
  * exist to find survives, while a quadratic oracle's work shrinks by
  * oneInN². A row-level random slice would instead break every family
  * apart and verify a corpus with nothing to deduplicate.
  *
  * The slice is then a complete corpus directory: the normal
  * Verify + verify_local pipeline runs UNCHANGED against it — both
  * engines see the same sliced parquet, so a pass is full positive
  * oracle evidence at sf10 content (real 100-member families, real
  * replica decorrelation), just on fewer families.
  *
  * Slices documents (doc_id) and embeddings (vec_id) — the only tables
  * the dedup-family gates read.
  */
object GenSlice {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, docModStr, embModStr, oneInNStr) = args.take(5)
    val docMod = docModStr.toLong
    val embMod = embModStr.toLong
    val oneInN = oneInNStr.toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-genslice")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def keep(key: org.apache.spark.sql.Column, familyMod: Long) =
      pmod(xxhash64(pmod(key, lit(familyMod))), lit(oneInN)) === 0
    new java.io.File(dst).mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .where(keep(col("doc_id"), docMod))
    docs.repartition(8).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val nd = spark.read.parquet(s"$dst/documents.parquet").count()
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .where(keep(col("vec_id"), embMod))
    emb.repartition(8).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    val ne = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"GENSLICE ok $src -> $dst (families mod docs=$docMod emb=$embMod, " +
      s"1 in $oneInN): $nd docs, $ne embeddings")
    spark.stop()
  }
}
