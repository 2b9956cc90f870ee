package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale a test tier up by an integer factor — the sf1 (and beyond) proof
  * harness: `runMain graft.tools.GenScale <srcDir> <dstDir> <factor>`.
  *
  * Replica 0 is the source verbatim; replica k > 0 shifts every key by
  * k × (max key + 1) and DECORRELATES content so the scaled corpus keeps
  * the source's per-document distributions without manufacturing a
  * near-duplicate of every row (which would turn dedup workloads
  * quadratic and measure a different query than the one at sf0.1):
  *
  *   - documents: words are deterministically permuted per replica
  *     (sorted by xxhash64(word, position, k)) and a 1-in-8 of tokens is
  *     replica-salted — token counts, language signals, stopword/punct
  *     ratios, and length stats survive, but word-n-gram shingles do
  *     not, so replicas are NOT near-dups under shingle measures
  *     (ngram/minhash). Order-INVARIANT measures are only partially
  *     decorrelated: simhash fingerprints the token multiset, and
  *     replicas keep similar multisets BY DESIGN (that is the
  *     distribution being preserved), so sparse families remain and the
  *     simhash pair emitters' volume budgets are expected to fire at
  *     large factors — which is those guards doing their documented job
  *     on a dup-heavy corpus ("run exact dedup first");
  *   - embeddings: ±0.005 deterministic per-dimension noise — cosine
  *     geometry (cluster structure, neighbor lists) is essentially
  *     preserved, exact-duplicate vectors are not introduced;
  *   - events: stream ids shift with the replica (10× streams over the
  *     same time window — how a telemetry corpus actually grows).
  *
  * Everything is a pure function of (source row, k): regenerating is
  * idempotent and engines agree, so gate oracles stay valid at any
  * factor.
  */
object GenScale {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).collect()(0).getLong(0) + 1

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val m = maxOf(docs, "doc_id")
    val replicas = (0 until factor).map { k =>
      if (k == 0) docs
      else {
        val toks = split(col("text"), " ")
        // permutation alone decorrelates ORDER-sensitive signatures
        // (shingles) but not order-INVARIANT ones: SimHash fingerprints
        // the token MULTISET, so a pure shuffle gave every replica an
        // identical simhash — sf10 grew 100-member "dup" families and the
        // component sweep measured that fixture artifact, not scale.
        // Salting a deterministic 1-in-8 of tokens per replica changes
        // the multiset too while keeping token counts and length stats.
        val keyed = zip_with(
          toks,
          sequence(lit(0), size(toks) - 1),
          (t, i) => struct(
            xxhash64(t, i, lit(k)).as("h"),
            when(pmod(xxhash64(t, i, lit(k)), lit(8)) === 0,
              concat(t, lit("x"), lit(k))).otherwise(t).as("t")))
        val shuffled = array_join(
          transform(array_sort(keyed), s => s.getField("t")), " ")
        docs.select(
          (col("doc_id") + lit(k.toLong * m)).as("doc_id"),
          shuffled.as("text"),
          col("lang"),
          col("source"),
          length(shuffled).cast("long").as("n_chars"))
      }
    }
    replicas.reduce(_ unionByName _)
  }

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val m = maxOf(emb, "vec_id")
    val replicas = (0 until factor).map { k =>
      if (k == 0) emb
      else {
        val id = (col("vec_id") + lit(k.toLong * m)).as("vec_id")
        val noisy = zip_with(
          col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, i) =>
            (v + (pmod(xxhash64(col("vec_id"), i, lit(k)), lit(1000))
              .cast("double") / 100000.0 - 0.005).cast("float"))
              .cast("float"))
        emb.select(id, noisy.as("embedding"), col("label"))
      }
    }
    replicas.reduce(_ unionByName _)
  }

  def scaleEvents(ev0: DataFrame, factor: Int): DataFrame = {
    // the source ts is TIMESTAMP(NANOS), which the nanosAsLong session
    // conf surfaces as BIGINT nanos — convert back to a real TIMESTAMP
    // (micros) on write, or DuckDB-side oracles calling epoch(ts) break
    // `div` = exact integer division — a double `/` loses precision on
    // 1.7e18-scale nano values (53 mantissa bits), shifting micros by ±1
    val ev = ev0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => ev0
    }
    val mId = maxOf(ev, "event_id")
    val mUser = maxOf(ev, "user_id")
    val replicas = (0 until factor).map { k =>
      if (k == 0) ev
      else ev.select(
        (col("event_id") + lit(k.toLong * mId)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * mUser)).as("user_id"),
        col("event_type"),
        col("value"),
        col("props"))
    }
    replicas.reduce(_ unionByName _)
  }

  /** TPC-H-style tables grow the way the benchmark itself scales: nation
    * and region stay FIXED; every other table replicates with its primary
    * key (and the foreign keys into other scaled tables) shifted by
    * k × (max key + 1). FKs into the fixed dims (nationkey) are untouched,
    * so join selectivity and group-by cardinality scale like real TPC-H
    * and the gate oracles stay valid at any factor.
    */
  def scaleKeyed(df: DataFrame, factor: Int, keyCols: Map[String, Long]): DataFrame = {
    val replicas = (0 until factor).map { k =>
      if (k == 0) df
      else df.select(df.columns.map { c =>
        keyCols.get(c) match {
          case Some(m) => (col(c) + lit(k.toLong * m)).as(c)
          case None    => col(c)
        }
      }.toSeq: _*)
    }
    replicas.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorStr) = args.take(3)
    val factor = factorStr.toInt
    // optional 4th arg: comma-separated table subset ("documents" for a
    // docs-only sf100 chain — the full set at x100 is ~18 GB of parquet)
    val only: Option[Set[String]] =
      args.lift(3).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // MULTI-FILE tables (a `<name>.parquet/` DIRECTORY of part files),
    // unlike the driver's single-file single-row-group tiers: one row
    // group means ONE scan task no matter how many cores, so map-only
    // pipelines (PII, chunking, hygiene) serialize at the source and a
    // scale run measures the file-layout artifact instead of the plan.
    // At 100 TB a table is thousands of files — this is the real shape.
    // Tables.load reads a directory transparently; tools/verify_local.py
    // globs `<dir>/*.parquet` for DuckDB.
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts)
        .write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    new java.io.File(dst).mkdirs()
    if (wanted("documents"))
      write(scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor),
        "documents", 32)
    if (wanted("embeddings"))
      write(scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor),
        "embeddings", 32)
    if (wanted("events"))
      write(scaleEvents(spark.read.parquet(s"$src/events.parquet"), factor),
        "events", 32)

    def tbl(name: String) = spark.read.parquet(s"$src/$name.parquet")
    if (Seq("customer", "supplier", "part", "orders", "lineitem", "region",
        "nation").exists(wanted)) {
      val custM = maxOf(tbl("customer"), "c_custkey")
      val suppM = maxOf(tbl("supplier"), "s_suppkey")
      val partM = maxOf(tbl("part"), "p_partkey")
      val ordM  = maxOf(tbl("orders"), "o_orderkey")
      if (wanted("region")) write(tbl("region"), "region", 1)
      if (wanted("nation")) write(tbl("nation"), "nation", 1)
      if (wanted("customer"))
        write(scaleKeyed(tbl("customer"), factor, Map("c_custkey" -> custM)),
          "customer", 8)
      if (wanted("supplier"))
        write(scaleKeyed(tbl("supplier"), factor, Map("s_suppkey" -> suppM)),
          "supplier", 4)
      if (wanted("part"))
        write(scaleKeyed(tbl("part"), factor, Map("p_partkey" -> partM)),
          "part", 8)
      if (wanted("orders"))
        write(scaleKeyed(tbl("orders"), factor,
          Map("o_orderkey" -> ordM, "o_custkey" -> custM)), "orders", 32)
      if (wanted("lineitem"))
        write(scaleKeyed(tbl("lineitem"), factor,
          Map("l_orderkey" -> ordM, "l_partkey" -> partM, "l_suppkey" -> suppM)),
          "lineitem", 32)
    }
    println(s"GENSCALE ok $src -> $dst x$factor" +
      only.map(t => s" (tables: ${t.toSeq.sorted.mkString(",")})").getOrElse(""))
    spark.stop()
  }
}
