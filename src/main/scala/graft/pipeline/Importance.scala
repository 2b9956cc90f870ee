package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every document by how much more likely its hashed n-gram features are
  * under a TARGET (in-domain) corpus than under the RAW corpus, so the
  * raw corpus can be resampled toward the target distribution without
  * training a classifier.
  *
  * Features are word unigrams ∪ bigrams (duplicates kept — occurrence
  * counts are the signal), hashed into `buckets` fixed buckets, the
  * paper's dimensionality bound. Both slices fit one bag-of-buckets
  * model with Laplace smoothing over the bucket space:
  *
  *   p_t(f) = (c_t(f) + 1) / (T + B),   p_r(f) = (c_r(f) + 1) / (R + B)
  *
  * (T/R = total feature occurrences in the target/raw slice, B = bucket
  * count). The paper's importance weight is
  * log w(d) = Σ_f count_d(f) · (ln p_t(f) − ln p_r(f)); `logForm = true`
  * computes exactly that, hash-gated too (q_importance_log): the ln is
  * the platform libm ([[graft.functions.PlatformLn]] — Spark's builtin
  * log() is StrictMath, which disagrees with the oracle engine's ln on
  * ~6% of inputs vs Math.log's 0.06%/1 ulp) and the log-ratio is
  * quantized at 1e-9 (a 1-ulp disagreement on a magnitude-~16 ratio
  * cannot cross a 1e-9 boundary in practice; at 1e-12 it could, ~2%
  * per 4096-bucket model). The original GATE form (`logForm = false`)
  * is the linear analog
  * Σ count_d(f) · (q(p_t) − q(p_r)) with q(x) = floor(x·1e12 + 0.5):
  * every probability is one exact long/long IEEE division quantized to
  * an integer, so per-doc sums are independent of partial-aggregation
  * order AND bit-identical to the DuckDB oracle — the
  * [[TextAnalysis.lmFamiliarity]] quantization discipline. Higher score
  * = more target-like either way.
  *
  * Shape at 100 TB — the reason hashing is not just a memory nicety:
  * with `buckets` > 0 the per-feature model is AT MOST B rows, so it
  * rides back onto the corpus as a BROADCAST join — the corpus-sized
  * feature stream never shuffles for the model lookup (the bucket-count
  * aggregate itself folds map-side to ≤ B rows per partition). The only
  * corpus-keyed exchange is the final per-doc sum, whose partial
  * aggregate emits one row per document per partition — and a document's
  * features are co-partitioned by construction (the explode is map-only),
  * so the shuffle carries |docs| rows, not |tokens|. `buckets = 0`
  * switches to exact-gram features (no collisions; the model table is
  * vocabulary-sized and the lookup becomes a shuffle equi-join — the
  * [[TextAnalysis.lmFamiliarity]] shape); use it when auditing what the
  * bucketed scores would be without collision noise.
  *
  * Families: `md5Family = true` is the oracle-parity family (lower-60-bit
  * md5 of the gram, mod B — `('0x' || substr(md5(g),1,15))::BIGINT % B`
  * in DuckDB); the default is codegen'd xxhash64 for production. Both
  * are fixed salts: scores are deterministic and append-stable in the
  * model only through the counts.
  *
  * Downstream selection: the scores compose with the existing samplers —
  * [[Splits.cutByQuantileExact]] on a quantized score keeps the top
  * fraction, [[Splits.sampleExact]] draws an exact-size target-like
  * slice. (DSIR's Gumbel-noise draw is a hash-noise variant of the same
  * keep-rate idea; the deterministic quantile cut is the reproducible
  * form.)
  *
  * Empty-text convention (both scorers): a zero-token document has no
  * features, so it appears in NEITHER output — [[importanceWeight]]
  * never produces a feature row for it, and [[scoreWith]] filters
  * n_feats = 0 to match. Callers wanting a verdict for empty docs left
  * join the scores back and treat null as "no evidence".
  */
object Importance {

  def importanceWeight(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 4096,
      logForm: Boolean = false,
      md5Family: Boolean = false): DataFrame = {
    require(buckets >= 0, s"buckets must be >= 0, got $buckets")
    val q12 = lit(1000000000000.0)

    // bucketed: ONE fused pass tokenizes, builds each gram and hashes its
    // bytes directly ([[graft.functions.ImportanceBuckets]]) — the
    // relational md5-hex → substring → base-16-parse chain it replaces
    // cost ~2.8× the bare gram explode per corpus pass (ProfOpt r19), and
    // this stream is scanned twice (model counts + score join). Bit parity
    // with the relational form is pinned in ImportanceSpec; the unbucketed
    // (exact-gram) audit path keeps the relational shape.
    val feats =
      if (buckets > 0)
        df.select(
          col(idCol),
          isTarget.as("__tgt"),
          explode(graft.functions.ImportanceBuckets(col(textCol), buckets, md5Family))
            .as("__f"))
      else
        df.select(
          col(idCol),
          isTarget.as("__tgt"),
          explode(concat(
            graft.functions.WordNgrams(col(textCol), 1),
            graft.functions.WordNgrams(col(textCol), 2))).as("__g"))
          .select(col(idCol), col("__tgt"), col("__g").as("__f"))

    val counts = feats
      .groupBy("__f")
      .agg(
        sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__ct"),
        sum(when(!col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__cr"))

    // scalar totals; V = the Laplace support (bucket count, or the
    // observed vocabulary when unbucketed)
    val totals = counts.agg(
      sum(col("__ct")).as("__T"),
      sum(col("__cr")).as("__R"),
      count(lit(1)).as("__vObs"))
    val v = if (buckets > 0) lit(buckets.toLong) else col("__vObs")

    val pt = (col("__ct") + 1L).cast("double") / (col("__T") + v).cast("double")
    val pr = (col("__cr") + 1L).cast("double") / (col("__R") + v).cast("double")
    // logForm quantum is 1e-9 (see the class doc: 1-ulp ln safety);
    // linear stays 1e-12 (exact divisions, no ulp risk)
    val quant = if (logForm) lit(1000000000.0) else q12
    val dq =
      if (logForm)
        floor(
          (graft.functions.PlatformLn(pt) - graft.functions.PlatformLn(pr)) *
            quant + lit(0.5)).cast("long")
      else
        floor(pt * q12 + lit(0.5)).cast("long") -
          floor(pr * q12 + lit(0.5)).cast("long")

    val modelFrame = counts
      .crossJoin(broadcast(totals))
      .select(col("__f"), dq.as("__dq"))
    val model = if (buckets > 0) broadcast(modelFrame) else modelFrame

    feats
      .join(model, "__f")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__dq")).as("__sq"))
      .select(
        col(idCol),
        col("n_feats"),
        ((col("__sq").cast("double") / col("n_feats")) / quant).as("imp_score"))
  }

  /** Train the bucketed importance model as a dense per-bucket weight
    * array: `dq(f) = q(p_t(f)) − q(p_r(f))` (or the log-ratio when
    * `logForm`), with UNSEEN buckets holding the smoothed default
    * (c = 0) — so the array scores documents the training corpus never
    * saw, the incremental/streaming case the relational
    * [[importanceWeight]] (whose model has only observed buckets)
    * cannot. Identical arithmetic: Java's double division/floor are the
    * same IEEE ops Spark executes, pinned by ImportanceSpec's
    * fused-vs-relational parity test.
    *
    * The collect is B longs (4096 by default) — centroid-sized, the
    * sanctioned kind of driver collect.
    */
  def trainModel(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 4096,
      logForm: Boolean = false,
      md5Family: Boolean = false): Array[Long] = {
    require(buckets > 0, s"trainModel needs a bounded bucket space, got $buckets")
    val counts = df
      .select(
        isTarget.as("__tgt"),
        explode(graft.functions.ImportanceBuckets(col(textCol), buckets, md5Family))
          .as("__f"))
      .groupBy("__f")
      .agg(
        sum(when(col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__ct"),
        sum(when(!col("__tgt"), lit(1L)).otherwise(lit(0L))).as("__cr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t = counts.map(_._2).sum
    val r = counts.map(_._3).sum
    def q(p: Double): Long = math.floor(p * 1e12 + 0.5).toLong
    def q9(p: Double): Long = math.floor(p * 1e9 + 0.5).toLong
    def dqOf(ct: Long, cr: Long): Long = {
      val pt = (ct + 1).toDouble / (t + buckets).toDouble
      val pr = (cr + 1).toDouble / (r + buckets).toDouble
      // Math.log: the same platform libm the relational PlatformLn and
      // the oracle engine evaluate — see importanceWeight's logForm note
      if (logForm) q9(Math.log(pt) - Math.log(pr)) else q(pt) - q(pr)
    }
    val dq = Array.fill(buckets)(dqOf(0L, 0L))
    counts.foreach { case (f, ct, cr) => dq(f.toInt) = dqOf(ct, cr) }
    dq
  }

  /** Score documents against a standing [[trainModel]] array — ONE
    * map-only fused expression per document
    * ([[graft.functions.ImportanceScore]]): no explode, no join, no
    * aggregate, so it runs statelessly on a STREAM (the relational
    * scorer's per-doc aggregate would be stateful there) and in batch
    * the model lookup is an array index. Same output columns as
    * [[importanceWeight]] — including on EMPTY input: a zero-token
    * document produces no feature rows relationally, so it is omitted
    * here too (filtered, still a stateless map+filter) rather than
    * emitted as (n_feats=0, imp_score=NaN).
    */
  def scoreWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Array[Long],
      md5Family: Boolean = false,
      quant: Double = 1000000000000.0): DataFrame =
    df.select(
        col(idCol),
        graft.functions.ImportanceScore(col(textCol), model, md5Family).as("__s"))
      .filter(col("__s.n_feats") > 0)
      .select(
        col(idCol),
        col("__s.n_feats").as("n_feats"),
        ((col("__s.sumq").cast("double") / col("__s.n_feats")) / lit(quant))
          .as("imp_score"))
}
