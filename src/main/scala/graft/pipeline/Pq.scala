package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") over an embedding column — the memory-scale
  * path for similarity search: the vector splits into `m` disjoint
  * coordinate blocks, each block quantizes to its own tiny `ks`-entry
  * codebook, and the corpus is re-expressed as `m` small integer codes per
  * vector. At d=64 float dims and m=16/ks=16 that is 16 bytes of code
  * against 256 bytes of raw floats — a 16× smaller resident index, which is what
  * makes a 100 TB corpus's similarity structure fit a cluster's memory at
  * all. Queries score codes through per-query lookup tables (ADC —
  * asymmetric distance computation): the scan touches only the code
  * column plus `m·ks`-entry literal tables, never the raw vectors.
  *
  * Everything is deterministic end-to-end (the ivfCentroids conventions):
  * codebook init is the first `ks` vectors in id order sliced per block,
  * Lloyd refinement uses distributed per-(block, code) means, assignment
  * ties break toward the higher code (the NearestCells tie-break), so a
  * trained model can be inlined into an external oracle and replayed
  * bit-for-bit.
  *
  * Reference scope note: the reference engine (wandnz/nntsc) has no
  * vector search at all; this operator is part of the beyond-reference
  * training-data-pipeline surface, alongside IVF/LSH ANN in
  * [[Similarity]].
  */
object Pq {

  /** A trained product quantizer: `codebooks(s)(c)` is the sub-centroid
    * for code `c` of block `s`, each of length `subDim`. Total model size
    * is m·ks·subDim doubles = ks·d — independent of corpus size, always
    * a broadcast-sized reference object.
    */
  final case class PqModel(subDim: Int, codebooks: Seq[Seq[Seq[Double]]]) {
    def m: Int = codebooks.length
    def ks: Int = codebooks.head.length
    def dims: Int = m * subDim
    /** |w|² per (block, code), summed in index order — the code-dependent
      * half of the reconstruction norm: blocks are disjoint coordinate
      * ranges, so ‖recon‖² = Σ_s ‖w_{s,code_s}‖² exactly.
      */
    def lutNorm: Seq[Seq[Double]] =
      codebooks.map(_.map { w =>
        var acc = 0.0
        var d = 0
        while (d < w.length) { acc += w(d) * w(d); d += 1 }
        acc
      })
  }

  /** One ADC query: the raw vector stays on the driver as `m` per-block
    * dot-product lookup tables (`lutDot(s)(c) = Σ_d q_d · w_d`, index
    * order) plus its own norm — the scan side never sees the vector.
    */
  final case class AdcQuery(id: Long, qnorm: Double, lutDot: Seq[Seq[Double]])

  private def sliceBlock(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  /** Train `m` codebooks of `ks` entries each with `lloydIters` rounds of
    * distributed Lloyd refinement. One job per iteration covers ALL
    * blocks: each row explodes into its `m` (block, code, subvector)
    * assignments map-side (the per-block argmin is a codegen'd
    * [[graft.functions.NearestCells]] over the block slice), and a single
    * groupBy((block, code)) computes every sub-centroid mean — driver
    * traffic is the m·ks·subDim means matrix only, and the exploded
    * shuffle volume equals the original vector volume (the blocks
    * partition the coordinates). Requires dims % m == 0.
    */
  def pqTrain(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 16,
      ks: Int = 16,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0): PqModel = {
    val first = emb
      .orderBy(idCol)
      .limit(ks)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      .toSeq
    require(first.nonEmpty, "pqTrain: empty corpus")
    val dims = first.head.length
    require(dims % m == 0, s"pqTrain: dims=$dims not divisible by m=$m")
    val subDim = dims / m
    var codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map(s =>
      first.map(v => v.slice(s * subDim, (s + 1) * subDim)))

    val train =
      if (trainFraction >= 1.0) emb
      else emb.filter(
        pmod(xxhash64(col(idCol)), lit(1000)) < lit((trainFraction * 1000).toInt))

    for (_ <- 0 until lloydIters) {
      val arms = (0 until m).map { s =>
        val sv = sliceBlock(col(vecCol), s, subDim)
        struct(
          lit(s).as("s"),
          graft.functions.NearestCells
            .nearestCells(sv, codebooks(s), 1)
            .getItem(0)
            .as("code"),
          sv.as("sv"))
      }
      val meanCols = (0 until subDim).map(d =>
        avg(element_at(col("__a.sv"), d + 1).cast("double")).as(s"__d$d"))
      val means = train
        .select(explode(array(arms: _*)).as("__a"))
        .groupBy(col("__a.s").as("__s"), col("__a.code").as("__c"))
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (0 until subDim).map(d => r.getDouble(d + 2)))
        .toMap
      codebooks = codebooks.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (w, c) => means.getOrElse((s, c), w).toSeq }
      }
    }
    PqModel(subDim, codebooks)
  }

  /** The code array for one vector: per block, the nearest sub-centroid
    * index (argmax 2·v·w − |w|², ties toward the higher code — the
    * NearestCells convention). Map-only, codegen'd, no shuffle.
    */
  def encodeCol(vec: Column, model: PqModel): Column =
    array((0 until model.m).map(s =>
      graft.functions.NearestCells
        .nearestCells(sliceBlock(vec, s, model.subDim), model.codebooks(s), 1)
        .getItem(0)): _*)

  /** (id, codes) for the whole corpus — the persisted form of a PQ index:
    * m small ints per vector instead of d floats.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame =
    emb.select(col(idCol), encodeCol(col(vecCol), model).as("codes"))

  /** Reconstruct (decode) a code array back to its quantized vector: the
    * concatenation of the selected sub-centroids. Built entirely from
    * codegen'd collection functions over the literal codebook tensor.
    */
  def reconstructCol(codes: Column, model: PqModel): Column = {
    val cb = typedLit(model.codebooks.map(_.map(_.toArray).toArray).toArray)
    flatten(transform(codes, (c, s) => element_at(element_at(cb, s + 1), c + 1)))
  }

  /** Collect the query vectors (bounded by `queryIds` — the k×d-style
    * driver collect every ANN entry point shares) and fold each into its
    * ADC lookup tables.
    */
  def adcQueries(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel,
      queryIds: Seq[Long]): Seq[AdcQuery] = {
    emb
      .filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(idCol)
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val q = r.getSeq[Float](1).map(_.toDouble)
        var nrm = 0.0
        var d = 0
        while (d < q.length) { nrm += q(d) * q(d); d += 1 }
        val lut = model.codebooks.zipWithIndex.map { case (cb, s) =>
          cb.map { w =>
            var acc = 0.0
            var i = 0
            while (i < w.length) { acc += q(s * model.subDim + i) * w(i); i += 1 }
            acc
          }
        }
        AdcQuery(id, math.sqrt(nrm), lut)
      }
      .toSeq
  }

  /** ADC top-k with precomputed query tables — the join-free ANN scan:
    * the corpus pass reads ONLY the code column; per query, the
    * approximate cosine is
    *
    *   sim = (Σ_s D_q[s][code_s]) / (‖q‖ · sqrt(Σ_s N[s][code_s]))
    *
    * with both Σ_s as explicit left-associated sums over literal
    * `element_at` lookups (m terms each), so the whole scoring stage is
    * one codegen'd projection with NO join and NO broadcast — queries
    * travel as plan literals. The per-query top-k then rides the
    * k-bounded [[graft.functions.TopKPairsAggregate]] (map-side combine
    * to ≤ k candidates per partition), so the one exchange carries
    * O(queries × k × partitions) rows at any corpus size.
    */
  def pqTopKAdc(
      enc: DataFrame,
      idCol: String,
      model: PqModel,
      qs: Seq[AdcQuery],
      k: Int): DataFrame = {
    require(qs.nonEmpty, "pqTopKAdc: no query vectors resolved")
    // one fused kernel call per row (flat reference-object tables): the
    // composed element_at-chain form evaluates boxed and project-collapse
    // clones it per query — measured 2.6× slower than brute force at
    // sf0.1, where the kernel scans ~nq·m flat doubles per row
    val scores = graft.functions.AdcScores.adcScores(
      col("codes"),
      qs.map(_.id),
      qs.map(_.qnorm),
      qs.flatMap(_.lutDot.flatten),
      model.lutNorm.flatten,
      model.m,
      model.ks)
    val scored = enc
      .select(col(idCol).as("neighbor_id"), explode(scores).as("__q"))
      .select(col("neighbor_id"), col("__q.query_id"), col("__q.sim"))
      .filter(col("neighbor_id") =!= col("query_id"))
    Similarity.rankTopK(scored, k)
  }

  /** End-to-end PQ ANN: encode the corpus with `model`, fold the query
    * vectors into ADC tables, scan. Output (query_id, neighbor_id, rank,
    * sim) — the [[Similarity.bruteForceTopK]] shape, ranked on
    * (sim desc, neighbor_id).
    */
  def pqTopKWith(
      emb: DataFrame,
      model: PqModel,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    val qs = adcQueries(emb, idCol, vecCol, model, queryIds)
    pqTopKAdc(pqEncode(emb, idCol, vecCol, model), idCol, model, qs, k)
  }
}
