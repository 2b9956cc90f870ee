package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *     The query side is broadcast, so the big side never shuffles; cost is
  *     O(|corpus| × |queries|) dot products inside whole-stage codegen.
  *   - `lshTopK`: signed-random-projection LSH — the scale path. Corpus is
  *     bucketed once by sign-bit sketch; a query only scans its own bucket
  *     (plus optional multi-probe neighbors), cutting the scan by ~2^bits.
  *
  * All arithmetic is element-wise double (floats upcast exactly), summed in
  * index order via `aggregate` — deterministic, engine-reproducible.
  */
object Similarity {

  /** Σ a_i*b_i over two float-array columns, computed in double — a native
    * codegen'd expression (graft.functions.DotProduct); the higher-order-
    * function fold runs interpreted and is ~10× slower, with identical
    * result bits (double accumulation in index order).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query id.
    * Output: (query_id, neighbor_id, rank, sim) with sim rounded to 6dp and
    * rank assigned on (rounded sim desc, neighbor_id) so ordering is stable
    * across engines.
    *
    * Ranking runs through the k-bounded
    * [[graft.functions.TopKPairsAggregate]] hash aggregate, NOT a
    * `row_number() OVER (PARTITION BY query_id)` window: the window form
    * funnels every query's complete |corpus|-sized score set through one
    * task's sort (at 10⁹ corpus rows that is a one-task spill per query),
    * while the aggregate map-side-combines each scan partition down to ≤ k
    * candidates per query before the shuffle, so the exchange carries
    * O(queries × k × partitions) rows no matter how large the corpus grows.
    */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    val queries = emb
      .filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("__va"))
    val scored = corpus
      .join(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
    rankTopK(scored, k)
  }

  /** Shared ranking tail for the exact and ANN search paths: per-query
    * (rank, sim) from a scored candidate frame via the k-bounded hash
    * aggregate. Every caller's blocking guarantees a (query, neighbor)
    * pair is scored at most once (a corpus row lives in exactly one
    * bucket/cell), so no dedup is needed before the aggregate.
    */
  private[pipeline] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopKPairsAggregate
        .topK(col("sim"), col("neighbor_id").cast("long"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(
        col("query_id"),
        col("__t.id").as("neighbor_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__t.score").as("sim"))

  /** Embedding near-duplicate pairs: cosine >= threshold, blocked on an
    * exact-match key (e.g. a cluster label) to avoid the all-pairs join.
    */
  def embeddingDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double,
      maxCandidates: Option[Long] = None): DataFrame = {
    // a skewed block key (one label covering most of the corpus) makes
    // the block self-join output-quadratic — same fail-fast contract as
    // the Dedup pair emitters
    Dedup.selfPairGuard(emb.select(col(blockCol)), Seq(blockCol), maxCandidates,
      "embeddingDupPairs",
      s"block key `$blockCol` is too coarse (one block dominates the " +
        "corpus); block on embeddingDupPairsLsh buckets (vector-derived, " +
        "uniform by construction) or a finer label")
    val l = emb.select(col(blockCol).as("__blk"), col(idCol).as("id_a"), col(vecCol).as("__va"))
    val r = emb.select(col(blockCol).as("__blk"), col(idCol).as("id_b"), col(vecCol).as("__vb"))
    l.join(r, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    * arXiv:2303.09540): block on the trained quantizer's nearest cell —
    * k-means pre-clustering — then cosine-verify within each cell. The
    * cluster blocking is exactly what turns the quadratic all-pairs
    * search into per-cell joins at 100 TB (SemDeDup's own economy);
    * assignment is the fused `NearestCells` reference-object expression
    * (map-only), and the trained matrix is deterministic, so the DuckDB
    * oracle can inline it (the q_ann_ivf convention). Cross-cell near
    * dups are missed by construction — the SemDeDup trade.
    */
  def semanticDupPairsWith(
      emb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String,
      vecCol: String,
      threshold: Double,
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None): DataFrame = {
    val cellIdx = CellIndex(centroids, pretrained = grouping)
    val withCell = emb.withColumn(
      "__cell", cellIdx.nearest(col(vecCol), 1).getItem(0))
    embeddingDupPairs(withCell, idCol, vecCol, "__cell", threshold)
  }

  /** K-means cluster assignment: `(idCol, cluster)` for every vector —
    * the clustering surface itself, not just a blocking step. One
    * map-only pass (the codegen'd [[NearestCells]] expression with the
    * centroid matrix as a plan reference object; two-level dispatch past
    * [[TwoLevelCells]]), so assignment scales like a projection.
    * Deterministic: training is seeded + fixed-iteration, ties toward
    * the higher cell index — the q_ann_ivf assignment semantics, which
    * is what lets the gate inline the trained matrix into its oracle.
    */
  def clusterAssignWith(
      emb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String,
      vecCol: String,
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None): DataFrame =
    emb.select(
      col(idCol),
      CellIndex(centroids, pretrained = grouping)
        .nearest(col(vecCol), 1).getItem(0).as("cluster"))

  /** Semantic dedup: one document per semantic near-dup component
    * (canonical min id, via the distributed large-star/small-star
    * closure) — documents in no pair survive untouched.
    */
  def semanticDedupWith(
      emb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String,
      vecCol: String,
      threshold: Double,
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None): DataFrame =
    Dedup.dedupByComponents(
      emb, idCol,
      semanticDupPairsWith(emb, centroids, idCol, vecCol, threshold, grouping))

  /** Embedding near-duplicate pairs at scale: the block key is DERIVED from
    * the vectors themselves — the sign-bit LSH bucket — rather than a
    * pre-existing label column (which a raw 100 TB corpus does not have).
    * Same shape as `embeddingDupPairs`: equi-join on the bucket, verify
    * with exact cosine. With `probes > 0`, each vector on the PROBE side
    * additionally joins into the buckets at Hamming distance 1 on its
    * lowest `probes` planes (near-dups straddling one hyperplane are
    * recovered). Multi-probe is SINGLE-SIDED: only the left side explodes,
    * the right side stays in its home bucket, so candidates grow
    * (probes+1)× — a double-sided explode squares that to (probes+1)²
    * while recovering exactly the same Hamming-≤1 pairs. Deterministic
    * end-to-end: the hyperplanes are md5-derived (engine-reproducible —
    * the DuckDB oracle recomputes the buckets and the same canonical
    * emit-once rule).
    *
    * Emit-once rule: a Hamming-1 pair has exactly one surviving candidate
    * (the higher-home row probing down into the lower home, `__hb < __ha`);
    * a same-home pair keeps the `id` ordering to collapse its two
    * orientations. Output ids are canonicalized (id_a < id_b), so the
    * result SET is identical to the double-sided construction.
    */
  def embeddingDupPairsLsh(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 0,
      dims: Int = 64,
      probes: Int = 0,
      maxCandidates: Option[Long] = None): DataFrame = {
    // planes <= 0 auto-sizes like autoCells: 2^planes buckets of
    // ~TargetCellSize vectors keep the bucket equi-join's candidate
    // volume linear in n (a FIXED plane count goes quadratic once the
    // corpus outgrows 2^planes * target — same failure mode as the fixed
    // k=16 quantizer, see autoCells)
    val np =
      if (planes > 0) planes
      else math.max(8, math.ceil(
        math.log(math.max(1.0, emb.count().toDouble / TargetCellSize)) / math.log(2.0)).toInt)
    val bucketed = emb.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), np, dims).as("__home"))
    val probed =
      if (probes == 0) bucketed.withColumn("__bkt", col("__home"))
      else bucketed.withColumn(
        "__bkt",
        explode(concat(
          array(col("__home")),
          (0 until probes).map(p =>
            array(col("__home").bitwiseXOR(lit(1 << p)))).reduce(concat(_, _)))))
    // sign-bit buckets collapse when the corpus clusters on one side of
    // the hyperplanes (degenerate near-identical embeddings) — fail-fast
    // on the probe-side × home-side join volume, like the Dedup emitters.
    // DOUBLE estimate: exact Long products overflow in the dense regime
    // the guard exists for.
    maxCandidates.foreach { budget =>
      val lc = probed.select(col("__bkt"))
        .groupBy("__bkt").agg(count(lit(1)).as("__lc"))
      val rc = bucketed.select(col("__home").as("__bkt"))
        .groupBy("__bkt").agg(count(lit(1)).as("__rc"))
      val est = lc.join(rc, Seq("__bkt"))
        .agg(coalesce(sum(col("__lc").cast("double") * col("__rc")), lit(0.0)))
        .collect()(0).getDouble(0)
      if (est > budget.toDouble) throw new IllegalStateException(
        f"embeddingDupPairsLsh: estimated $est%.0f candidate join rows " +
          s"exceeds maxCandidates=$budget — the sign-bit buckets are " +
          "saturated (clustered embeddings); raise `planes` (finer " +
          "buckets) or semantic-dedup via k-means cells (semanticDupPairsWith)")
    }
    val l = probed.select(col("__bkt"), col("__home").as("__ha"), col("id").as("__ia"), col("v").as("__va"))
    // right side home-only: the (probes+1)× growth stays on one side
    val r = bucketed.select(col("__home").as("__bkt"), col("__home").as("__hb"), col("id").as("__ib"), col("v").as("__vb"))
    l.join(r, Seq("__bkt"))
      .filter(
        col("__hb") < col("__ha") ||
          (col("__ha") === col("__hb") && col("__ia") < col("__ib")))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("sim") >= threshold)
      .select(
        least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        col("sim"))
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: corpus
    * vectors are assigned to their nearest centroid cell once; a query
    * scans only the `nprobe` cells nearest to it (scan fraction ≈
    * nprobe/k). Centroids come from a deterministic Lloyd refinement
    * (seeded by the first k vectors in id order), so results are
    * reproducible across runs and engines.
    *
    * Cell assignment and probing are one native `NearestCells` expression
    * carrying the centroid matrix as a plan reference object — the plan
    * stays the same size whatever k×dims is (the literal-array form
    * produced k·d constant nodes and a truncated-plan warning). The Lloyd
    * means are computed distributed (groupBy cell over per-dim averages);
    * only the k×d centroid matrix itself ever reaches the driver. At 100 TB
    * the quantizer trains the same way on `trainFraction` of the corpus —
    * standard IVF practice; assignment still covers every vector.
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      cells: Int = 0,
      nprobe: Int = 4,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    // trainCodebook == ivfCentroids below TwoLevelCells (every gate
    // scale); above it, the hierarchical path also hands the probe join
    // its TRAINED coarse grouping
    val cb = trainCodebook(emb, idCol, vecCol, cells, lloydIters, trainFraction)
    ivfTopKWith(emb, cb.fine, idCol, vecCol, queryIds, k, nprobe,
      grouping = cb.grouping)
  }

  /** Cell count when the caller doesn't pick one: bounded-CELL-SIZE
    * scaling, `max(MinCells, n / TargetCellSize)`. Cell population stays
    * ~constant as the corpus grows, which keeps within-cell pair
    * generation (SemDeDup) and the per-probe scan cost LINEAR in n; a
    * FIXED k makes both quadratic (measured: q_semantic_dedup 9.5 s at
    * GenScale sf1 -> 194 s at sf10 with k pinned to 16; 12.4 s -> 43.8 s
    * with auto-sizing). Deterministic (count, not sample), so trained
    * matrices stay oracle-inlinable. Flat nearest-cell assignment is
    * O(n·k·d), so with k ∝ n it was the next asymptotic wall; past
    * [[TwoLevelCells]] cells every assignment/probe site now routes
    * through the two-level coarse→fine quantizer ([[CellIndex]] →
    * `NearestCellsTwoLevel`), which is O(n·√k·d) — the scaling rule here
    * stays linear-cost end to end.
    */
  val TargetCellSize = 2000L
  val MinCells = 16
  def autoCells(n: Long): Int = math.max(MinCells, (n / TargetCellSize).toInt)

  /** Cell count at which nearest-cell work switches from the flat scan to
    * the two-level coarse→fine quantizer. Flat is O(k·d) per row and exact;
    * two-level is O((1+[[CoarseProbes]])·√k·d) and approximate in the
    * standard IVF sense. 4096 sits well past every gate scale (autoCells
    * reaches it at ~8M vectors), so oracle-checked runs always take the
    * flat path and stay bit-stable; at the ~1e5-cell wall the flat scan
    * was documented to hit, two-level is ~35× cheaper per row.
    */
  val TwoLevelCells = 4096

  /** Coarse groups probed per row in the two-level scan. 8 of ~√k groups
    * keeps assignment recall high (SemDeDup/IVF both tolerate near-miss
    * assignment — it only moves a vector to its second-best cell) while
    * retaining the √k speedup.
    */
  val CoarseProbes = 8

  /** Deterministic driver-side clustering of a fine-centroid matrix into
    * ~√k coarse groups (k-means, init = first kc fine centroids, 2 mean
    * updates, final assignment pass): the preprocessing step behind
    * [[graft.functions.NearestCellsTwoLevel]]. O(k^1.5·d) on the driver —
    * at the 1e5-cell wall that is ~3e7·d flops, milliseconds-scale, and it
    * runs ONCE per trained matrix. Empty groups are dropped, so every
    * returned group is probe-able. Scoring and tie-breaks mirror
    * `NearestCells.topCells` (argmax 2·v·c − |c|², ties toward the higher
    * index) so the grouping is reproducible across engines and runs.
    */
  private[graft] def groupCentroids(
      matrix: Seq[Seq[Double]]): (Seq[Seq[Double]], Seq[Seq[Int]]) = {
    val k = matrix.length
    val dims = matrix.head.length
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val fine = matrix.map(_.toArray).toArray
    val coarse = Array.tabulate(kc)(i => fine(i).clone())
    val assign = new Array[Int](k)
    var iter = 0
    while (iter < 3) {
      val norms = coarse.map { c =>
        var s = 0.0; var d = 0
        while (d < dims) { s += c(d) * c(d); d += 1 }
        s
      }
      var i = 0
      while (i < k) {
        var best = -1
        var bestS = Double.NegativeInfinity
        var c = 0
        while (c < kc) {
          var s = 0.0; var d = 0
          while (d < dims) { s += fine(i)(d) * coarse(c)(d); d += 1 }
          s = 2 * s - norms(c)
          if (s > bestS || (s == bestS && c > best)) { bestS = s; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      // mean update on all but the last pass: the final pass is
      // assignment-only, so `members` matches the returned coarse matrix
      if (iter < 2) {
        val sums = Array.fill(kc)(new Array[Double](dims))
        val cnt = new Array[Int](kc)
        i = 0
        while (i < k) {
          val g = assign(i); cnt(g) += 1
          val f = fine(i); val s = sums(g)
          var d = 0
          while (d < dims) { s(d) += f(d); d += 1 }
          i += 1
        }
        var c = 0
        while (c < kc) {
          if (cnt(c) > 0) {
            var d = 0
            while (d < dims) { sums(c)(d) /= cnt(c); d += 1 }
            Array.copy(sums(c), 0, coarse(c), 0, dims)
          }
          c += 1
        }
      }
      iter += 1
    }
    val grouped = (0 until kc)
      .map(c => (coarse(c).toSeq, (0 until k).filter(assign(_) == c)))
      .filter(_._2.nonEmpty)
    (grouped.map(_._1), grouped.map(_._2))
  }

  /** Nearest-cell facade every assignment/probe site routes through: flat
    * `NearestCells` below `twoLevelAt` cells (exact, oracle-stable),
    * the coarse→fine `NearestCellsTwoLevel` scan at or above it. Built
    * once per operation so the grouping is computed at most once per
    * trained matrix.
    *
    * `pretrained` carries a TRAINED coarse grouping (from
    * [[trainCodebook]]'s hierarchical path) and takes precedence over the
    * derived [[groupCentroids]] one: a coarse codebook fitted to the DATA
    * routes probes better than one fitted to the fine-centroid cloud.
    * When set, the two-level scan is used regardless of `twoLevelAt` —
    * production only sets it past the threshold, and specs use that to
    * force the hierarchical path at test scale.
    */
  private[graft] final case class CellIndex(
      centroids: Seq[Seq[Double]],
      twoLevelAt: Int = TwoLevelCells,
      pretrained: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None) {
    import graft.functions.{NearestCells, NearestCellsTwoLevel}
    private lazy val grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] =
      pretrained.orElse(
        if (centroids.length < twoLevelAt) None else Some(groupCentroids(centroids)))
    def isTwoLevel: Boolean = grouping.isDefined
    def nearest(vec: Column, n: Int): Column = grouping match {
      case None => NearestCells.nearestCells(vec, centroids, n)
      case Some((coarse, members)) =>
        NearestCellsTwoLevel.nearestCells(
          vec, centroids, coarse, members, CoarseProbes, n)
    }
  }

  /** Train the IVF coarse quantizer: deterministic init (first `cells`
    * vectors in id order) + `lloydIters` distributed Lloyd refinements.
    * Fully deterministic given the table — the trained matrix can be
    * inlined verbatim into an oracle query (the planeWeights trick), which
    * is how q_ann_ivf is hash-checked against DuckDB.
    *
    * `cells <= 0` (the default) auto-sizes via [[autoCells]].
    */
  def ivfCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int = 0,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0,
      twoLevelAt: Int = TwoLevelCells): Seq[Seq[Double]] = {
    val k = if (cells > 0) cells else autoCells(emb.count())
    // deterministic init: the first k vectors by id
    var centroids: Seq[Seq[Double]] = emb
      .orderBy(idCol)
      .limit(k)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
      .toSeq

    // Lloyd's assignment step rides the same flat/two-level dispatch as
    // serving: with k ∝ n (autoCells) the flat O(n·k·d) assignment is the
    // training-side scale wall, and a near-miss assignment only nudges a
    // mean. Rebuilt per iteration — the matrix it groups just changed.
    def nearestCell(vec: Column): Column =
      CellIndex(centroids, twoLevelAt).nearest(vec, 1).getItem(0)

    // deterministic training subset (id-hash sample, not a random split)
    val train =
      if (trainFraction >= 1.0) emb
      else emb.filter(pmod(xxhash64(col(idCol)), lit(1000)) < lit((trainFraction * 1000).toInt))

    // Lloyd refinement: per-cell per-dim means, computed distributed; the
    // only driver traffic is the k×d matrix (tiny), not a data scan result
    for (_ <- 0 until lloydIters)
      centroids = lloydStep(train, vecCol, centroids, nearestCell(col(vecCol)))
    centroids
  }

  /** One distributed Lloyd mean-update: assign every train row via
    * `nearest` (an expression producing the cell index), compute per-cell
    * per-dim means, and return the updated matrix (cells with no assigned
    * rows keep their previous centroid). Driver traffic is the k×d means
    * matrix only.
    */
  private def lloydStep(
      train: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Double]],
      nearest: Column): Seq[Seq[Double]] = {
    val dims = centroids.head.length
    val meanCols = (0 until dims).map(d =>
      avg(element_at(col(vecCol), d + 1).cast("double")).as(s"__d$d"))
    val means = train
      .withColumn("__cell", nearest)
      .groupBy("__cell")
      .agg(meanCols.head, meanCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> (0 until dims).map(d => r.getDouble(d + 1)))
      .toMap
    centroids.zipWithIndex.map { case (c, i) => means.getOrElse(i, c) }
  }

  /** A trained quantizer: the fine centroid matrix plus, on the
    * hierarchical path, the trained coarse grouping the two-level scan
    * probes through. `grouping = None` means flat (every gate scale):
    * downstream behavior is identical to passing the bare matrix.
    */
  final case class Codebook(
      fine: Seq[Seq[Double]],
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])]) {
    private[graft] def cellIndex(twoLevelAt: Int = TwoLevelCells): CellIndex =
      CellIndex(fine, twoLevelAt, grouping)
  }

  /** Train a codebook, choosing the training shape by scale:
    *
    *   - `k < twoLevelAt`: exactly [[ivfCentroids]] (flat init + Lloyd) —
    *     bit-identical matrices, so every oracle-checked path is unchanged.
    *   - `k >= twoLevelAt`: TRUE coarse→fine hierarchical training. The
    *     flat path at this size already routed Lloyd assignment through a
    *     two-level scan, but its grouping was DERIVED per iteration from
    *     the fine-centroid cloud ([[groupCentroids]] — k-means over
    *     centroids, blind to the data density); here the ~√k coarse
    *     codebook is itself Lloyd-trained on the corpus, fine cells are
    *     allocated to coarse groups ∝ their data population (largest
    *     remainder, deterministic), initialized from each group's first
    *     vectors in id order, and refined with WITHIN-GROUP assignment
    *     (`coarseProbes = 1` — O(√k·d)/row, the cheapest possible
    *     assignment pass). The returned grouping is the trained one, so
    *     serving probes through coarse cells that mirror the data, not the
    *     centroid cloud.
    *
    * Under extreme skew a coarse group can hold fewer vectors than its
    * fine-cell quota; quotas are capped at the group population, so the
    * realized `fine.length` can fall below `cells` (callers read
    * `codebook.fine.length`, never assume the request). Deterministic
    * end-to-end: counts, not samples; ties broken by group index.
    */
  def trainCodebook(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cells: Int = 0,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0,
      twoLevelAt: Int = TwoLevelCells): Codebook = {
    val k = if (cells > 0) cells else autoCells(emb.count())
    if (k < twoLevelAt)
      return Codebook(
        ivfCentroids(emb, idCol, vecCol, k, lloydIters, trainFraction, twoLevelAt), None)

    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // coarse codebook: a SMALL flat k-means over the same train set
    // (twoLevelAt = MaxValue pins the flat scan — kc ~ √k is cheap)
    val coarse = ivfCentroids(
      emb, idCol, vecCol, kc, lloydIters, trainFraction, twoLevelAt = Int.MaxValue)
    val train =
      if (trainFraction >= 1.0) emb
      else emb.filter(pmod(xxhash64(col(idCol)), lit(1000)) < lit((trainFraction * 1000).toInt))
    val coarseAssign = train.withColumn("__cg",
      graft.functions.NearestCells.nearestCells(col(vecCol), coarse, 1).getItem(0))

    // fine-cell allocation ∝ coarse-group population (largest remainder)
    val counts = coarseAssign.groupBy("__cg").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nTrain = counts.values.sum.toDouble
    val nonEmpty = (0 until kc).filter(g => counts.getOrElse(g, 0L) > 0L)
    val quota = nonEmpty.map(g => k * counts(g) / nTrain)
    val alloc = scala.collection.mutable.ArraySeq.tabulate(nonEmpty.length)(i =>
      math.min(counts(nonEmpty(i)), math.max(1L, quota(i).toLong)))
    // trim overshoot from the largest allocations; grow shortfall by
    // largest remainder — both deterministic (ties → lower index)
    while (alloc.sum > k) {
      val i = alloc.indices.maxBy(i => (alloc(i), -i))
      alloc(i) -= 1
    }
    while (alloc.sum < k &&
        alloc.indices.exists(i => alloc(i) < counts(nonEmpty(i)))) {
      val i = alloc.indices
        .filter(i => alloc(i) < counts(nonEmpty(i)))
        .maxBy(i => (quota(i) - alloc(i), -i))
      alloc(i) += 1
    }

    // fine init: each group's first k_g vectors in id order. The window
    // ranks a NARROW (group, id) projection — the vector payload joins
    // back by id after the cut, so the sort never shuffles embeddings
    val allocByGroup = nonEmpty.zip(alloc).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__cg").orderBy(idCol)
    val initIds = coarseAssign.select(col("__cg"), col(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= element_at(typedLit(allocByGroup), col("__cg")))
      .select(col("__cg"), col(idCol))
    val initRows = initIds
      .join(train.select(col(idCol), col(vecCol)), Seq(idCol))
      .orderBy("__cg", idCol)
      .select(col("__cg"), col(vecCol))
      .collect()
    var fine: Seq[Seq[Double]] = initRows.map(r =>
      r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toSeq).toSeq
    // members: consecutive index blocks per kept group (same group order
    // as the collect's sort); groups that lost their whole quota to the
    // trim loop are dropped from the grouping like groupCentroids drops
    // empty ones
    val blockSizes = nonEmpty.indices.map(i =>
      initRows.count(_.getInt(0) == nonEmpty(i)))
    val offsets = blockSizes.scanLeft(0)(_ + _)
    val kept = nonEmpty.indices.filter(blockSizes(_) > 0)
    val coarseKept = kept.map(i => coarse(nonEmpty(i)))
    val members = kept.map(i =>
      (offsets(i) until offsets(i) + blockSizes(i)).toSeq)

    // fine refinement: within-group assignment (coarseProbes = 1)
    for (_ <- 0 until lloydIters)
      fine = lloydStep(train, vecCol, fine,
        graft.functions.NearestCellsTwoLevel.nearestCells(
          col(vecCol), fine, coarseKept, members, 1, 1).getItem(0))
    Codebook(fine, Some((coarseKept, members)))
  }

  /** IVF search against an already-trained centroid matrix. `grouping`
    * (optional) is a trained coarse grouping from [[trainCodebook]] —
    * probes route through it instead of the derived [[groupCentroids]].
    */
  def ivfTopKWith(
      emb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int = 4,
      twoLevelAt: Int = TwoLevelCells,
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None): DataFrame = {
    val cellIdx = CellIndex(centroids, twoLevelAt, grouping)
    val assigned = emb.withColumn("__cell", cellIdx.nearest(col(vecCol), 1).getItem(0))
    val corpus = assigned.select(col("__cell"), col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    // each query probes its nprobe nearest cells
    val queries = emb
      .filter(col(idCol).isInCollection(queryIds))
      .withColumn("__cell", explode(cellIdx.nearest(col(vecCol), nprobe)))
      .select(col("__cell"), col(idCol).as("query_id"), col(vecCol).as("__va"))
    val scored = corpus
      .join(broadcast(queries), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
    rankTopK(scored, k)
  }

  // ---- persisted IVF index --------------------------------------------

  /** Build and PERSIST an IVF index: the trained centroid matrix plus the
    * corpus assigned to cells and partitioned BY cell on disk —
    *
    *   path/centroids/part-*.parquet          (cell, w: array<double>)
    *   path/corpus/__cell=<c>/part-*.parquet  (id, vec)
    *
    * At 100 TB you train once and query many times; `ivfQueryIndex` then
    * reads ONLY the probed cell directories (Spark's dynamic partition
    * pruning turns the broadcast probe join into directory pruning), so a
    * query touches ~nprobe/cells of the corpus at the FILESYSTEM level,
    * not just post-scan.
    */
  def ivfWriteIndex(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      cells: Int = 0,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0): Unit = {
    val cb = trainCodebook(emb, idCol, vecCol, cells, lloydIters, trainFraction)
    ivfWriteIndexWith(emb, cb.fine, idCol, vecCol, path, grouping = cb.grouping)
  }

  /** Index write against an already-trained centroid matrix. The persisted
    * format stays (cell, w) only — readers past [[TwoLevelCells]] re-derive
    * a probe grouping deterministically via [[groupCentroids]]; the trained
    * `grouping` (when given) is used for THIS write's assignment pass.
    */
  def ivfWriteIndexWith(
      emb: DataFrame,
      centroids: Seq[Seq[Double]],
      idCol: String,
      vecCol: String,
      path: String,
      grouping: Option[(Seq[Seq[Double]], Seq[Seq[Int]])] = None): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (w, c) => (c, w) }
      .toDF("cell", "w")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val assigned = emb
      .withColumn("__cell",
        CellIndex(centroids, pretrained = grouping).nearest(col(vecCol), 1).getItem(0))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("__cell"))
    assigned
      .repartition(col("__cell"))
      .write.mode("overwrite")
      .partitionBy("__cell")
      .parquet(s"$path/corpus")
    // record the TRAINED corpus size: the appended-fraction telemetry's
    // denominator. Count the WRITTEN corpus, not `assigned` — that frame
    // would re-run the whole source scan as a second job (and could
    // disagree with what landed if the source is non-deterministic); the
    // written parquet counts from footer metadata alone
    java.nio.file.Files.write(
      new java.io.File(path, "_train_rows").toPath,
      assigned.sparkSession.read.parquet(s"$path/corpus")
        .count().toString.getBytes("UTF-8"))
  }

  /** Retrain thresholds for a persisted IVF index (see the RETRAIN POLICY
    * note on [[ivfAppendIndex]]): rebuild when appends exceed 20% of the
    * corpus the centroids were trained on, or the largest cell grows past
    * 4× the mean — the points where frozen-centroid recall and the nprobe
    * scan fraction start degrading measurably.
    */
  val RetrainAppendFraction = 0.20
  val RetrainCellSkew = 4.0

  /** Cell-balance telemetry for a persisted IVF index. Derived without
    * scanning vectors: row counts come from parquet footers and the
    * partition column only.
    */
  final case class IvfIndexStats(
      cells: Int,
      trainedRows: Long,
      totalRows: Long,
      maxCellRows: Long) {
    def appendedFraction: Double =
      if (trainedRows <= 0) 0.0
      else math.max(0L, totalRows - trainedRows).toDouble / trainedRows
    def meanCellRows: Double =
      if (cells == 0) 0.0 else totalRows.toDouble / cells
    def cellSkew: Double =
      if (meanCellRows == 0.0) 0.0 else maxCellRows / meanCellRows
    /** The documented rebuild trigger a 100 TB operator alerts on. */
    def needsRetrain: Boolean =
      appendedFraction > RetrainAppendFraction || cellSkew > RetrainCellSkew
  }

  /** Compute [[IvfIndexStats]] for the index at `path`. Indexes persisted
    * before the `_train_rows` marker existed report trainedRows = -1
    * (appendedFraction 0 — unknown base, only the skew signal applies).
    */
  def ivfIndexStats(spark: SparkSession, path: String): IvfIndexStats = {
    val trainFile = new java.io.File(path, "_train_rows")
    val trained =
      if (!trainFile.exists) -1L
      else new String(
        java.nio.file.Files.readAllBytes(trainFile.toPath), "UTF-8").trim.toLong
    val perCell = spark.read.parquet(s"$path/corpus")
      .groupBy("__cell").count()
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1))
    IvfIndexStats(
      cells = perCell.length,
      trainedRows = trained,
      totalRows = perCell.map(_._2).sum,
      maxCellRows = if (perCell.isEmpty) 0L else perCell.map(_._2).max)
  }

  /** Append NEW vectors to a persisted index: assign against the index's
    * FROZEN centroids and append files under the existing `__cell=` dirs —
    * existing files are never touched, so concurrent readers stay valid
    * and a query after append equals a full rebuild over the combined
    * corpus with the same centroids (spec-asserted). O(|new|) work.
    *
    * RETRAIN POLICY (the classic IVF trade): centroids are frozen at train
    * time, so appended vectors always join their nearest EXISTING cell.
    * Recall holds while the appended data resembles the training
    * distribution; under drift, cells skew and the nprobe scan fraction
    * degrades. Rebuild (`ivfWriteIndex`, retraining centroids) when
    * [[IvfIndexStats.needsRetrain]] fires — appended fraction past
    * [[RetrainAppendFraction]] of the trained corpus, or the largest cell
    * past [[RetrainCellSkew]]× the mean. Returns the post-append stats so
    * the maintenance job that appends is the one that sees the trigger.
    */
  def ivfAppendIndex(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): IvfIndexStats = {
    val spark = emb.sparkSession
    val centroids = ivfReadCentroids(spark, path)
    emb
      .withColumn("__cell", CellIndex(centroids).nearest(col(vecCol), 1).getItem(0))
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("__cell"))
      .repartition(col("__cell"))
      .write.mode("append")
      .partitionBy("__cell")
      .parquet(s"$path/corpus")
    ivfIndexStats(spark, path)
  }

  /** The retrain job the RETRAIN POLICY points at: when
    * [[IvfIndexStats.needsRetrain]] fires (or `force`), retrain the
    * coarse quantizer over the index's CURRENT corpus and rewrite the
    * whole index — fresh centroids, fresh cell assignment, fresh
    * `_train_rows` base (appendedFraction resets to 0). Returns the
    * post-job stats either way, so a maintenance loop is one call:
    * append, then rebuild-if-needed.
    *
    * The corpus is STAGED to `_rebuild_stage` before the in-place
    * rewrite (reading and overwriting the same directory in one job is
    * undefined), and the stage doubles as the crash story: Spark's
    * `_SUCCESS` marker commits it, and a committed stage found on entry
    * means a previous rebuild died mid-rewrite — the stage, not the
    * possibly-partial corpus, is then the authoritative source and the
    * rebuild resumes from it. Single-maintenance-writer contract, same
    * as every compactor here; index QUERIES racing a rebuild should run
    * against a separate index generation at 100 TB (rebuild into a new
    * path, swap the serving pointer).
    */
  def ivfRebuildIfNeeded(
      spark: SparkSession,
      path: String,
      cells: Int = 0,
      lloydIters: Int = 2,
      trainFraction: Double = 1.0,
      force: Boolean = false): IvfIndexStats = {
    val stage = s"$path/_rebuild_stage"
    val stageCommitted = new java.io.File(stage, "_SUCCESS").exists
    if (!stageCommitted) {
      // a stage dir without _SUCCESS is a dead write — remove and decide
      // fresh from the (still intact) live index
      deleteRec(new java.io.File(stage))
      val stats = ivfIndexStats(spark, path)
      if (!force && !stats.needsRetrain) return stats
      spark.read.parquet(s"$path/corpus").select("id", "vec")
        .write.mode("overwrite").parquet(stage)
    }
    ivfWriteIndex(
      spark.read.parquet(stage), "id", "vec", path,
      cells, lloydIters, trainFraction)
    deleteRec(new java.io.File(stage))
    ivfIndexStats(spark, path)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory && f.listFiles != null) f.listFiles.foreach(deleteRec)
    f.delete()
  }

  def ivfReadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toSeq)
      .toSeq

  /** Query a persisted IVF index. The probe join keys on the index's
    * partition column, so Catalyst inserts a dynamic-partition-pruning
    * subquery: only the ≤ |queries|·nprobe probed cell directories are
    * listed and scanned (asserted in SimilaritySpec via the plan's
    * `dynamicpruning` filter). Results are identical to `ivfTopKWith`
    * over the same centroids.
    */
  def ivfQueryIndex(
      spark: SparkSession,
      path: String,
      queryIds: Seq[Long],
      k: Int,
      nprobe: Int = 4): DataFrame = {
    val centroids = ivfReadCentroids(spark, path)
    val corpusRaw = spark.read.parquet(s"$path/corpus")
    val corpus = corpusRaw
      .select(col("__cell"), col("id").as("neighbor_id"), col("vec").as("__vb"))
    val queries = corpusRaw
      .filter(col("id").isInCollection(queryIds))
      .select(col("id").as("query_id"), col("vec").as("__va"))
      .withColumn("__cell", explode(CellIndex(centroids).nearest(col("__va"), nprobe)))
    val scored = corpus
      .join(broadcast(queries), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
    rankTopK(scored, k)
  }

  /** Deterministic Rademacher (±1) hyperplane weights: plane p, dim d →
    * sign of a bit of md5(p:d). Pure function of (p, d) — identical on any
    * engine and any cluster.
    */
  private[graft] def planeWeights(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val h = md.digest(s"$p:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Sign-bit sketch: bucket = Σ_p [dot(w_p, v) > 0] << p. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val w = planeWeights(planes, dims)
    val bits = (0 until planes).map { p =>
      val proj = graft.functions.VectorOps.dot(vec, array(w(p).toIndexedSeq.map(lit): _*))
      when(proj > 0, shiftleft(lit(1), p)).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: queries only compare against corpus vectors in the
    * same LSH bucket, plus (multi-probe) every bucket at hamming distance 1
    * — the standard recall/scan-fraction trade: probing p+1 of 2^p buckets
    * scans ~(p+1)/2^p of the corpus instead of all of it. Recall measured
    * against `bruteForceTopK` in tests.
    */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryIds: Seq[Long],
      k: Int,
      planes: Int = 8,
      dims: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = emb.withColumn("__bkt", lshBucket(col(vecCol), planes, dims))
    val corpus = bucketed.select(col("__bkt"), col(idCol).as("neighbor_id"), col(vecCol).as("__vb"))
    val probes =
      if (multiProbe)
        explode(
          concat(
            array(col("__bkt")),
            transform(
              sequence(lit(0), lit(planes - 1)),
              i => col("__bkt").bitwiseXOR(call_function("shiftleft", lit(1), i)))))
      else col("__bkt")
    val queries = bucketed
      .filter(col(idCol).isInCollection(queryIds))
      .withColumn("__probe", probes)
      .select(col("__probe").as("__bkt"), col(idCol).as("query_id"), col(vecCol).as("__va"))
    val scored = corpus
      .join(broadcast(queries), Seq("__bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("__va"), col("__vb")), 6))
    rankTopK(scored, k)
  }

  // ---- covariance / PCA (dimensionality reduction) ----------------------

  /** Exact second-moment statistics of the 1/quant-quantized vectors:
    * (n, Σvq, upper-triangle Σvq·vqᵀ). ONE distributed pass through
    * [[graft.functions.OuterProductAggregate]] — the buffer is a fixed
    * `1 + d + d(d+1)/2` longs however large the corpus, map-side combined,
    * and only that buffer reaches the driver. Quantization makes every sum
    * exact integer arithmetic, so the statistics are bit-identical on any
    * engine (the gate's oracle recomputes them in SQL). Overflow throws via
    * addExact rather than wrapping; quant = 1e6 is exact past any gate
    * scale, drop to 1e3 for 10¹²-row corpora (see the aggregate's
    * scaladoc).
    */
  final case class CovStats(n: Long, sums: Array[Long], prods: Array[Long], dims: Int, quant: Double) {
    private def tri(i: Int, j: Int): Int = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      a * dims - a * (a - 1) / 2 + (b - a)
    }
    /** Sample covariance entry, computed with the exact integer partials
      * and ONE fixed double formula (mirrored verbatim by the oracle SQL,
      * so the doubles agree bit-for-bit).
      */
    def cov(i: Int, j: Int): Double =
      (prods(tri(i, j)).toDouble - sums(i).toDouble * sums(j).toDouble / n.toDouble) /
        (n - 1).toDouble / (quant * quant)
    def mean(i: Int): Double = sums(i).toDouble / n.toDouble / quant
    def covMatrix: Array[Array[Double]] =
      Array.tabulate(dims, dims)((i, j) => cov(i, j))
    def means: Array[Double] = Array.tabulate(dims)(mean)
  }

  /** The single-row aggregation frame behind [[covarianceStats]] —
    * exposed so PlanAudit can pin its shape (one ObjectHashAggregate,
    * no Expand/Generate, no per-entry aggregate fan-out).
    */
  private[graft] def covStatsFrame(
      emb: DataFrame, vecCol: String, dims: Int, quant: Double): DataFrame =
    emb.agg(graft.functions.OuterProductAggregate
      .outerProduct(col(vecCol), dims, quant).as("__op"))

  def covarianceStats(
      emb: DataFrame,
      vecCol: String,
      dims: Int,
      quant: Double = 1e6): CovStats = {
    val row = covStatsFrame(emb, vecCol, dims, quant).collect()(0)
    val all = row.getSeq[Long](0).toArray
    CovStats(all(0), all.slice(1, 1 + dims), all.drop(1 + dims), dims, quant)
  }

  /** Gate-shape covariance: one row per upper-triangle entry
    * (i ≤ j, 1-based) with the exact-partial double value — the form the
    * DuckDB oracle reproduces bit-for-bit. The heavy work is the one
    * aggregate pass; this frame is built from the collected k×k driver
    * matrix (the centroid-matrix convention).
    */
  def covarianceFrame(
      emb: DataFrame,
      vecCol: String,
      dims: Int,
      quant: Double = 1e6): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val st = covarianceStats(emb, vecCol, dims, quant)
    (for { i <- 0 until dims; j <- i until dims }
      yield (i + 1, j + 1, st.cov(i, j)))
      .toDF("i", "j", "cov")
  }

  /** Deterministic symmetric eigendecomposition (cyclic Jacobi): returns
    * (eigenvalues descending, row-major eigenvectors — `vectors(k)` pairs
    * with `values(k)`). Driver-side O(d³·sweeps) — milliseconds at the
    * embedding widths this engine sees (d ≤ a few hundred); the
    * DISTRIBUTED work of PCA is the covariance pass, never this. Sign
    * convention: each vector's largest-|entry| (first on ties) is made
    * positive, so the decomposition is unique and reproducible.
    */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]],
      maxSweeps: Int = 50,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // extract, sort by eigenvalue descending (tie → lower original index),
    // fix signs so the decomposition is unique
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      val mx = col.indices.maxBy(r => (math.abs(col(r)), -r))
      if (col(mx) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  /** A trained PCA model: mean vector, top-r principal components
    * (row-major, variance-descending), and their eigenvalues.
    */
  final case class PcaModel(
      mean: Seq[Double],
      components: Seq[Seq[Double]],
      eigenvalues: Seq[Double])

  /** Train PCA over an embedding column: one distributed covariance pass
    * ([[covarianceStats]]) + a driver-side Jacobi eigendecomposition of
    * the d×d matrix. Deterministic end-to-end (exact integer partials,
    * sign-fixed eigenvectors).
    */
  def pcaTrain(
      emb: DataFrame,
      vecCol: String,
      dims: Int,
      r: Int,
      quant: Double = 1e6): PcaModel = {
    require(r >= 1 && r <= dims, s"pca: r must be in [1, $dims], got $r")
    val st = covarianceStats(emb, vecCol, dims, quant)
    val (values, vectors) = jacobiEigen(st.covMatrix)
    PcaModel(
      st.means.toSeq,
      vectors.take(r).map(_.toSeq).toSeq,
      values.take(r).toSeq)
  }

  /** Project vectors onto a trained model's components: map-only, r
    * codegen'd dot products per row ((v − μ)·c_k = v·c_k − μ·c_k, the
    * centering folded into a scalar constant). Output keeps the input
    * columns and appends `pc_1..pc_r`.
    */
  def pcaProject(emb: DataFrame, vecCol: String, model: PcaModel): DataFrame =
    model.components.zipWithIndex.foldLeft(emb) { case (df, (c, k)) =>
      val muDotC = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      df.withColumn(s"pc_${k + 1}",
        dot(col(vecCol), array(c.map(lit): _*)) - lit(muDotC))
    }

  /** Quantize trained components to exact longs at `compQuant` — the
    * inlinable form [[pcaProjectQuantized]] and its gate oracle share, so
    * "the same matrix" is literal: both engines multiply identical
    * integers.
    */
  def quantizeComponents(
      components: Seq[Seq[Double]], compQuant: Double = 1e9): Seq[Seq[Long]] =
    components.map(_.map(c => math.floor(c * compQuant + 0.5).toLong))

  /** Exact-integer PCA projection — the hash-gateable twin of
    * [[pcaProject]]: `pc_q(j) = Σ_d wq(j,d) · floor(v_d·quant + 0.5)`
    * with the trained components quantized to longs
    * ([[quantizeComponents]]), so every coordinate is an exact 64-bit
    * integer both engines reproduce bit-for-bit
    * ([[graft.functions.WeightedProjection]], one codegen'd map-only
    * pass, no shuffle). UNCENTERED: centering subtracts the constant
    * μ·c_j per component — a rank-preserving shift [[pcaProject]] applies
    * in its double form (spec-checked in PcaSpec); folding it here would
    * mix a non-representable double mean into exact integers. Divide by
    * quant·compQuant to recover real projections.
    */
  def pcaProjectQuantized(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      quantizedComponents: Seq[Seq[Long]],
      quant: Double = 1e6): DataFrame =
    emb.select(
        col(idCol),
        graft.functions.WeightedProjection(col(vecCol), quantizedComponents, quant).as("proj"))
      .filter(col("proj").isNotNull)

  /** Johnson–Lindenstrauss signed random projection — the TRAINING-FREE
    * dimensionality reduction next to [[pca]]: ±1 signs derived from the
    * md5 plane family, inputs quantized to 1/quant, outputs EXACT 64-bit
    * integer coordinates ([[graft.functions.SignedProjection]]).
    * Distances are preserved to (1±ε) for outDims ≈ O(log n / ε²) —
    * the standard pre-blocking step before LSH/IVF when the native
    * dimensionality is large. Unlike PCA there is no pass over the data
    * to fit anything: the whole operator is ONE map-only projection, no
    * shuffle, no driver matrix (spec-pinned plan). Divide coordinates by
    * quant to recover real values; comparisons (cosine/L2 ranking) work
    * directly on the integer coordinates since quant is a global scale.
    *
    * Output: `idCol`, `proj` = array<long> of outDims exact coordinates;
    * rows whose vector is missing/short are dropped.
    */
  def randomProjection(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      outDims: Int,
      quant: Double = 1e6,
      seed: String = "rp"): DataFrame =
    emb.select(
        col(idCol),
        graft.functions.SignedProjection(col(vecCol), dims, outDims, quant, seed).as("proj"))
      .filter(col("proj").isNotNull)
}
