package graft

import graft.core.Tables
import graft.pipeline.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f)))  // opposite
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(0L), 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    assert(out(0).getAs[Double]("sim") > 0.99)
  }

  test("lshTopK achieves usable recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(emb, "vec_id", "embedding", queries, 5, planes = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 planes → 16 buckets over 500 vecs; random unclustered embeddings
    // put a fair share of true neighbors in other buckets — demand a
    // nontrivial floor, exact recall is measured in the report
    assert(recall >= 0.2, s"LSH recall too low: $recall")
  }

  test("embeddingDupPairsLsh: derived block key, multi-probe recovers more, no dup pairs") {
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001"))
    val exact = Similarity.embeddingDupPairs(emb, "vec_id", "embedding", "label", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val home = Similarity.embeddingDupPairsLsh(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val probed = Similarity
      .embeddingDupPairsLsh(emb, "vec_id", "embedding", 0.3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // canonical-bucket dedup: multi-probe never emits a pair twice
    assert(probed.length === probed.toSet.size)
    // probing only ADDS candidates
    assert(home.toSet.subsetOf(probed.toSet))
    assert(probed.length >= home.length)
    // every emitted pair is a true >= threshold pair; label-blocked exact
    // pairs are a reference point, not a superset (labels and buckets are
    // different blockings) — but the two should overlap on real near-dups
    assert((probed.toSet intersect exact).nonEmpty)
  }

  test("ivfTopK: deterministic, recall beats single-probe scan fraction") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf1 = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, 5,
      cells = 16, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf2 = Similarity.ivfTopK(emb, "vec_id", "embedding", queries, 5,
      cells = 16, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf1 === ivf2) // deterministic across runs
    val recall = (exact intersect ivf1).size.toDouble / exact.size
    // nprobe/cells = 25% scan fraction; random embeddings → recall should
    // still clear a useful floor
    assert(recall >= 0.25, s"IVF recall too low: $recall")
    println(s"IVF recall @ nprobe=4/16: $recall")
  }

  test("groupCentroids: deterministic partition of the fine cells into probe-able groups") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 32)
    val (coarse, members) = Similarity.groupCentroids(cents)
    val (coarse2, members2) = Similarity.groupCentroids(cents)
    assert(coarse === coarse2 && members === members2) // deterministic
    assert(coarse.length === members.length)
    assert(coarse.length <= math.ceil(math.sqrt(32.0)).toInt)
    assert(members.forall(_.nonEmpty)) // empty groups dropped → always probe-able
    // every fine cell lives in exactly one group
    assert(members.flatten.sorted === (0 until 32))
    assert(coarse.forall(_.length === cents.head.length))
  }

  test("two-level nearest-cell scan: exhaustive probing equals the flat expression") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{NearestCells, NearestCellsTwoLevel}
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 32)
    val (coarse, members) = Similarity.groupCentroids(cents)
    // coarseProbes >= groups → the fine scan covers every cell, so the
    // approximation vanishes and results must match flat BIT-FOR-BIT
    // (same scoring, same tie-break, group scan order must not matter)
    val both = emb.select(
      NearestCells.nearestCells(col("embedding"), cents, 4).as("flat"),
      NearestCellsTwoLevel
        .nearestCells(col("embedding"), cents, coarse, members, coarse.length, 4)
        .as("two"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("CellIndex dispatch + forced two-level IVF keeps recall and determinism") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 16)
    assert(!Similarity.CellIndex(cents).isTwoLevel) // gate scales stay flat/exact
    assert(Similarity.CellIndex(cents, twoLevelAt = 2).isTwoLevel)
    val queries = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    def run() = Similarity
      .ivfTopKWith(emb, cents, "vec_id", "embedding", queries, 5, nprobe = 4,
        twoLevelAt = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val a = run(); val b = run()
    assert(a === b) // deterministic across runs
    // CoarseProbes=8 of <=4 groups is exhaustive COARSE probing here, but
    // assignment/probing still flow the two-level path end to end; recall
    // keeps the flat test's floor
    val recall = (exact intersect a).size.toDouble / exact.size
    assert(recall >= 0.25, s"two-level IVF recall too low: $recall")
  }

  test("trainCodebook: flat below threshold is bit-identical to ivfCentroids") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = Similarity.trainCodebook(emb, "vec_id", "embedding", cells = 16)
    assert(cb.grouping.isEmpty) // gate scales: flat, no grouping
    assert(cb.fine === Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 16))
  }

  test("trainCodebook: hierarchical path trains a population-proportional grouping") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{NearestCells, NearestCellsTwoLevel}
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    // twoLevelAt = 4 forces the hierarchical path at test scale
    val cb = Similarity.trainCodebook(emb, "vec_id", "embedding", cells = 24,
      twoLevelAt = 4)
    val (coarse, members) = cb.grouping.getOrElse(fail("expected hierarchical grouping"))
    // structure: every fine cell in exactly one CONSECUTIVE block; blocks
    // align with the coarse codebook; nothing empty
    assert(coarse.length === members.length)
    assert(members.forall(_.nonEmpty))
    assert(members.flatten.sorted === (0 until cb.fine.length))
    assert(members.flatten === members.flatten.sorted) // consecutive blocks in order
    assert(cb.fine.length === 24) // 500 train vecs, no group starves the quota
    assert(coarse.forall(_.length === cb.fine.head.length))
    // deterministic end-to-end
    val cb2 = Similarity.trainCodebook(emb, "vec_id", "embedding", cells = 24,
      twoLevelAt = 4)
    assert(cb2.fine === cb.fine && cb2.grouping === cb.grouping)
    // exhaustive coarse probing through the TRAINED grouping equals the
    // flat scan over the fine matrix bit-for-bit (same scoring/tie-break)
    val both = emb.select(
      NearestCells.nearestCells(col("embedding"), cb.fine, 3).as("flat"),
      NearestCellsTwoLevel
        .nearestCells(col("embedding"), cb.fine, coarse, members, coarse.length, 3)
        .as("two"))
      .collect()
    both.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("ivfTopK through a hierarchical codebook keeps recall and determinism") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val cb = Similarity.trainCodebook(emb, "vec_id", "embedding", cells = 16,
      twoLevelAt = 4)
    def run() = Similarity
      .ivfTopKWith(emb, cb.fine, "vec_id", "embedding", queries, 5, nprobe = 4,
        grouping = cb.grouping)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val a = run(); val b = run()
    assert(a === b)
    val recall = (exact intersect a).size.toDouble / exact.size
    assert(recall >= 0.25, s"hierarchical-codebook IVF recall too low: $recall")
  }

  test("persisted IVF index: identical results, probe join prunes cell dirs") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val queries = (0L until 10L)
    val path =
      java.nio.file.Files.createTempDirectory("graft-ivfindex").toString + "/idx"
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding")
    Similarity.ivfWriteIndexWith(emb, cents, "vec_id", "embedding", path)

    // round-trip: persisted centroids == trained centroids, bit for bit
    assert(Similarity.ivfReadCentroids(spark, path) === cents)

    // querying the index == querying in-memory with the same centroids
    val direct = Similarity.ivfTopKWith(emb, cents, "vec_id", "embedding", queries, 5)
      .collect().map(r => r.toSeq).toSet
    val indexed = Similarity.ivfQueryIndex(spark, path, queries, 5)
      .collect().map(r => r.toSeq).toSet
    assert(indexed === direct)

    // the probe join reaches the scan as a dynamic-partition-pruning
    // filter on __cell: only probed cell directories are read
    val q = Similarity.ivfQueryIndex(spark, path, queries, 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(2000)}")
  }

  test("ivfAppendIndex: append equals full rebuild over the combined corpus") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val first = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    val queries = (0L until 10L)

    // train on the FIRST half only; centroids are frozen from then on
    val cents = Similarity.ivfCentroids(first, "vec_id", "embedding")
    Similarity.ivfWriteIndexWith(first, cents, "vec_id", "embedding", s"$base/inc")
    val filesBefore = new java.io.File(s"$base/inc/corpus").listFiles()
      .filter(_.getName.startsWith("__cell="))
      .flatMap(d => d.listFiles().map(_.getPath)).toSet

    val stats = Similarity.ivfAppendIndex(rest, "vec_id", "embedding", s"$base/inc")
    // append-only: every pre-append file is still there, untouched
    val filesAfter = new java.io.File(s"$base/inc/corpus").listFiles()
      .filter(_.getName.startsWith("__cell="))
      .flatMap(d => d.listFiles().map(_.getPath)).toSet
    assert(filesBefore.subsetOf(filesAfter))
    assert(filesAfter.size > filesBefore.size)
    // retrain telemetry: the append doubled the trained corpus, so the
    // appended fraction (1.0) is far past the 20% rebuild threshold
    assert(stats.trainedRows === 250L)
    assert(stats.totalRows === 500L)
    assert(stats.appendedFraction === 1.0)
    assert(stats.needsRetrain, "100% appended must trip the retrain trigger")

    // a query over the appended index == a full rebuild of the combined
    // corpus with the same frozen centroids
    Similarity.ivfWriteIndexWith(emb, cents, "vec_id", "embedding", s"$base/full")
    val inc = Similarity.ivfQueryIndex(spark, s"$base/inc", queries, 5)
      .collect().map(_.toSeq).toSet
    val full = Similarity.ivfQueryIndex(spark, s"$base/full", queries, 5)
      .collect().map(_.toSeq).toSet
    assert(inc === full)
    assert(inc.nonEmpty)
    // a FULL rebuild resets the telemetry: nothing appended since train
    val fullStats = Similarity.ivfIndexStats(spark, s"$base/full")
    assert(fullStats.trainedRows === fullStats.totalRows)
    assert(fullStats.appendedFraction === 0.0)
  }

  test("ivfRebuildIfNeeded: no-op under threshold, retrain parity past it, crash-safe stage") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val first = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfreb").toString
    val queries = (0L until 10L)
    def corpusFiles(p: String) = new java.io.File(s"$p/corpus").listFiles()
      .filter(_.getName.startsWith("__cell="))
      .flatMap(d => d.listFiles().map(_.getPath)).toSet

    Similarity.ivfWriteIndex(first, "vec_id", "embedding", s"$base/idx")
    // under threshold: a no-op — the corpus files are untouched
    val before = corpusFiles(s"$base/idx")
    val noop = Similarity.ivfRebuildIfNeeded(spark, s"$base/idx")
    assert(!noop.needsRetrain)
    assert(corpusFiles(s"$base/idx") === before)

    // an uncommitted stage (dead write) is swept, then still a no-op
    val stage = new java.io.File(s"$base/idx/_rebuild_stage")
    stage.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stage, "part-junk").toPath, "x")
    Similarity.ivfRebuildIfNeeded(spark, s"$base/idx")
    assert(!stage.exists, "dead stage must be swept")
    assert(corpusFiles(s"$base/idx") === before)

    // append past the 20% threshold → the next maintenance call retrains
    val appended = Similarity.ivfAppendIndex(rest, "vec_id", "embedding", s"$base/idx")
    assert(appended.needsRetrain)
    val rebuilt = Similarity.ivfRebuildIfNeeded(spark, s"$base/idx")
    assert(rebuilt.trainedRows === 500L && rebuilt.appendedFraction === 0.0)
    assert(!rebuilt.needsRetrain)
    assert(!stage.exists, "stage must be cleaned after a successful rebuild")

    // append-then-rebuild == fresh build over the combined corpus: the
    // retrained quantizer init is the first `cells` vectors in id order
    // and Lloyd means are deterministic per row multiset, so queries match
    Similarity.ivfWriteIndex(emb, "vec_id", "embedding", s"$base/fresh")
    val a = Similarity.ivfQueryIndex(spark, s"$base/idx", queries, 5)
      .collect().map(_.toSeq).toSet
    val b = Similarity.ivfQueryIndex(spark, s"$base/fresh", queries, 5)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)

    // crash mid-rewrite: the committed stage survives; kill the corpus
    // dir entirely — the retry must restore a working index from the stage
    val stageSrc = spark.read.parquet(s"$base/idx/corpus").select("id", "vec")
    stageSrc.write.mode("overwrite").parquet(s"$base/idx/_rebuild_stage")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory && f.listFiles != null) f.listFiles.foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(s"$base/idx/corpus"))
    val recovered = Similarity.ivfRebuildIfNeeded(spark, s"$base/idx")
    assert(recovered.totalRows === 500L)
    assert(Similarity.ivfQueryIndex(spark, s"$base/idx", queries, 5)
      .collect().map(_.toSeq).toSet === a)
  }

  test("embeddingDupPairs finds planted near-duplicates within a block") {
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.001f
    val far = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((1L, 0, base), (2L, 0, near), (3L, 0, far))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.embeddingDupPairs(df, "vec_id", "embedding", "label", 0.99)
      .collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1)) === (1L, 2L))
  }

  test("embedding pair budgets fail fast on collapsed blocks, silent under") {
    // one block label over 40 vectors → the block self-join is
    // output-quadratic; likewise identical embeddings collapse every
    // sign-bit LSH bucket
    val v = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val clustered = (1L to 40L).map(i => (i, 0, v)).toDF("vec_id", "label", "embedding")
    val e1 = intercept[IllegalStateException] {
      Similarity.embeddingDupPairs(clustered, "vec_id", "embedding", "label", 0.5,
        maxCandidates = Some(100L)).collect()
    }
    assert(e1.getMessage.contains("embeddingDupPairsLsh"))
    val e2 = intercept[IllegalStateException] {
      Similarity.embeddingDupPairsLsh(clustered, "vec_id", "embedding", 0.5,
        maxCandidates = Some(100L)).collect()
    }
    assert(e2.getMessage.contains("planes"))
    // the real corpus sails under a generous budget on both paths
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    assert(Similarity.embeddingDupPairs(emb, "vec_id", "embedding", "label", 0.3,
      maxCandidates = Some(100000000L)).collect().nonEmpty)
    assert(Similarity.embeddingDupPairsLsh(emb, "vec_id", "embedding", 0.3,
      probes = 2, maxCandidates = Some(100000000L)).collect().nonEmpty)
  }

  test("semanticDedup keeps exactly the component minima of the cell-blocked pairs") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding")
    val pairs = Similarity.semanticDupPairsWith(emb, cents, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // driver-side union-find ground truth over the same pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = emb.select("vec_id").as[Long].collect().toSet
    val expected = all.filter(id => find(id) == id)
    val survivors = Similarity.semanticDedupWith(emb, cents, "vec_id", "embedding", 0.3)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors === expected)
    assert(survivors.size < all.size, "the corpus should contain semantic dups")
    graft.pipeline.Dedup.unpersistIntermediates()
  }

  test("randomProjection: map-only, deterministic, JL distance-preserving") {
    // filter, not limit: a limit's GlobalLimit exchange would mask the
    // map-only assertion on the projection itself
    val emb = graft.core.Tables.embeddings(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("vec_id") < 200)
    val rp = Similarity.randomProjection(emb, "vec_id", "embedding", 64, 16)
    // plan: a pure projection — no Exchange anywhere
    val plan = rp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "randomProjection must not shuffle")
    // partition-layout invariant (map-only determinism)
    val a = rp.orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val b = Similarity.randomProjection(
        emb.repartition(7), "vec_id", "embedding", 64, 16)
      .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(a.toSeq === b.toSeq)
    // JL sanity: pairwise L2 distance ratios concentrate around a single
    // scale factor (signed ±1 projection preserves distances up to
    // sqrt(outDims/dims) in expectation); check relative spread on a
    // sample of pairs
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val projs = a.toMap.map { case (id, p) => id -> p.map(_.toDouble / 1e6).toArray }
    def d2(x: Array[Double], y: Array[Double]) =
      math.sqrt(x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum)
    val ids = vecs.keys.toSeq.sorted.take(30)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      di = d2(vecs(ids(i)), vecs(ids(j))) if di > 1e-9
    } yield d2(projs(ids(i)), projs(ids(j))) / di
    val mean = ratios.sum / ratios.size
    // every pair's ratio within a loose band of the mean scale
    assert(ratios.forall(r => r > mean * 0.3 && r < mean * 2.2),
      s"JL ratios too dispersed: min=${ratios.min}, mean=$mean, max=${ratios.max}")
    // short/NULL vectors are dropped, not nulled through
    import spark.implicits._
    val short = Seq((1L, Array(0.5f, 1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.randomProjection(short, "vec_id", "embedding", 64, 16).count() === 0)
  }
}
