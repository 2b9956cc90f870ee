package graft

import graft.core.Tables
import graft.pipeline.Similarity

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covarianceStats matches a driver-side brute force on exact quantized ints") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, -0.5f)),
      (1L, Array(0.5f, -1.0f, 2.5f)),
      (2L, Array(-1.5f, 0.25f, 0.75f)),
      (3L, Array(2.0f, 1.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val q = 1e6
    val st = Similarity.covarianceStats(vecs, "embedding", 3, q)
    // brute force over the SAME quantization
    val raw = Seq(
      Array(1.0f, 2.0f, -0.5f), Array(0.5f, -1.0f, 2.5f),
      Array(-1.5f, 0.25f, 0.75f), Array(2.0f, 1.0f, -2.0f))
      .map(_.map(x => Math.floor(x.toDouble * q + 0.5).toLong))
    assert(st.n === 4L)
    for (i <- 0 until 3) assert(st.sums(i) === raw.map(_(i)).sum)
    for (i <- 0 until 3; j <- i until 3) {
      val pij = raw.map(v => v(i) * v(j)).sum
      val expected = (pij.toDouble -
        raw.map(_(i)).sum.toDouble * raw.map(_(j)).sum.toDouble / 4.0) / 3.0 / (q * q)
      assert(st.cov(i, j) === expected)
      assert(st.cov(j, i) === st.cov(i, j)) // symmetric accessor
    }
    // mean accessor
    for (i <- 0 until 3)
      assert(st.mean(i) === raw.map(_(i)).sum.toDouble / 4.0 / q)
  }

  test("jacobiEigen: orthonormal, reconstructs, descending, deterministic sign") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val st = Similarity.covarianceStats(emb, "embedding", 64)
    val m = st.covMatrix
    val (values, vectors) = Similarity.jacobiEigen(m)
    val d = 64
    // descending eigenvalues; covariance is PSD so none materially negative
    assert(values.zip(values.tail).forall { case (a, b) => a >= b })
    assert(values.last > -1e-9)
    // orthonormality: VᵀV = I
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vectors(a)(k) * vectors(b)(k)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"VtV($a,$b) = $dot")
    }
    // reconstruction: Σ λ_k v_k v_kᵀ = C
    for (i <- 0 until d; j <- i until d) {
      val rec = (0 until d).map(k => values(k) * vectors(k)(i) * vectors(k)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-9, s"recon($i,$j)")
    }
    // sign convention: the largest-|entry| of every vector is positive
    vectors.foreach { v =>
      val mx = v.indices.maxBy(r => (math.abs(v(r)), -r))
      assert(v(mx) > 0)
    }
    // trace preserved: Σλ = Σ C_ii
    val trC = (0 until d).map(i => m(i)(i)).sum
    assert(math.abs(values.sum - trC) < 1e-9)
    // deterministic across runs
    val (v2, w2) = Similarity.jacobiEigen(st.covMatrix)
    assert(v2.toSeq === values.toSeq)
    assert(w2.map(_.toSeq).toSeq === vectors.map(_.toSeq).toSeq)
  }

  test("pcaProject: map-only projection with the model's variance ordering") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val model = Similarity.pcaTrain(emb, "embedding", 64, r = 4)
    assert(model.components.length === 4 && model.eigenvalues.length === 4)
    val proj = Similarity.pcaProject(emb, "embedding", model)
    assert(proj.columns.takeRight(4).toSeq === Seq("pc_1", "pc_2", "pc_3", "pc_4"))
    // the sample variance of pc_k equals the k-th eigenvalue (float-level
    // tolerance: the projection runs on raw floats, the model on the
    // quantized covariance)
    val rows = proj.select("pc_1", "pc_2", "pc_3", "pc_4").collect()
    val n = rows.length
    for (k <- 0 until 4) {
      val xs = rows.map(_.getDouble(k))
      val mu = xs.sum / n
      val varK = xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
      assert(math.abs(varK - model.eigenvalues(k)) < 1e-4,
        s"var(pc_${k + 1}) = $varK vs λ = ${model.eigenvalues(k)}")
    }
    // map-only: no exchange in the projection plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must not shuffle")
  }

  test("pcaProjectQuantized: exact-integer twin tracks the double projection") {
    import org.apache.spark.sql.functions.{col, element_at}
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val model = Similarity.pcaTrain(emb, "embedding", 64, r = 4)
    val compQ = Similarity.quantizeComponents(model.components)
    val q = Similarity.pcaProjectQuantized(emb, "vec_id", "embedding", compQ)
      .select(col("vec_id") +:
        (0 until 4).map(j => element_at(col("proj"), j + 1).as(s"q_${j + 1}")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    // the double projection, UNCENTERED to match (add back mu·c_j)
    val d = Similarity.pcaProject(emb, "embedding", model)
    val rows = d.select(col("vec_id") +:
        (0 until 4).map(j => col(s"pc_${j + 1}")): _*)
      .collect()
    val muDot = model.components.map(c =>
      c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum)
    val scale = 1e6 * 1e9
    rows.foreach { r =>
      val id = r.getLong(0)
      for (k <- 0 until 4) {
        val uncentered = r.getDouble(k + 1) + muDot(k)
        val approx = q(id)(k).toDouble / scale
        // per-term quantization error ≤ (0.5/1e6)·Σ|w| + (0.5/1e9)·Σ|q| — generous bound
        assert(math.abs(uncentered - approx) < 1e-4,
          s"vec $id pc_${k + 1}: double $uncentered vs quantized $approx")
      }
    }
    // deterministic and map-only
    val plan = Similarity.pcaProjectQuantized(emb, "vec_id", "embedding", compQ)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "quantized projection must not shuffle")
  }
}
