package graft

import graft.core.Tables
import graft.pipeline.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))
  private lazy val model = Pq.pqTrain(emb, "vec_id", "embedding")

  test("pqTrain: shape, determinism, codes in range") {
    assert(model.m === 16)
    assert(model.subDim === 4)
    assert(model.codebooks.forall(_.length === model.ks))
    // retraining from the same frame reproduces the exact matrices
    val again = Pq.pqTrain(emb, "vec_id", "embedding")
    assert(again.codebooks === model.codebooks)

    val codes = Pq.pqEncode(emb, "vec_id", "embedding", model)
      .select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < model.ks))
  }

  test("reconstruction beats shuffled-code reconstruction (codes carry signal)") {
    val enc = emb.select(
      col("vec_id"), col("embedding"),
      Pq.encodeCol(col("embedding"), model).as("codes"))
    val meanCos = enc
      .select(avg(Similarity.cosine(
        col("embedding"),
        Pq.reconstructCol(col("codes"), model).cast("array<double>"))))
      .as[Double].head()
    // reversing the code array decodes each block with another block's
    // codebook entry — a structure-destroying baseline
    val meanCosShuffled = enc
      .select(avg(Similarity.cosine(
        col("embedding"),
        Pq.reconstructCol(reverse(col("codes")), model).cast("array<double>"))))
      .as[Double].head()
    assert(meanCos > 0.3, s"reconstruction cosine too low: $meanCos")
    assert(meanCos > meanCosShuffled + 0.2,
      s"codes carry no signal: $meanCos vs shuffled $meanCosShuffled")
  }

  test("ADC sim equals cosine against the reconstruction (same quantity, LUT-summed)") {
    val queries = (0L until 5L)
    val adc = Pq.pqTopKWith(emb, model, "vec_id", "embedding", queries, 500)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim"))
      .toMap
    // direct form: cosine(query vector, reconstructed corpus vector)
    val enc = emb.select(
      col("vec_id").as("neighbor_id"),
      Pq.reconstructCol(Pq.encodeCol(col("embedding"), model), model)
        .cast("array<double>").as("__vb"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("__va"))
    val direct = enc.join(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__va"), col("__vb")).as("sim"))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim"))
      .toMap
    assert(adc.keySet === direct.keySet)
    // the gate output rounds to the 6dp grid and the LUT association
    // differs from the flat 64-dim fold, so equality is numeric within
    // the grid — the ORACLE parity is LUT-vs-LUT and exact
    adc.foreach { case (k, s) =>
      assert(math.abs(s - direct(k)) < 2e-6, s"$k: adc $s vs direct ${direct(k)}")
    }
  }

  test("PQ ANN recall vs brute force on real embeddings") {
    val queries = (0L until 20L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Pq.pqTopKWith(emb, model, "vec_id", "embedding", queries, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 16-byte codes against 256-byte vectors; random synthetic embeddings
    // are the hard case for quantization — demand a nontrivial floor and
    // report the measured value
    assert(recall >= 0.3, s"PQ recall too low: $recall")
    info(s"PQ recall@5 on sf0.001: $recall")
  }

  test("more Lloyd iterations do not hurt reconstruction (training converges)") {
    val m0 = Pq.pqTrain(emb, "vec_id", "embedding", lloydIters = 0)
    def meanCos(mm: Pq.PqModel): Double = emb
      .select(avg(Similarity.cosine(
        col("embedding"),
        Pq.reconstructCol(Pq.encodeCol(col("embedding"), mm), mm).cast("array<double>"))))
      .as[Double].head()
    val c0 = meanCos(m0)
    val c2 = meanCos(model)
    assert(c2 >= c0 - 1e-9, s"Lloyd training degraded reconstruction: $c0 -> $c2")
  }
}
