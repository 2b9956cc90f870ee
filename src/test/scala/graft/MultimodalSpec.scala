package graft

import graft.core.Tables
import graft.pipeline.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sf("sf0.001")).limit(20))

  test("mediaTable: binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.count() === 20)
  }

  test("extractFeatures (decode stub) is deterministic and batched") {
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq)
    assert(f1.forall(f => f.n_bytes > 0 && f.byte_sum > 0))
  }

  test("resizeStub pools every payload to the same fixed shape") {
    val out = Multimodal.resizeStub(spark, media, 32).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Array[Byte]]("resized").length === 32))
    // deterministic: same input, same pooled bytes
    val again = Multimodal.resizeStub(spark, media, 32).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    out.foreach(r => assert(again(r.getLong(0)) === r.getAs[Array[Byte]](1).toSeq))
  }

  test("sampleBytes keeps every k-th byte") {
    val out = Multimodal.sampleBytes(spark, media, 4)
      .join(media, "media_id")
      .select("sampled", "payload")
      .collect()
    out.foreach { r =>
      val sampled = r.getAs[Array[Byte]](0)
      val full = r.getAs[Array[Byte]](1)
      assert(sampled.length === (full.length + 3) / 4)
      assert(sampled(0) === full(0))
    }
  }
}
