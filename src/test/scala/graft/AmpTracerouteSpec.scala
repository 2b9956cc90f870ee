package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ingest.AmpTraceroute

/** AS-path extraction semantics vs the reference
  * (amp_traceroute.py:588-654) + native DotProduct parity.
  */
class AmpTracerouteSpec extends SparkSpec {
  import spark.implicits._

  test("aspath extraction: RLE, uniqueas (>=0 only), trailing-null responses") {
    // hops: AS 1,1,7,-1,-1  → rle [2.1, 1.7, 2.-1], len 5, uniqueas {1,7}=2,
    // responses 5-2=3 (trailing -1 run removed)
    val df = Seq(Tuple1(Seq[Integer](1, 1, 7, -1, -1))).toDF("as_hops")
    val out = AmpTraceroute.extractAsPath(df, "as_hops").collect()(0)
    assert(out.getAs[Seq[String]]("aspath") === Seq("2.1", "1.7", "2.-1"))
    assert(out.getAs[Int]("aspath_length") === 5)
    assert(out.getAs[Int]("uniqueas") === 2)
    assert(out.getAs[Int]("responses") === 3)
  }

  test("aspath extraction: hops without AS info are skipped; all-null → NULLs") {
    val df = Seq(
      Tuple1(Seq[Integer](null, 5, null, 5)), // only AS hops count: [5,5]
      Tuple1(Seq[Integer](null, null)),       // no AS info at all
      Tuple1(Seq.empty[Integer]))             // untestable target
      .toDF("as_hops")
    val out = AmpTraceroute.extractAsPath(df, "as_hops").collect()
    assert(out(0).getAs[Seq[String]]("aspath") === Seq("2.5"))
    assert(out(0).getAs[Int]("responses") === 2)
    assert(out(1).isNullAt(out(1).fieldIndex("aspath")))
    assert(out(1).isNullAt(out(1).fieldIndex("uniqueas")))
    assert(out(2).isNullAt(out(2).fieldIndex("aspath")))
  }

  test("mostCommonPath picks the modal path per (stream, ts)") {
    val df = Seq(
      (1L, 100L, 10), (1L, 100L, 10), (1L, 100L, 20),
      (2L, 100L, 30))
      .toDF("stream_id", "timestamp", "path_id")
    val out = AmpTraceroute.mostCommonPath(df, "path_id")
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(out === Map(1L -> 10, 2L -> 30))
  }

  test("native DotProduct matches the interpreted fold bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)))
      .toDF("a", "b")
    val interpreted = df.select(
      aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val native = df.select(VectorOps.dot(col("a"), col("b"))).as[Double].collect()
    assert(native.toSeq === interpreted.toSeq) // exact, not approximate
    assert(native(0) === (1.5f.toDouble * 0.5f + (-2.25f).toDouble * 4.0f + 3.125f.toDouble * -1.75f))
  }
}
