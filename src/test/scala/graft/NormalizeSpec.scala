package graft

import org.apache.spark.sql.functions._
import graft.ingest.Normalize

/** Golden-value tests mirroring the reference's parser unit tests
  * (/root/reference/tests/IcmpParser_test.py and friends): the ingest
  * normalization semantics the 13 parsers rely on.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("medianInt: odd/even counts, int truncation (common.py:252-262)") {
    val df = Seq(
      (1, 5), (1, 1), (1, 3),           // odd: sorted [1,3,5] → 3
      (2, 4), (2, 1),                    // even: (1+4)/2 = 2 (int-truncated)
      (3, 7))                            // single → 7
      .toDF("g", "v")
    val out = df.groupBy("g").agg(Normalize.medianInt(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out === Map(1 -> 3, 2 -> 2, 3 -> 7))
  }

  test("lost measurement semantics: lossrate 1.0, empty median (icmp golden)") {
    // mirrors IcmpParser_test.py lost-measurement case: rtts=[None] → no
    // median, loss=1, results=1, lossrate=1.0
    val df = Seq((1L, None: Option[Int], 1, 1)).toDF("sid", "rtt", "loss", "results")
    val out = df.groupBy("sid").agg(
      Normalize.medianInt(col("rtt")).as("median"),
      (sum("loss").cast("double") / sum("results")).as("lossrate"))
      .collect()(0)
    assert(out.isNullAt(out.fieldIndex("median")))
    assert(out.getAs[Double]("lossrate") === 1.0)
  }

  test("ipFamily classifies by dot presence (amp_icmp.py:109-112)") {
    val out = Seq("10.0.0.1", "2001:db8::1").toDF("a")
      .select(Normalize.ipFamily(col("a"))).as[String].collect()
    assert(out.toSeq === Seq("ipv4", "ipv6"))
  }

  test("safeRate guards zero/null denominators (amp_throughput.py:139-145)") {
    val df = Seq((100.0, Some(4L)), (100.0, Some(0L)), (100.0, None))
      .toDF("n", "d")
    val out = df.select(Normalize.safeRate(col("n"), col("d"))).collect()
    assert(out(0).getDouble(0) === 25.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("addMaybeNull (common.py:264-269)") {
    val df = Seq((Some(1), Some(2)), (None, Some(2)), (Some(1), None), (None, None))
      .toDF("a", "b")
    val out = df.select(Normalize.addMaybeNull(col("a"), col("b"))).collect()
    assert(out(0).getInt(0) === 3)
    assert(out(1).getInt(0) === 2)
    assert(out(2).getInt(0) === 1)
    assert(out(3).isNullAt(0))
  }

  test("rlePath run-length encodes AS paths (amp_traceroute.py:588-654)") {
    val df = Seq(Tuple1(Seq("1", "1", "7", "7", "7", "4"))).toDF("p")
    val out = df.select(Normalize.rlePath(col("p"))).as[Seq[String]].collect()(0)
    assert(out === Seq("2.1", "3.7", "1.4"))
  }

  test("uniqueAs counts distinct non-null ASNs") {
    val df = Seq(Tuple1(Seq(Some("1"), Some("1"), None, Some("4")))).toDF("p")
    val out = df.select(Normalize.uniqueAs(col("p"))).as[Int].collect()(0)
    assert(out === 2)
  }

  test("pathLength incomplete-path convention (amp_traceroute_pathlen.py:95-115)") {
    val df = Seq(
      Tuple1(Some(Seq(Some("a"), Some("b")))),            // complete → 2.0
      Tuple1(Some(Seq(Some("a"), None, None))),           // trailing nulls → 1.5
      Tuple1(Some(Seq.empty[Option[String]])),            // empty → 0.5
      Tuple1(None: Option[Seq[Option[String]]]))          // null → null
      .toDF("p")
    val out = df.select(Normalize.pathLength(col("p"))).collect()
    assert(out(0).getDouble(0) === 2.0)
    assert(out(1).getDouble(0) === 1.5)
    assert(out(2).getDouble(0) === 0.5)
    assert(out(3).isNullAt(0))
  }

  test("spreadPercentiles always yields 10 entries (amp_udpstream.py:179-204)") {
    val df = Seq(Tuple1(Seq(1, 2, 3, 4, 5))).toDF("p")
    val out = df.select(Normalize.spreadPercentiles(col("p"))).as[Seq[Integer]].collect()(0)
    assert(out.length === 10)
    assert(out === Seq(1, 1, 2, 2, 3, 3, 4, 4, 5, 5))
  }

  test("secondsToMillis rounds to 6dp (rrd_smokeping.py:112)") {
    val out = Seq(Tuple1(0.0123456789)).toDF("v")
      .select(Normalize.secondsToMillis(col("v"))).as[Double].collect()(0)
    assert(out === 12.345679)
  }
}
