package graft

import graft.ingest.Normalizers

class NormalizersSpec extends SparkSpec {
  import spark.implicits._

  test("throughput rate guard (amp_throughput.py:139-145)") {
    val df = Seq(
      (1000L, Some(4)), (1000L, Some(0)), (1000L, None))
      .toDF("bytes", "runtime")
    val out = Normalizers.throughput(df).collect()
    assert(out(0).getDouble(2) === 250.0)
    assert(out(1).getDouble(2) === 0.0)
    assert(out(2).isNullAt(2))
  }

  test("fastping median = percentiles[8], lossrate from samples") {
    val df = Seq(
      (Some(Seq(1, 2, 3, 4, 5, 6, 7, 8, 99, 10)), Some(90L), 100L),
      (None: Option[Seq[Int]], None: Option[Long], 100L))
      .toDF("percentiles", "samples", "packet_count")
    val out = Normalizers.fastping(df).collect()
    assert(out(0).getAs[Int]("median") === 99)
    assert(out(0).getAs[Double]("lossrate") === (1.0 - 90.0 / 100))
    assert(out(1).isNullAt(out(1).fieldIndex("median")))
    assert(out(1).isNullAt(out(1).fieldIndex("lossrate")))
  }

  test("smokeping ms conversion + pingsent + lossrate (rrd_smokeping.py:99-130)") {
    val df = Seq(
      (0.0123456789, Seq(0.001, 0.002), Some(1)),
      (0.5, Seq.empty[Double], Some(0)))
      .toDF("median_s", "pings_s", "loss")
    val out = Normalizers.smokeping(df).collect()
    assert(out(0).getAs[Double]("median") === 12.345679)
    assert(out(0).getAs[Seq[Double]]("pings") === Seq(1.0, 2.0))
    assert(out(0).getAs[Int]("pingsent") === 2)
    assert(out(0).getAs[Double]("lossrate") === 0.5)
    assert(out(1).isNullAt(out(1).fieldIndex("lossrate"))) // sent == 0
  }

  test("udpstream percentile spreading fills 10 columns") {
    val df = Seq(Tuple1(Seq(10, 20, 30, 40, 50))).toDF("percentiles")
    val out = Normalizers.udpstream(df).collect()(0)
    assert(out.getAs[Int]("jitter_percentile_10") === 10)
    assert(out.getAs[Int]("jitter_percentile_50") === 30)
    assert(out.getAs[Int]("jitter_percentile_100") === 50)
  }

  test("dns lossrate from requests/responses") {
    val df = Seq((Some(4L), Some(3L)), (Some(0L), Some(0L)), (None, Some(1L)))
      .toDF("requests", "responses")
    val out = Normalizers.dns(df).collect()
    assert(out(0).getAs[Double]("lossrate") === 0.25)
    assert(out(1).isNullAt(out(1).fieldIndex("lossrate")))
    assert(out(2).isNullAt(out(2).fieldIndex("lossrate")))
  }
}
