package graft

import graft.query.Frequency

/** Synthetic timestamp patterns driving each branch of the reference's
  * frequency decision ladder (exporter.py:736-843).
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def binned(label: String, rows: Seq[(Long, Long)]) =
    rows.map { case (b, t) => (label, b, t) }.toDF("nntsclabel", "binstart", "timestamp")

  test("perfect bins → requested binsize") {
    // bins advance by exactly 60 every row → >90% perfect
    val rows = (0 until 50).map(i => (i * 60L, i * 60L + 5))
    val out = Frequency.infer(binned("a", rows), 60).collect()(0)
    assert(out.getAs[Long]("freq") === 60L)
  }

  test("strong mode of timestamp diffs when bins are sparse") {
    // measurement every 300 s but binsize 60 → bindiff 300 ≠ 60, mode 300
    val rows = (0 until 50).map(i => (i * 300L, i * 300L + 1))
    val out = Frequency.infer(binned("a", rows), 60).collect()(0)
    assert(out.getAs[Long]("freq") === 300L)
  }

  test("no strong mode → smallest diff with >=20% support") {
    // alternating diffs 100,100,100,200,300,... crafted so no diff >= 50%
    val ts = Seq(0L, 100L, 300L, 600L, 700L, 1000L, 1400L, 1500L, 1900L, 2400L)
    // diffs: 100,200,300,100,300,400,100,400,500 → 100:3/9 (33%), others <50%
    val rows = ts.map(t => (t, t))
    val out = Frequency.infer(binned("a", rows), 60).collect()(0)
    assert(out.getAs[Long]("freq") === 100L)
  }

  test("no prominent diff → rounded mean ladder") {
    // all diffs distinct (support 1/9 < 20%), mean ~ 207 → snaps to 180? :
    // mean of 150,160,170,...,230 = 190 → (190+30)//60*60 = 180
    val ds = Seq(150L, 160L, 170L, 180L, 190L, 200L, 210L, 220L, 230L)
    val ts = ds.scanLeft(0L)(_ + _)
    val out = Frequency.infer(binned("a", ts.map(t => (t, t))), 60).collect()(0)
    assert(out.getAs[Long]("freq") === 180L)
  }

  test("no diffs at all → 300 fallback when binsize nonzero") {
    val out = Frequency.infer(binned("a", Seq((0L, 0L))), 60).collect()(0)
    assert(out.getAs[Long]("freq") === 300L)
  }

  test("inferLocal (driver-side serve path) matches the distributed infer") {
    // every decision-tree branch + duplicate-timestamp and cap behavior
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      (0 until 50).map(i => (i * 60L, i * 60L + 5)),           // perfect bins
      (0 until 50).map(i => (i * 300L, i * 300L + 1)),         // strong mode
      Seq(0L, 100L, 300L, 600L, 700L, 1000L, 1400L, 1500L, 1900L, 2400L)
        .map(t => (t, t)),                                     // prominent
      Seq(150L, 160L, 170L, 180L, 190L, 200L, 210L, 220L, 230L)
        .scanLeft(0L)(_ + _).map(t => (t, t)),                 // mean ladder
      Seq((0L, 0L)),                                           // no diffs
      Seq((0L, 0L), (0L, 0L), (60L, 60L), (60L, 60L), (120L, 120L)), // dups
      (0 until 400).map(i => (i * 60L, i * 60L + 7)))          // beyond cap
    cases.zipWithIndex.foreach { case (rows, i) =>
      val dist = Frequency.infer(binned("a", rows), 60)
        .collect()(0).getAs[Long]("freq")
      val local = Frequency.inferLocal(rows, 60)
      assert(local === dist, s"case $i")
    }
  }

  test("rounding ladder boundaries") {
    val df = Seq(5.0, 37.0, 140.0, 2000.0, 7300.0).toDF("mean")
    val out = df.select(Frequency.roundFrequency(org.apache.spark.sql.functions.col("mean")))
      .as[Long].collect().toSeq
    // ≤10→10; 37→(37+5)//10*10=40; 140→(140+30)//60*60=120;
    // 2000→(2000+150)//300*300=2100; 7300→(7300+1800)//3600*3600=7200
    assert(out === Seq(10L, 40L, 120L, 2100L, 7200L))
  }
}
