package graft

import org.apache.spark.sql.functions._

import graft.functions.Y4mSample

class Y4mSampleSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-build a y4m clip: C444 planes, one byte value per frame so
    * sums are trivially checkable.
    */
  private def clip(
      w: Int, h: Int, frameLuma: Seq[Int],
      colorTag: String = "C444",
      frameParams: String = ""): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $colorTag\n".getBytes("US-ASCII")
    val frames = frameLuma.flatMap { v =>
      s"FRAME$frameParams\n".getBytes("US-ASCII").toSeq ++
        Seq.fill(w * h)(v.toByte) ++ // Y plane
        Seq.fill(2 * w * h)(7.toByte) // U, V planes (ignored by the fold)
    }
    header ++ frames.toArray
  }

  private def sample(bytes: Array[Byte], step: Int) = {
    val r = Seq(Tuple1(bytes)).toDF("b")
      .select(Y4mSample(col("b"), step).as("d")).head()
    if (r.isNullAt(0)) None else Some(r.getStruct(0))
  }

  test("samples every step-th frame's luma plane; exact sums and peaks") {
    // 4 frames of 2x3 with luma 10, 20, 30, 40
    val c = clip(2, 3, Seq(10, 20, 30, 40))
    val d2 = sample(c, 2).get // frames 0, 2
    assert((d2.getInt(0), d2.getInt(1)) === ((2, 3)))
    assert((d2.getLong(2), d2.getLong(3)) === ((4L, 2L)))
    assert(d2.getLong(4) === 6L * (10 + 30))
    assert(d2.getInt(5) === 30)
    val d1 = sample(c, 1).get // all frames
    assert(d1.getLong(3) === 4L && d1.getLong(4) === 6L * 100 && d1.getInt(5) === 40)
    val d9 = sample(c, 9).get // just frame 0
    assert(d9.getLong(3) === 1L && d9.getLong(4) === 60L)
  }

  test("FRAME parameters and unknown header tags are skipped") {
    val c = clip(1, 1, Seq(99), frameParams = " Xinterlace")
    val d = sample(c, 1).get
    assert(d.getLong(4) === 99L && d.getInt(5) === 99)
  }

  test("C420 (subsampled), truncation, and junk decode to null by design") {
    assert(sample(clip(2, 2, Seq(5), colorTag = "C420"), 1).isEmpty)
    // header without any C tag: the y4m default is 4:2:0 — out of scope
    assert(sample("YUV4MPEG2 W2 H2\nFRAME\nxxxx".getBytes("US-ASCII"), 1).isEmpty)
    val good = clip(2, 2, Seq(5, 6))
    assert(sample(good.dropRight(1), 1).isEmpty) // truncated final frame
    assert(sample("not a clip".getBytes("UTF-8"), 1).isEmpty)
    assert(sample("YUV4MPEG2 W0 H2 C444\n".getBytes("US-ASCII"), 1).isEmpty)
    // garbage between frames (lost FRAME sync) is structural corruption
    val desynced = clip(1, 1, Seq(1)) ++ "JUNK".getBytes("US-ASCII")
    assert(sample(desynced, 1).isEmpty)
    val n = Seq(Tuple1(null: Array[Byte])).toDF("b")
      .select(Y4mSample(col("b"), 2)).head()
    assert(n.isNullAt(0))
  }

  test("map-only codegen'd plan; SQL registration") {
    val plan = graft.pipeline.Multimodal
      .mediaTableY4m(graft.core.Tables.documents(spark, sf("sf0.001")))
      .select(Y4mSample(col("payload"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Exchange"), plan)
    graft.functions.GraftExtensions.register(spark)
    Seq(Tuple1(clip(1, 1, Seq(50, 60)))).toDF("b").createOrReplaceTempView("__y4m")
    assert(spark.sql("SELECT y4m_sample(b, 1).y_sum FROM __y4m").head().getLong(0) === 110L)
  }
}
