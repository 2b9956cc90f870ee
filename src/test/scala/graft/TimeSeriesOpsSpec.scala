package graft

import org.apache.spark.sql.functions._

import graft.query.TimeSeriesOps

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "a"), (1L, 25L, "b"), (1L, 30L, "c"),
    (2L, 15L, "d"))
    .toDF("stream_id", "timestamp", "tag")
  private lazy val right = Seq(
    (1L, 5L, 100.0), (1L, 25L, 200.0), (1L, 40L, 300.0),
    (3L, 1L, 999.0))
    .toDF("stream_id", "timestamp", "price")

  test("asof join: latest right row at or before each left row") {
    val out = TimeSeriesOps.asofJoin(
        left, right, Seq("stream_id"), "timestamp", Seq("price"))
      .orderBy("stream_id", "timestamp")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 10L, 5L, 100.0),   // 10 → right@5
      (1L, 25L, 25L, 200.0),  // inclusive: 25 → right@25
      (1L, 30L, 25L, 200.0))) // 30 → right@25 (40 is in the future)
    // stream 2 has no right rows → dropped (inner)
  }

  test("native physical asof join matches the window composition exactly") {
    for (outer <- Seq(false, true)) {
      val composed = TimeSeriesOps.asofJoin(
          left, right, Seq("stream_id"), "timestamp", Seq("price"), leftOuter = outer)
        .orderBy("stream_id", "timestamp").collect().map(_.toSeq).toSeq
      val native = TimeSeriesOps.asofJoinNative(
          left, right, Seq("stream_id"), "timestamp", Seq("price"), leftOuter = outer)
        .orderBy("stream_id", "timestamp").collect().map(_.toSeq).toSeq
      assert(native === composed, s"leftOuter=$outer")
    }
    // schema parity too
    assert(
      TimeSeriesOps.asofJoinNative(left, right, Seq("stream_id"), "timestamp", Seq("price"))
        .columns.toSeq ===
        TimeSeriesOps.asofJoin(left, right, Seq("stream_id"), "timestamp", Seq("price"))
          .columns.toSeq)
  }

  test("native asof join plans a merge, not a union window") {
    val plan = TimeSeriesOps.asofJoinNative(
      left, right, Seq("stream_id"), "timestamp", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // AsOfJoinExec renders as AsOfJoin
    assert(!plan.contains("Window"), plan)
  }

  test("filters push through the custom as-of node (left + key-mapped right)") {
    val joined = TimeSeriesOps.asofJoinNative(
      left, right, Seq("stream_id"), "timestamp", Seq("price"))
    // key predicate + left-only predicate + a produced-column predicate
    val q = joined
      .filter(col("stream_id") === 1L)
      .filter(col("tag") =!= "zzz")
      .filter(col("asof_price") > 0)
    val opt = q.queryExecution.optimizedPlan
    val ajNode = opt.collect { case n: graft.plans.AsOfJoinNode => n }.head
    // pushed below the join on BOTH children (key predicate maps to right)
    assert(ajNode.left.toString.contains("stream_id"), ajNode.left.toString)
    assert(
      ajNode.right.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.exists(_.condition.toString.contains("stream_id")),
      ajNode.right.toString)
    // the asof_* predicate stays above the join
    assert(opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("asof_price") => f
    }.nonEmpty)
    // and results match the unoptimizable composition under the same filters
    val expected = TimeSeriesOps.asofJoin(
        left, right, Seq("stream_id"), "timestamp", Seq("price"))
      .filter(col("stream_id") === 1L && col("tag") =!= "zzz" && col("asof_price") > 0)
      .orderBy("timestamp").collect().map(_.toSeq).toSeq
    assert(q.orderBy("timestamp").collect().map(_.toSeq).toSeq === expected)
  }

  test("rollingZScore flags a spike against its trailing baseline only") {
    // stream 1: gentle alternation 10.0/10.2 (small but NONZERO baseline
    // variance — a perfectly flat window is var=0 and filtered by the
    // degenerate-variance guard) with one spike to 100 at t=30;
    // stream 2: wild alternation, so the same magnitude is normal
    val rows =
      (0L until 40L).map(t =>
        (1L, t, t, if (t == 30) 100.0 else 10.0 + (t % 2) * 0.2)) ++
        (0L until 40L).map(t => (2L, t, t, if (t % 2 == 0) 10.0 else 100.0))
    val df = rows.toDF("stream_id", "timestamp", "event_id", "value")
    val out = TimeSeriesOps.rollingZScore(
        df, "stream_id", "timestamp", "event_id", "value",
        windowRows = 10, minN = 5, threshold = 2.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // stream 1: exactly the spike row flags (rows after it carry the
    // spike in their baseline -> stddev inflated ~28× -> |z| << 2.5)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq === Seq(30L))
    assert(out.find(_._1 == 1L).get._3 > 2.5)
    // stream 2's alternation is its own baseline: nothing flagged
    assert(!out.exists(_._1 == 2L))
    // zero-variance degenerate windows never divide by zero: an all-flat
    // stream produces no output at all
    val flat = (0L until 40L).map(t => (3L, t, t, 5.0))
      .toDF("stream_id", "timestamp", "event_id", "value")
    assert(TimeSeriesOps.rollingZScore(
      flat, "stream_id", "timestamp", "event_id", "value",
      windowRows = 10, minN = 5, threshold = 2.5).count() === 0)
  }

  test("cusum prefix-scan equals the sequential recursion, alarms on shifts") {
    // series with a level shift at t=20: baseline ~5, shifted ~15
    val rows = (0L until 40L).map { t =>
      val v = if (t < 20) 5.0 + (t % 3) else 15.0 + (t % 3)
      (1L, t, t, v)
    }
    val df = rows.toDF("stream_id", "timestamp", "event_id", "value")
    val k = 8.0; val h = 20.0; val quant = 1e3
    val got = TimeSeriesOps.cusum(
        df, "stream_id", "timestamp", "event_id", "value", k, h, quant)
      .orderBy("timestamp")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // driver-side sequential recursion g_t = max(0, g_{t-1} + (x - k))
    // over the SAME quantized integers
    var g = 0L
    val expect = scala.collection.mutable.Map.empty[Long, Double]
    rows.foreach { case (_, t, _, v) =>
      val q = math.floor(v * quant + 0.5).toLong
      g = math.max(0L, g + (q - math.floor(k * quant + 0.5).toLong))
      if (g >= math.floor(h * quant + 0.5).toLong) expect(t) = g / quant
    }
    assert(got === expect.toMap)
    // the shift is detected shortly after t=20 and never before
    assert(expect.keys.min >= 20L && expect.nonEmpty)
  }

  test("plateaus: maximal runs only, boundaries exact, sub-minRun dropped") {
    val rows = Seq(
      // stream 1: runs [2..4] (len 3), [7] (len 1, dropped), [9..10] (len 2)
      (1L, 0L, 0L, 1.0), (1L, 1L, 1L, 2.0), (1L, 2L, 2L, 9.0),
      (1L, 3L, 3L, 8.5), (1L, 4L, 4L, 7.0), (1L, 5L, 5L, 1.0),
      (1L, 6L, 6L, 2.0), (1L, 7L, 7L, 9.9), (1L, 8L, 8L, 0.5),
      (1L, 9L, 9L, 7.5), (1L, 10L, 10L, 8.0),
      // stream 2: everything below level
      (2L, 0L, 0L, 1.0), (2L, 1L, 1L, 2.0))
      .toDF("stream_id", "timestamp", "event_id", "value")
    val got = TimeSeriesOps.plateaus(
        rows, "stream_id", "timestamp", "event_id", "value",
        level = 7.0, minRun = 2)
      .orderBy("stream_id", "t_start")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 4L, 3L, 9.0),
      (1L, 9L, 10L, 2L, 8.0)))
  }

  test("asof left-outer keeps unmatched left rows with NULLs") {
    val out = TimeSeriesOps.asofJoin(
        left, right, Seq("stream_id"), "timestamp", Seq("price"), leftOuter = true)
      .orderBy("stream_id", "timestamp").collect()
    assert(out.length === 4)
    val s2 = out.find(_.getLong(0) == 2L).get
    assert(s2.isNullAt(s2.fieldIndex("asof_timestamp")))
    assert(s2.isNullAt(s2.fieldIndex("asof_price")))
  }
}
