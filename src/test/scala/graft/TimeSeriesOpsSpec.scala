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
