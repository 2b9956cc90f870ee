package graft

/** Driver-contract smoke: `entry` must work on a session that did NOT set
  * the nanos conf (the driver builds its own session).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on a plain session") {
    val plain = spark.newSession() // fresh SQL conf; Tables sets nanosAsLong
    val rows = SparkEntry.entry(plain).count()
    assert(rows > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the intentional rows-only set: blob byte statistics are not
    // SQL-expressible — q_multimodal_features is instead parity-pinned to
    // the per-row form in MultimodalSpec. Everything else is hash-checked
    // (q_sketches through its tolerance-banded boolean oracle).
    assert(rowsOnly === Set("q_multimodal_features"))
    // and no oracle without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q_pipeline_clean evaluates the text profile once per document") {
    val plan = SparkEntry.queries("q_pipeline_clean")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val evals = "text_profile".r.findAllIn(plan).length
    // the aggregation barrier keeps PushDownPredicates from inlining the
    // profile into every filter/projection reference (was 101 evals/row)
    assert(evals <= 2, s"text_profile appears $evals times in the plan")
  }
}
