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

  test("every query has an oracle — the rows-only set is empty") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 7 closed the last rows-only entry: q_multimodal_features'
    // payload is a deterministic function of document fields, so its byte
    // statistics are recomputed in DuckDB from the reconstructed blob's
    // hex form (q_sketches likewise hashes through its tolerance-banded
    // boolean oracle). Every gate query is hash-checked.
    assert(rowsOnly === Set.empty[String])
    // and no oracle without a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("no gated query declares an unsortable (array/map/struct) column") {
    // schema-only sweep: building the frame analyzes the plan without
    // running it for most queries; the driver's comparator row-sorts raw
    // cells, so one complex-typed gate column = a guaranteed red row
    // (round 9: q_matrix_tier_smoke / q_agg_tier_bins)
    val offenders = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf("sf0.001")).schema
      Verify.unsortableCols(schema).map(c => s"$name.$c")
    }
    assert(offenders.isEmpty, s"unsortable gate columns: $offenders")
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
