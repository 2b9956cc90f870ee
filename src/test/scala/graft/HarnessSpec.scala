package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round-8 lesson, pinned: a deliberately broken query must surface as
  * a VISIBLE error in every harness artifact — never as a missing row
  * (Verify used to silently skip the dump) or a fast success (Bench's
  * catch-all recorded analysis-time deaths as 0.06s lines).
  */
class HarnessSpec extends SparkSpec {

  private val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ok" -> ((s, dir) => core.Tables.region(s, dir).select("r_regionkey", "r_name")),
    "q_broken" -> ((s, _) => s.read.parquet("/nonexistent/graft_broken.parquet")))

  test("Verify: broken query leaves _ERROR.txt marker + errors.json entry") {
    val out = Files.createTempDirectory("graft_harness").toString
    val errors = Verify.dump(spark, sf("sf0.001"), out, queries = queries)

    assert(errors.keySet === Set("q_broken"))
    // the good query still dumps normally
    assert(new java.io.File(s"$out/q_ok").listFiles.exists(_.getName.endsWith(".parquet")))
    // the broken one leaves a marker dir that cannot be read as parquet —
    // the driver's compare records an `err` row instead of losing the entry
    val marker = Paths.get(s"$out/q_broken/_ERROR.txt")
    assert(Files.exists(marker))
    assert(Files.readString(marker).contains("graft_broken"))
    val sidecar = Files.readString(Paths.get(s"$out/errors.json"))
    assert(sidecar.contains("\"q_broken\""))
    assert(!sidecar.contains("q_ok"))
  }

  test("Bench: broken query lands in the errors map, not the timings") {
    val (results, errors) = Bench.run(spark, sf("sf0.001"), queries.toSeq.sortBy(_._1))

    assert(results.map(_._1) === Seq("q_ok"))
    assert(errors.keySet === Set("q_broken"))
    val json = Bench.renderJson(results, errors, sf("sf0.001"))
    // one parseable line carrying both the timing and the failure
    assert(json.contains("\"q_ok\":") && !json.contains("\"q_broken\":" + "0"))
    assert(json.contains("\"errors\":{\"q_broken\""))
  }
}
