package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{OracleParity, Tables}
import graft.query.{AggSpec, QueryEngine}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 on
  * the driver's parquet corpus; `oracleSql` holds the equivalent DuckDB SQL
  * so results are hash-compared. Column names and float handling follow
  * `graft.core.OracleParity`.
  */
object SparkEntry {

  /** Query window covering the events table (Jan 2024, epoch seconds). */
  private val Start = 1704067200L // 2024-01-01T00:00:00Z
  private val Stop  = 1706745600L // 2024-02-01T00:00:00Z

  /** Standard label map: streams grouped by user_id % 3 → g0/g1/g2
    * (explicit id lists, as NNTSC clients pass them; the oracle mirrors it
    * with a CASE expression — dbselect.py:615-630).
    */
  private def labelsFor(spark: SparkSession, dir: String): Map[String, Seq[Long]] =
    Tables
      .tsEvents(spark, dir)
      .select("stream_id")
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSeq
      .groupBy(id => s"g${id % 3}")
      .view
      .mapValues(_.sorted)
      .toMap

  /** DuckDB side of `labelsFor` + `Tables.tsEvents`. */
  private val OracleEvents =
    """SELECT CASE WHEN user_id % 3 = 0 THEN 'g0'
      |            WHEN user_id % 3 = 1 THEN 'g1'
      |            ELSE 'g2' END AS nntsclabel,
      |       user_id AS stream_id,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS "timestamp",
      |       event_id, event_type, value, props
      |FROM events""".stripMargin

  private def oracleEventsWindow: String =
    s"""SELECT * FROM ($OracleEvents) WHERE "timestamp" BETWEEN $Start AND $Stop"""

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_bins")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Queries
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- TPC-H-style analytics (bench headliners) --------------------
    "q1_pricing" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          OracleParity.decSum(col("l_quantity")).as("sum_qty"),
          OracleParity.decSum(col("l_extendedprice")).as("sum_base_price"),
          OracleParity.decOut(
            sum(OracleParity.dec(col("l_extendedprice")) *
              (OracleParity.dec(lit(1.0)) - OracleParity.dec(col("l_discount"))))
          ).as("sum_disc_price"),
          OracleParity.exactAvg(col("l_quantity")).as("avg_qty"),
          OracleParity.exactAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- NNTSC raw history: P1 projection + P2 time range + P3 streams
    //      + J1 broadcast label join (dbselect.py:390-532)
    "q_raw_select" -> ((s, dir) => {
      val labels = labelsFor(s, dir).view.filterKeys(Set("g0", "g1")).toMap
      // no rounding: raw passthrough doubles are bit-identical in both engines
      QueryEngine
        .selectData(
          Tables.tsEvents(s, dir), labels,
          Seq("event_id", "event_type", "value"),
          Start + 7 * 86400, Start + 14 * 86400)
        .orderBy("nntsclabel", "timestamp", "event_id")
    }),

    // ---- Binned aggregation: A1 std aggs + A8 binning + A9 bin
    //      timestamps + A10/A11 grouping & renaming (dbselect.py:208-387)
    "q_agg_bins" -> ((s, dir) => {
      val aggs = Seq(
        AggSpec("value", "avg"), AggSpec("value", "max"), AggSpec("value", "min"),
        AggSpec("value", "sum"), AggSpec("value", "count"), AggSpec("value", "stddev"))
      QueryEngine.selectAggregatedData(
        Tables.tsEvents(s, dir), labelsFor(s, dir), aggs,
        Start, Stop, binsize = 21600, parity = true)
    }),

    // ---- A2 `most` (mode) aggregation, deterministic tie-break
    "q_most" -> ((s, dir) => {
      QueryEngine.selectAggregatedData(
        Tables.tsEvents(s, dir), labelsFor(s, dir),
        Seq(AggSpec("value", "count"), AggSpec("event_type", "most")),
        Start, Stop, binsize = 7 * 86400)
    }),

    // ---- A4 `smoke` (ntile-20 sketch) + W1 ntile window
    "q_smoke" -> ((s, dir) => {
      QueryEngine.selectAggregatedData(
        Tables.tsEvents(s, dir), labelsFor(s, dir),
        Seq(AggSpec("value", "smoke"), AggSpec("value", "count")),
        Start, Stop, binsize = 7 * 86400, parity = true)
    }),

    // ---- A12 matrix (whole-period single bin) + A9 min_timestamp
    "q_matrix" -> ((s, dir) => {
      QueryEngine.selectMatrixData(
        Tables.tsEvents(s, dir), labelsFor(s, dir),
        Seq(
          AggSpec("value", "avg"), AggSpec("value", "max"),
          AggSpec("value", "count")),
        Start, Stop, parity = true)
    }),

    // ---- Exact dedup on documents: md5 grouping (LLM-pipeline op)
    "q_dedup_exact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy("canonical_id")
    })
  )

  // ---------------------------------------------------------------------
  // Oracles
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2) AS DOUBLE) AS sum_disc_price,
        |  (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity)) AS avg_qty,
        |  (CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount)) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_raw_select" -> {
      val lo = Start + 7 * 86400; val hi = Start + 14 * 86400
      s"""SELECT nntsclabel, "timestamp", stream_id, event_id, event_type, value
         |FROM ($OracleEvents)
         |WHERE "timestamp" BETWEEN $lo AND $hi AND nntsclabel IN ('g0','g1')
         |ORDER BY nntsclabel, "timestamp", event_id""".stripMargin
    },

    "q_agg_bins" -> {
      import OracleParity.Sql._
      s"""SELECT nntsclabel,
         |  "timestamp" - ("timestamp" % 21600) AS binstart,
         |  ${exactAvg("value")} AS value_avg,
         |  max(value) AS value_max,
         |  min(value) AS value_min,
         |  ${exactSum("value")} AS value_sum,
         |  count(value) AS value_count,
         |  ${exactStddev("value")} AS value_stddev,
         |  max("timestamp") AS "timestamp"
         |FROM ($oracleEventsWindow)
         |GROUP BY 1, 2
         |ORDER BY nntsclabel, binstart""".stripMargin
    },

    "q_most" ->
      s"""WITH b AS (
         |  SELECT nntsclabel, "timestamp" - ("timestamp" % ${7 * 86400}) AS binstart,
         |         "timestamp", event_type, value
         |  FROM ($oracleEventsWindow)
         |), base AS (
         |  SELECT nntsclabel, binstart, count(value) AS value,
         |         max("timestamp") AS "timestamp"
         |  FROM b GROUP BY 1, 2
         |), m AS (
         |  SELECT nntsclabel, binstart, event_type,
         |         row_number() OVER (PARTITION BY nntsclabel, binstart
         |                            ORDER BY count(*) DESC, event_type ASC) AS rn
         |  FROM b WHERE event_type IS NOT NULL GROUP BY 1, 2, 3
         |)
         |SELECT base.nntsclabel, base.binstart, base.value, base."timestamp",
         |       m.event_type
         |FROM base LEFT JOIN m
         |  ON base.nntsclabel = m.nntsclabel AND base.binstart = m.binstart AND m.rn = 1
         |ORDER BY base.nntsclabel, base.binstart""".stripMargin,

    "q_smoke" ->
      s"""WITH b AS (
         |  SELECT nntsclabel, "timestamp" - ("timestamp" % ${7 * 86400}) AS binstart,
         |         "timestamp", value
         |  FROM ($oracleEventsWindow)
         |), base AS (
         |  SELECT nntsclabel, binstart, count(value) AS value_count,
         |         max("timestamp") AS "timestamp"
         |  FROM b GROUP BY 1, 2
         |), t AS (
         |  SELECT nntsclabel, binstart, value,
         |         ntile(20) OVER (PARTITION BY nntsclabel, binstart ORDER BY value) AS bucket
         |  FROM b WHERE value IS NOT NULL
         |), ba AS (
         |  SELECT nntsclabel, binstart, bucket,
         |         ${OracleParity.Sql.exactAvg("value")} AS bavg
         |  FROM t GROUP BY 1, 2, 3
         |), sm AS (
         |  SELECT nntsclabel, binstart,
         |         list(bavg ORDER BY bucket) AS value_smoke
         |  FROM ba GROUP BY 1, 2
         |)
         |SELECT base.nntsclabel, base.binstart, sm.value_smoke, base.value_count,
         |       base."timestamp"
         |FROM base LEFT JOIN sm
         |  ON base.nntsclabel = sm.nntsclabel AND base.binstart = sm.binstart
         |ORDER BY base.nntsclabel, base.binstart""".stripMargin,

    "q_matrix" ->
      s"""SELECT nntsclabel, CAST($Start AS BIGINT) AS binstart,
         |  ${OracleParity.Sql.exactAvg("value")} AS value_avg,
         |  max(value) AS value_max,
         |  count(value) AS value_count,
         |  max("timestamp") AS "timestamp",
         |  min("timestamp") AS min_timestamp
         |FROM ($oracleEventsWindow)
         |GROUP BY 1
         |ORDER BY nntsclabel""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
        |       count(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY canonical_id""".stripMargin
  )
}
