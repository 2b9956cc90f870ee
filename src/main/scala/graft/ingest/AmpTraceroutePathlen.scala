package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** amp-traceroute_pathlen ingest normalization — the per-batch reduction of
  * /root/reference/libnntsc/parsers/amp_traceroute_pathlen.py:61-157:
  * each result's hop path becomes a fractional "path length" (x.0 =
  * complete, x.5 = incomplete), and each (stream, timestamp) keeps the MODE
  * of the observed lengths.
  */
object AmpTraceroutePathlen {

  /** IP-path length adjustment (amp_traceroute_pathlen.py:95-112):
    *   - NULL path (test never ran)      → NULL
    *   - empty path                      → 0.5
    *   - trailing no-response hops       → length + 0.5 − #trailing NULLs
    *   - complete path                   → length + 0.0
    */
  def ipPathLength(path: Column, length: Column): Column = {
    val n = size(path)
    val idx = filter(sequence(lit(1), n), i => element_at(path, i).isNotNull)
    val lastReal = coalesce(array_max(idx), lit(0))
    when(path.isNull, lit(null).cast("double"))
      .when(n === 0, lit(0.5))
      .when(element_at(path, n).isNull, length + lit(0.5) - (n - lastReal))
      .otherwise(length.cast("double"))
  }

  /** AS-path variant (amp_traceroute_pathlen.py:123-132): the RLE aspath's
    * last segment containing "-" (a negative AS = trailing null hops) marks
    * the path incomplete; `responses` is already net of that trailing run.
    */
  def asResponsesLength(aspath: Column, responses: Column): Column =
    when(aspath.isNull, lit(null).cast("double"))
      .when(size(aspath) === 0, lit(0.5))
      .when(element_at(aspath, -1).contains("-"), responses + lit(0.5))
      .otherwise(responses.cast("double"))

  /** Per-(key) mode of the adjusted lengths (amp_traceroute_pathlen.py:
    * 141-157): highest count wins and NULL can win (a stream whose tests
    * all failed reports NULL). The reference breaks ties by dict insertion
    * order; here deterministically (count desc, then smaller length, NULLs
    * last) — same deviation class as A16, documented.
    * Output: key columns + path_length + count.
    */
  def reduce(df: DataFrame, keys: Seq[String], lengthCol: String): DataFrame = {
    val counted = df
      .groupBy((keys.map(col) :+ col(lengthCol).as("path_length")): _*)
      .agg(count(lit(1)).as("count"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc("count"), asc_nulls_last("path_length"))
    counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
