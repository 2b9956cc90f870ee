package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.query.QueryEngine

/** amp-traceroute ingest normalization (SURVEY §2.4 A16-A17) — the
  * per-result AS-path extraction of
  * /root/reference/libnntsc/parsers/amp_traceroute.py:588-654 and the
  * per-interval most-common-path reduction (:457-478).
  *
  * Hop AS values: an integer per hop; -1 marks a "null hop" (no response /
  * failed lookup); a missing AS (null) means the hop carries no AS info at
  * all and is skipped entirely.
  */
object AmpTraceroute {

  /** Hops that carry AS info (the reference's `'as' in x` guard). */
  private def withAs(asHops: Column): Column = filter(asHops, a => a.isNotNull)

  /** RLE "count.asn" encoding over the AS hops (amp_traceroute.py:605-634). */
  def aspathRle(asHops: Column): Column = Normalize.rlePath(withAs(asHops))

  /** Hops that answered with AS info (aspathlen, :635). */
  def aspathLen(asHops: Column): Column = size(withAs(asHops))

  /** Distinct real AS numbers — null hops (-1) excluded (:624-627). */
  def uniqueAs(asHops: Column): Column =
    size(array_distinct(filter(asHops, a => a.isNotNull && a >= 0)))

  /** Responses = AS hops minus a trailing null-hop (-1) run (:637-641). */
  def responses(asHops: Column): Column = {
    val hops = withAs(asHops)
    val n = size(hops)
    // length of the trailing run of -1s: first index from the end whose
    // value isn't -1
    val nonNullIdx = filter(sequence(lit(1), n), i => element_at(hops, i) =!= -1)
    val lastReal = coalesce(array_max(nonNullIdx), lit(0))
    val trailing = when(element_at(hops, n) === -1, n - lastReal).otherwise(0)
    n - trailing
  }

  /** Full extraction: rows with an `as_hops` array column gain
    * aspath/aspath_length/uniqueas/responses (all NULL when no hop carried
    * AS info, :646-654).
    */
  def extractAsPath(df: DataFrame, asHopsCol: String): DataFrame = {
    val hops = col(asHopsCol)
    val empty = size(withAs(hops)) === 0 || hops.isNull
    df.withColumn("aspath", when(empty, lit(null)).otherwise(aspathRle(hops)))
      .withColumn("aspath_length", when(empty, lit(null)).otherwise(aspathLen(hops)))
      .withColumn("uniqueas", when(empty, lit(null)).otherwise(uniqueAs(hops)))
      .withColumn("responses", when(empty, lit(null)).otherwise(responses(hops)))
  }

  /** A16: per-(stream, timestamp) reduction keeping the most frequent AS
    * path (ties → smallest path id; the reference keeps first-observed,
    * which is batch-order dependent — documented deviation).
    */
  def mostCommonPath(data: DataFrame, pathIdCol: String): DataFrame =
    QueryEngine.mostByGroup(
      data.filter(col(pathIdCol).isNotNull),
      Seq("stream_id", "timestamp"),
      pathIdCol,
      pathIdCol + "_most")
}
