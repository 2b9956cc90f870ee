package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Dual-collection routing (SURVEY hard part #5; amp_traceroute.py:
    * 120-153, 507-518): ONE streams table serves TWO collections —
    * amp-traceroute (IP results) and amp-astraceroute (AS results) share
    * stream ids. A result routes to the IP table when its `ip` flag is
    * missing/non-zero (old ampsave predates AS support → assume IP),
    * otherwise to the AS table when its `as` flag is set.
    */
  def routeDual(df: DataFrame): (DataFrame, DataFrame) = {
    val hasIpFlag = df.columns.contains("ip")
    val isIp = if (!hasIpFlag) lit(true) else col("ip").isNull || col("ip") =!= 0
    val isAs =
      if (!hasIpFlag) lit(false)
      else col("ip") === 0 && col("as").isNotNull && col("as") =!= 0
    (df.filter(isIp), df.filter(isAs))
  }

  /** Live-export routing (exporter.py:1430-1437): stream ids are shared
    * across both collections, so a subscriber to one must not receive the
    * other's rows — live frames carry a collection column and each
    * subscription filters on its own.
    */
  def liveForCollection(live: DataFrame, collectionCol: String, collection: String): DataFrame =
    live.filter(col(collectionCol) === collection)

  /** The AS-traceroute data-table reduction (amp_traceroute.py:408-478):
    * per (key, timestamp) —
    *   - addresses  = null-safe count of results with a real address
    *     (not 0.0.0.0/::)
    *   - errors     = null-safe count of results carrying error_type/code,
    *     floored at 0 once any real address was seen (the reference's
    *     `_add_maybe_none(errors, 0)` initialization)
    *   - the most frequent AS path wins and carries its
    *     aspath_length/uniqueas/responses; all NULL when no result had one.
    * Ties break deterministically (count desc, then RLE-string order); the
    * reference keeps first-observed (dict order) — documented deviation.
    *
    * Input: rows already through `extractAsPath`, plus address/error_type/
    * error_code/packet_size columns.
    */
  def asStreamReduce(df: DataFrame, keys: Seq[String]): DataFrame = {
    val goodAddr =
      col("address").isNotNull && col("address") =!= "0.0.0.0" && col("address") =!= "::"
    val errRow = col("error_type").isNotNull || col("error_code").isNotNull
    val base = df
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("packet_size")).as("packet_size"),
        sum(when(goodAddr, 1)).cast("int").as("addresses"),
        sum(when(errRow, 1)).cast("int").as("__errsum"))
      .withColumn(
        "errors",
        coalesce(col("__errsum"), when(col("addresses").isNotNull, lit(0))))
      .drop("__errsum")
    val counted = df
      .filter(col("aspath").isNotNull)
      .groupBy((keys.map(col) :+ col("aspath")): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        first(col("aspath_length")).as("aspath_length"),
        first(col("uniqueas")).as("uniqueas"),
        first(col("responses")).as("responses"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(desc("__cnt"), concat_ws(" ", col("aspath")).asc)
    val winner = counted
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(
        (keys.map(col) :+ col("aspath") :+ col("aspath_length") :+
          col("uniqueas") :+ col("responses")): _*)
    base.join(winner, keys, "left_outer")
  }
}
