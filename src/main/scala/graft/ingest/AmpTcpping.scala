package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** amp-tcpping ingest normalization — the per-batch, per-stream reduction
  * of /root/reference/libnntsc/parsers/amp_tcpping.py (an AmpIcmpParser
  * subclass: same median/loss machinery, plus a port stream column and an
  * ICMP-error counter):
  *
  *   - stream key adds `port` (amp_tcpping.py:45-56, 92-127)
  *   - icmperrors = null-safe sum of int(bool(icmptype)) — counts non-zero
  *     ICMP types, stays NULL when no result carried one (:139-143)
  *   - rtts = sorted non-null RTTs, padded with `loss` NULLs then
  *     `icmperrors` NULLs AFTER the median is taken (:159-168)
  *   - median / results / lossrate exactly as icmp (:152-173)
  */
object AmpTcpping {

  /** batch columns: source, target, address, rtt, loss, random, packet_size,
    * port, icmptype, timestamp. Output: one row per (stream key, timestamp).
    */
  def normalize(batch: DataFrame): DataFrame = {
    val truthy = (c: String) => col(c).isNotNull && col(c) =!= 0
    batch
      .withColumn("destination", col("target"))
      .withColumn("family", Normalize.ipFamily(col("address")))
      .withColumn("port_key", col("port").cast("string"))
      .withColumn(
        "packet_size_key",
        when(col("random"), lit("random")).otherwise(col("packet_size").cast("string")))
      .groupBy("source", "destination", "port_key", "family", "packet_size_key", "timestamp")
      .agg(
        sum(col("loss")).cast("int").as("loss"),
        sort_array(collect_list(col("rtt"))).as("__rtts"),
        Normalize.medianInt(col("rtt")).as("median"),
        sum(when(truthy("rtt") || truthy("loss"), 1)).cast("int").as("results"),
        sum(when(col("icmptype").isNotNull, when(col("icmptype") =!= 0, 1).otherwise(0)))
          .cast("int").as("icmperrors"),
        first(col("packet_size")).as("packet_size"))
      .withColumn(
        "__padded",
        when(
          col("loss").isNotNull && col("loss") > 0,
          concat(col("__rtts"), array_repeat(lit(null).cast("int"), col("loss"))))
          .otherwise(col("__rtts")))
      .withColumn(
        "rtts",
        when(
          col("icmperrors").isNotNull && col("icmperrors") > 0,
          concat(col("__padded"), array_repeat(lit(null).cast("int"), col("icmperrors"))))
          .otherwise(col("__padded")))
      .withColumn(
        "lossrate",
        when(
          col("results").isNotNull && col("results") =!= 0,
          col("loss").cast("double") / col("results")))
      .drop("__rtts", "__padded")
  }
}
