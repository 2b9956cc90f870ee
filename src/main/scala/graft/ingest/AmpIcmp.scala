package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** amp-icmp ingest normalization (SURVEY §2.4 A15) — the per-batch,
  * per-stream reduction of /root/reference/libnntsc/parsers/amp_icmp.py:
  *
  *   - stream key: (source, destination=target, family(address),
  *     packet_size-as-string, "random" when randomized) (amp_icmp.py:104-130)
  *   - loss     = null-safe sum of per-result loss (None if never measured)
  *   - rtts     = sorted non-null RTTs, then padded with `loss` NULLs AFTER
  *     the median is taken (amp_icmp.py:163-176)
  *   - median   = int-truncating median of the sorted RTTs (common.py:252-262)
  *   - results  = count of results with a truthy rtt OR truthy loss
  *     (amp_icmp.py:160-161 — rtt=0/loss=0 do NOT count, python truthiness)
  *   - lossrate = loss / results, NULL when results is NULL/0
  *
  * Expressed as one grouped aggregation — Spark's null-skipping sum/
  * collect_list reproduce the reference's _add_maybe_none chains exactly.
  */
object AmpIcmp {

  /** batch columns: source, target, address, rtt, loss, random,
    * packet_size, timestamp. Output: one row per (stream key, timestamp).
    */
  def normalize(batch: DataFrame): DataFrame = {
    val truthy = (c: String) => col(c).isNotNull && col(c) =!= 0
    batch
      .withColumn("destination", col("target"))
      .withColumn("family", Normalize.ipFamily(col("address")))
      .withColumn(
        "packet_size_key",
        when(col("random"), lit("random")).otherwise(col("packet_size").cast("string")))
      .groupBy("source", "destination", "family", "packet_size_key", "timestamp")
      .agg(
        sum(col("loss")).cast("int").as("loss"),
        sort_array(collect_list(col("rtt"))).as("__rtts"),
        Normalize.medianInt(col("rtt")).as("median"),
        sum(when(truthy("rtt") || truthy("loss"), 1)).cast("int").as("results"),
        first(col("packet_size")).as("packet_size"))
      .withColumn(
        "rtts",
        when(
          col("loss").isNotNull && col("loss") > 0,
          concat(
            col("__rtts"),
            array_repeat(lit(null).cast("int"), col("loss"))))
          .otherwise(col("__rtts")))
      .withColumn(
        "lossrate",
        when(
          col("results").isNotNull && col("results") =!= 0,
          col("loss").cast("double") / col("results")))
      .drop("__rtts")
  }
}
