package graft.core

import org.apache.spark.sql.SparkSession

/** The engine's ONE local session builder — Bench, Verify, ExplainDump and
  * the profiling tools all delegate here so the declared performance
  * posture (AQE coalescing floor, small-input fan-out ceiling) is a
  * property of the ENGINE, not of whichever harness happened to set it
  * (r19 shipped the two confs in Bench/Verify only; ExplainDump's plan
  * captures ran under a subtly different session — ADVICE r19).
  *
  * Library embedders build their own sessions; [[tuningConfs]] is the
  * documented production posture to copy (each value env-overridable).
  */
object Sessions {

  /** The engine's scale-parameterised tuning confs, in (key, value) form
    * so non-local builders can apply them too.
    *
    *   - AQE coalescing floor: AQE sizes reduce partitions by BYTES
    *     (`parallelismFirst` honors only `minPartitionSize`, default
    *     1 MB); this engine's reduce stages are CPU-dense at small byte
    *     sizes (19-slot decimal grids, percentile buffers, object
    *     aggregates), so the default collapsed them onto 4-10 tasks while
    *     the rest of the machine idled. 16k keeps such stages at the
    *     session's parallelism; byte-based and self-limiting at scale —
    *     partition counts stay capped by `spark.sql.shuffle.partitions`,
    *     and IO-bound large shuffles are untouched. Raise toward the 1 MB
    *     default for purely IO-bound ETL.
    *   - Small-input fan-out ceiling: see [[Tables.fanOutSmall]]; inputs
    *     above it (every production fact table) never repartition.
    */
  def tuningConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "16k"),
    "graft.fanout.maxInputBytes" ->
      sys.env.getOrElse("SPARK_GRAFT_FANOUT_MAX", (64L << 20).toString))

  /** Local-mode builder with the harness contract (`local[$cpus]`,
    * shuffle partitions = cores — the driver benches at several core
    * counts and partition counts must follow) plus the engine posture.
    */
  def localBuilder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has carried TIMESTAMP(NANOS); read as raw long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    tuningConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
