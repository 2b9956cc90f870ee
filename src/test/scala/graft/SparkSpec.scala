package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazily created). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // specs pin OPERATOR plan shapes (map-only, codegen spans); the r19
    // bench-level small-input scan fan-out (Tables.loadFact) would put a
    // repartition Exchange under every such assertion. Off here; the
    // fan-out's own gating is pinned in TablesFanoutSpec.
    .config("graft.fanout.maxInputBytes", "0")
    .getOrCreate()

  def sf(dir: String): String = s"/root/testdata/$dir"
}
