package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DbgSum {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.core.Tables.tsEvents(spark, "/tmp/gen_sf10")
      .filter(col("timestamp") - (col("timestamp") % 3600) >= 1704067200L &&
        col("timestamp") - (col("timestamp") % 3600) < 1706745600L)
      .filter(col("stream_id") % 3 === 0)
    // raw: one exact decimal sum
    val raw = ev.agg(
      sum(col("event_id").cast(org.apache.spark.sql.types.DecimalType(18,6))).as("s"),
      count(col("event_id")).as("n")).collect()(0)
    val rs = raw.getDecimal(0)
    println(s"DBG raw sum=$rs n=${raw.getLong(1)}")
    println("DBG raw cast hex=" + java.lang.Double.toHexString(rs.doubleValue))
    // tier: per-bin partials then fold
    val tier = graft.rollup.Rollup.buildMulti(
      graft.core.Tables.tsEvents(spark, "/tmp/gen_sf10"), 3600,
      Seq("value", "event_id"), Seq("event_type"))
    val t = tier.filter(col("stream_id") % 3 === 0)
      .filter(col("binstart") >= 1704067200L && col("binstart") < 1706745600L)
      .agg(sum(col("s1__event_id")).as("s"), sum(col("cnt__event_id")).as("n")).collect()(0)
    val ts = t.getDecimal(0)
    println(s"DBG tier sum=$ts n=${t.getLong(1)}")
    println("DBG tier cast hex=" + java.lang.Double.toHexString(ts.doubleValue))
    val avg = ts.doubleValue / t.getLong(1)
    println("DBG tier avg hex=" + java.lang.Double.toHexString(avg))
    spark.stop()
  }
}
