package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Schema-drift resilience for the events adapter: the corpus generator has
  * shipped `ts` as TIMESTAMP(NANOS) (Spark-read as raw LONG under
  * nanosAsLong), TIMESTAMP_MICROS (LTZ `TimestampType`), and TIMESTAMP_NTZ
  * (pandas/pyarrow default) across refreshes. The reference discovers column
  * types dynamically at query time (dbselect.py:112-139); this pins the
  * equivalent capability — `tsEvents` must yield identical epoch-second rows
  * for every physical encoding, so a corpus refresh can never zero a round
  * again (round 8's NTZ drift broke 23 gate queries).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val epochSecs = Seq(1704067200L, 1704067201L, 1704153599L)

  /** Write an events.parquet carrying `ts` under the given encoding and
    * return the adapter's (stream_id, timestamp, value) rows. */
  private def roundTrip(encode: org.apache.spark.sql.Column): Set[(Long, Long, Double)] = {
    val dir = Files.createTempDirectory("graft_tables").toString
    epochSecs.zipWithIndex
      .map { case (ts, i) => (i.toLong, i.toLong, ts, "click", i * 1.5, "{}") }
      .toDF("event_id", "user_id", "epoch_s", "event_type", "value", "props")
      .withColumn("ts", encode)
      .drop("epoch_s")
      .write.parquet(s"$dir/events.parquet")
    Tables.tsEvents(spark, dir)
      .select("stream_id", "timestamp", "value")
      .as[(Long, Long, Double)].collect().toSet
  }

  test("tsEvents yields identical epoch seconds for all three ts encodings") {
    // nanos-as-long: what TIMESTAMP(NANOS) parquet reads as under the
    // mandatory nanosAsLong conf (Spark cannot itself write nanos parquet,
    // so the long column stands in for the read-side type Spark sees)
    val asNanosLong = roundTrip(col("epoch_s") * lit(1000000000L))
    // LTZ micros: the standard Spark TimestampType
    val asLtz = roundTrip(timestamp_seconds(col("epoch_s")))
    // NTZ micros: the pandas/pyarrow default that broke round 8
    val asNtz = roundTrip(timestamp_seconds(col("epoch_s")).cast("timestamp_ntz"))

    val expected = epochSecs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, i * 1.5) }.toSet
    assert(asNanosLong === expected)
    assert(asLtz === expected)
    assert(asNtz === expected)
  }

  test("NTZ adapter is timezone-proof: a non-UTC caller session reads identical epochs") {
    // the NTZ→LTZ cast inside tsEvents goes through the SESSION timezone;
    // a driver-style fresh session in e.g. New York would silently shift
    // every timestamp by the tz offset unless tsEvents pins UTC itself
    // (ADVICE r9). Write with the UTC session, read with a skewed one.
    val dir = Files.createTempDirectory("graft_tables_tz").toString
    epochSecs.zipWithIndex
      .map { case (ts, i) => (i.toLong, i.toLong, ts, "click", i * 1.5, "{}") }
      .toDF("event_id", "user_id", "epoch_s", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("epoch_s")).cast("timestamp_ntz"))
      .drop("epoch_s")
      .write.parquet(s"$dir/events.parquet")
    val skewed = spark.newSession()
    skewed.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = Tables.tsEvents(skewed, dir)
      .select("stream_id", "timestamp", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = epochSecs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, i * 1.5) }.toSet
    assert(got === expected)
    // and without mutating the caller's session timezone: the adapter is
    // library code — clobbering session-global state to fix one cast
    // would shift the HOST application's own datetime results (r10 review)
    assert(skewed.conf.get("spark.sql.session.timeZone") === "America/New_York")
  }

  test("integer ts dispatches on magnitude: seconds/millis/micros/nanos longs all read") {
    val asSeconds = roundTrip(col("epoch_s"))
    val asMillis = roundTrip(col("epoch_s") * lit(1000L))
    val asMicros = roundTrip(col("epoch_s") * lit(1000000L))

    val expected = epochSecs.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts, i * 1.5) }.toSet
    assert(asSeconds === expected)
    assert(asMillis === expected)
    assert(asMicros === expected)
  }

  test("the shipped corpus reads through the adapter with sane timestamps") {
    val ev = Tables.tsEvents(spark, sf("sf0.001"))
    assert(ev.schema("timestamp").dataType.typeName === "long")
    val (lo, hi) = ev.agg(min("timestamp"), max("timestamp"))
      .as[(Long, Long)].head()
    // epoch seconds, not micros/nanos: anything in [2000, 2100)
    assert(lo > 946684800L && hi < 4102444800L, s"range [$lo, $hi] not epoch seconds")
  }
}
