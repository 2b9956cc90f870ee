package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.query.AggSpec
import graft.schema.Collections
import graft.serve.Service
import graft.streaming.{IngestStream, Subscribe}

/** End-to-end demo: streaming ingest → catalog → service queries →
  * subscribe seam. Drives the library through its public API the way a
  * collector deployment would.
  */
object Demo {
  case class R(source: String, destination: String, command: String,
      timestamp: Long, value: Long)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graftdemo").toString

    // 1. streaming ingest of two micro-batches (amp-external shaped)
    val in = MemoryStream[R](spark)
    val q = IngestStream.start(
      in.toDF(), Collections.ampExternal,
      s"$dir/streams", s"$dir/data", s"$dir/ckpt")
    in.addData(R("amp", "web01", "ping", 1000L, 12L), R("amp", "web02", "ping", 1000L, 31L))
    q.processAllAvailable()
    in.addData(R("amp", "web01", "ping", 1300L, 14L), R("amp", "web03", "ping", 1300L, 9L))
    q.processAllAvailable(); q.stop()

    val streams = spark.read.parquet(s"$dir/streams")
    val data = IngestStream.readData(spark, s"$dir/data")
    println(s"DEMO streams=${streams.count()} data_rows=${data.count()}")
    streams.orderBy("stream_id").show(false)

    // 2. service queries over the ingested collection
    val svc = new Service(spark,
      data = Map("amp-external" -> data.withColumn("stream_id", col("stream_id").cast("long"))),
      streams = Map("amp-external" -> streams))
    println(s"DEMO collections=${svc.collections().size}")
    val labels = Map("web" -> Seq(1L, 2L, 3L))
    val chunks = svc.aggregate(
      "amp-external", labels, Seq(AggSpec("value", "avg"), AggSpec("value", "count")),
      0L, 10000L, binsize = 300).toSeq
    chunks.foreach(c => println(s"DEMO chunk label=${c.label} rows=${c.rows.size} more=${c.more} freq=${c.freq}"))

    // 3. subscribe seam: backfill + buffered live with dedupe
    val session = new Subscribe.Session(
      Subscribe.Subscription(labels, 0L, 0L, Seq("value")))
    val hist = data.withColumn("stream_id", col("stream_id").cast("long"))
    session.onHistory(hist)
    session.onLive(Seq((1L, 1300L, 99.0), (1L, 1500L, 15.0)).toDF("stream_id", "timestamp", "value"))
    val released = session.finish().map(_.collect().toSeq).getOrElse(Nil)
    println(s"DEMO subscribe released=${released.map(_.getAs[Long]("timestamp")).mkString(",")} (expect only 1500 > lasthist=1300)")

    // 3b. stateful streaming live fan-out: lasthist gate + redelivery dedupe
    {
      import graft.streaming.LiveFanout
      import graft.streaming.LiveFanout.LiveRow
      val live = MemoryStream[LiveRow](spark)
      val fq = LiveFanout.gated(spark, live.toDS(), Map(1L -> 1300L))
        .writeStream.outputMode("append").format("memory").queryName("demo_fanout").start()
      live.addData(LiveRow(1L, 1300L, 14.0), LiveRow(1L, 1600L, 16.0))
      fq.processAllAvailable()
      live.addData(LiveRow(1L, 1600L, 16.0), LiveRow(1L, 1700L, 17.0)) // redelivery
      fq.processAllAvailable(); fq.stop()
      val emitted = spark.table("demo_fanout").collect()
        .map(_.getAs[Long]("timestamp")).sorted.mkString(",")
      println(s"DEMO fanout emitted=$emitted (expect 1600,1700: gate 1300, dedupe redelivery)")
    }

    // 3c. S2 file-poller chain: files land → poll → ingest (epoch
    //     idempotent) → X3 push marker → rollup over the landed data
    {
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.{FilePoller, Markers}
      import graft.rollup.Rollup
      val pdir = java.nio.file.Files.createTempDirectory("graftpoll").toString
      val schema = Seq.empty[R].toDF().schema
      val bus = new Markers.MarkerBus
      bus.subscribe("amp-external")(m =>
        println(s"DEMO marker collection=${m.collection} ts=${m.timestamp} epoch=${m.epoch}"))
      Seq(R("amp", "web01", "ping", 1000L, 12L), R("amp", "web01", "ping", 1300L, 14L))
        .toDF().write.mode("append").parquet(s"$pdir/in")
      val pq = FilePoller.start(
        spark, s"$pdir/in", schema, Collections.ampExternal,
        s"$pdir/streams", s"$pdir/data", s"$pdir/ckpt",
        trigger = Trigger.AvailableNow(), // prod: ProcessingTime("30 seconds")
        markers = Some(("amp-external", bus)))
      pq.awaitTermination()
      val landed = IngestStream.readData(spark, s"$pdir/data")
        .withColumn("stream_id", col("stream_id").cast("long"))
      val rolled = Rollup.build(landed, 300, "value").collect()
      println(s"DEMO poller rows=${landed.count()} rollup_bins=${rolled.length}")
    }

    // 3d. the S6 wire endpoint: a real TCP client asks for collections
    {
      import graft.serve.{Wire, WireServer}
      val server = new WireServer(svc)
      val sock = new java.net.Socket("127.0.0.1", server.boundPort)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      out.write(Wire.pack(0, """{"request":"collections"}""".getBytes("UTF-8")))
      out.flush(); sock.shutdownOutput()
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      val in = sock.getInputStream
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      // first frame is the version-check greeting; the reply follows
      val greeting = Wire.unpack(buf.toByteArray)
      val reply = Wire.unpack(
        buf.toByteArray.drop(Wire.HeaderLen + greeting.body.length))
      println(s"DEMO wire collections bytes=${reply.body.length} " +
        s"first=${new String(reply.body, "UTF-8").take(60)}...")
      sock.close(); server.close()
    }

    // 4. native Catalyst aggregates through SQL (as the reference's
    //    in-database smoke/most functions)
    graft.functions.GraftExtensions.register(spark)
    Tables.tsEvents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("ev")
    spark.sql(
      """SELECT stream_id, most(event_type) AS mode_type,
        |       round(smoke(value)[19], 2) AS p_top_bucket
        |FROM ev GROUP BY stream_id ORDER BY stream_id LIMIT 5""".stripMargin)
      .collect()
      .foreach(r => println(s"DEMO sql stream=${r.getLong(0)} most=${r.getString(1)} smoke20=${r.getDouble(2)}"))
    spark.stop()
  }
}
