package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfCC {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    val pairs = time("simhashPairs build+run") {
      val p = graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      println("pairs = " + p.count()); p
    }
    time("connectedComponents") {
      println("cc rows = " + graft.pipeline.Dedup.connectedComponents(pairs).count())
    }
    graft.pipeline.Dedup.unpersistIntermediates()
    time("whole q_dedup_cluster") {
      graft.SparkEntry.queries("q_dedup_cluster")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
