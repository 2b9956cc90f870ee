package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry

/** Dump `.explain("formatted")` for declared queries to text files — the
  * optimization-round evidence trail (`plans/r<N>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> [query ...]
  * (no query names = every declared query). The Spark session mirrors
  * Bench's (same master/shuffle conf) so the captured plans are the
  * bench's plans.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val tag = if (args.length >= 2) args(1) else "before"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the shared engine session (graft.core.Sessions) — identical confs
    // to Bench's, so the captured plans ARE the bench's plans (ADVICE r19)
    val spark = graft.core.Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[explain] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            Files.write(
              Paths.get(outDir, s"${n}_$tag.txt"),
              txt.getBytes("UTF-8"))
            println(s"[explain] $n -> $outDir/${n}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $n FAILED: ${e.getClass.getName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
