package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sequential id allocation WITHOUT a single-partition
  * window. `row_number() OVER (ORDER BY keys)` funnels every row through
  * one task — fine for a trickle of new dimension rows, a scale-killer on
  * the first backfill of a large corpus (millions of new streams/paths in
  * batch 1).
  *
  * Here: range-partition by the (unique, totally-ordering) key columns,
  * sort within partitions, then RDD `zipWithIndex` — one lightweight
  * count-per-partition job plus a map. Ids come out identical to the
  * un-partitioned row_number (start+1.. in global key order; asserted in
  * CatalogSpec), but the allocation runs at the data's parallelism.
  */
object Ids {

  def assignSequential(
      df: DataFrame,
      orderCols: Seq[String],
      startExclusive: Long,
      idCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startExclusive + i + 1))
    }
    spark.createDataFrame(rdd, schema)
  }
}
