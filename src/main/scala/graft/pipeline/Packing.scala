package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget bins by their start offset in the (id-ordered)
  * token stream — the distributed form of greedy context-window packing.
  *
  * The primitive underneath is a GLOBAL prefix sum, which a naive
  * `sum(...) over (ORDER BY id)` computes in ONE task (the whole corpus
  * funnels through a single sort partition — a non-starter at 100 TB).
  * [[withPrefixSum]] is the classic two-phase parallel scan instead:
  *
  *   1. range-repartition on the order column (sorted, disjoint ranges;
  *      `localCheckpoint` freezes the sampled boundaries so both passes
  *      see identical partitions);
  *   2. per-partition totals — a partition-count-sized aggregate —
  *      collect to the driver and fold into per-partition OFFSETS
  *      (driver-protocol-sized, like every other driver collect here);
  *   3. offsets ride back via a broadcast join, and a window partitioned
  *      BY PARTITION finishes the scan locally.
  *
  * Every stage is distributed; the only serial state is one long per
  * partition.
  */
object Packing {

  /** Add `outCol` = running total of `valueCol` (LONG) over the total
    * order of `orderCol` (must be unique), computed as a two-phase
    * parallel scan (see object doc).
    */
  def withPrefixSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame =
    withPrefixSumTotal(df, orderCol, valueCol, outCol, numPartitions)._1

  /** [[withPrefixSum]], also returning the GRAND TOTAL of `valueCol` —
    * already known from the per-partition sums the scan collects, so a
    * caller that needs n (rank normalization) does not pay a separate
    * counting pass over the corpus.
    */
  def withPrefixSumTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Option[Int] = None): (DataFrame, Long) = {
    val spark = df.sparkSession
    val ranged = numPartitions
      .map(n => df.repartitionByRange(n, col(orderCol)))
      .getOrElse(df.repartitionByRange(col(orderCol))) // AQE sizes it
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // freeze sampled range boundaries across passes
    val partSums: Array[(Int, Long)] = ranged
      .groupBy("__pid")
      .agg(sum(col(valueCol)).as("__psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = partSums.map(_._1)
      .zip(partSums.scanLeft(0L)(_ + _._2).init)
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    val out = ranged
      .join(offDf, "__pid")
      .withColumn(
        outCol,
        col("__off") +
          sum(col(valueCol)).over(Window.partitionBy("__pid").orderBy(orderCol)))
      .drop("__pid", "__off")
    (out, partSums.map(_._2).sum)
  }

  /** Pack documents into `budget`-token bins: bin = the context window the
    * document STARTS in, by whitespace token count over id order. Returns
    * (idCol, tokens, bin). Deterministic, reproducible across engines
    * (the DuckDB oracle recomputes it with a window sum).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = df.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("tokens"))
    withPrefixSum(toks, idCol, "tokens", "__cum")
      .withColumn(
        "bin",
        floor((col("__cum") - col("tokens")).cast("double") / budget).cast("long"))
      .select(col(idCol), col("tokens"), col("bin"))
  }

  /** Context-window chunking: shard each document into chunks of `size`
    * tokens starting every `stride` tokens (stride < size ⇒ overlapping
    * chunks, the usual long-document training shard). The last chunk may
    * be short; a document never emits a chunk whose tokens are fully
    * covered by the previous one, so
    * n_chunks = 1 + ceil((n_tokens − size) / stride) (min 1).
    *
    * Map-only — one explode per document, no shuffle; chunk counts are
    * derived in pure INTEGER arithmetic ((n−size+stride−1) div stride),
    * so both engines agree without a float ceil. Output: (idCol,
    * chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val toks = TextAnalysis.tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks)
    val lastStart = when(n > size, floor((n - size + stride - 1) / lit(stride)).cast("long"))
      .otherwise(lit(0L))
    df.select(
        col(idCol),
        toks.as("__toks"),
        explode(sequence(lit(0L), lastStart)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(size))
          .as("__chunk"))
      .select(
        col(idCol),
        col("chunk_id"),
        org.apache.spark.sql.functions.size(col("__chunk")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** Materialize the packed sequences: one row per bin with the member
    * documents concatenated in id order — the actual training rows.
    * Per-bin state is bounded by construction (a bin holds ~budget tokens
    * of text), so the collect_list can never blow a group; the in-group
    * order is pinned by sorting the (id, text) structs, not by collection
    * order (which shuffles don't preserve).
    */
  def packedText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame =
    packSequences(df, idCol, textCol, budget)
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("total_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          " ").as("packed_text"))
}
