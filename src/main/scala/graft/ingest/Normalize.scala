package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-time normalization operators (SURVEY §2.4 A15-A17, §2.8 F7-F12):
  * the per-batch reductions every reference parser applies before rows hit
  * storage, re-expressed as codegen'd Column functions / grouped Datasets.
  */
object Normalize {

  /** Int-truncating median of an integer column per group, matching
    * `_find_median` (/root/reference/libnntsc/parsers/common.py:252-262):
    * sorted values; odd n → middle; even n → int mean of the two middle
    * values (truncation toward zero, the reference's py2-compat behaviour).
    * Returns an aggregate Column over a collected sorted array — bounded by
    * per-(stream, interval) result counts (tens of values in the reference).
    */
  def medianInt(v: Column): Column = {
    val arr = sort_array(collect_list(v))
    val n = size(arr)
    val half = (n / 2).cast("int")
    when(n === 0, lit(null))
      .when(n % 2 === 1, element_at(arr, half + 1))
      .otherwise(
        ((element_at(arr, half) + element_at(arr, half + 1)) / 2).cast("int"))
  }

  /** IP family classifier (amp_icmp.py:109-112): '.' present → ipv4 else
    * ipv6.
    */
  def ipFamily(address: Column): Column =
    when(address.contains("."), "ipv4").otherwise("ipv6")

  /** Unit conversion s→ms with 6dp rounding (rrd_smokeping.py:112). */
  def secondsToMillis(v: Column): Column = round(v * 1000, 6)

  /** Guarded rate = num/denom, NULL when denom is 0/NULL
    * (amp_throughput.py:139-145).
    */
  def safeRate(num: Column, denom: Column): Column =
    when(denom.isNotNull && denom =!= 0, num / denom)

  /** Null-safe addition `_add_maybe_none` (common.py:264-269). */
  def addMaybeNull(a: Column, b: Column): Column =
    when(a.isNull, b).when(b.isNull, a).otherwise(a + b)

  /** AS-path run-length encoding (amp_traceroute.py:588-654): hop AS list →
    * ["count.ASN", ...], plus uniqueas (distinct non-null AS count) and
    * responses (hops minus trailing nulls). Pure array expressions.
    */
  def rlePath(aspath: Column): Column = {
    // indexes where a run starts (first element or differs from previous)
    val n = size(aspath)
    val starts = filter(
      sequence(lit(1), n),
      i => (i === 1) || not(element_at(aspath, i) <=> element_at(aspath, i - 1)))
    transform(starts, (s, j) => {
      val next = when(j < size(starts) - 1, element_at(starts, j + 2)).otherwise(n + 1)
      concat_ws(".", (next - s).cast("string"), element_at(aspath, s))
    })
  }

  def uniqueAs(aspath: Column): Column =
    size(array_distinct(filter(aspath, a => a.isNotNull)))

  /** Path length with the reference's incomplete-path convention
    * (amp_traceroute_pathlen.py:95-115): empty path → 0.5; trailing-null
    * path → (hops up to last responding hop) + 0.5; complete path → hops.
    */
  def pathLength(path: Column): Column = {
    val n = size(path)
    val idxs = filter(sequence(lit(1), n), i => element_at(path, i).isNotNull)
    val lastNonNull = coalesce(array_max(idxs), lit(0))
    when(path.isNull, lit(null))
      .when(n === 0, lit(0.5))
      .when(element_at(path, n).isNull, lastNonNull.cast("double") + 0.5)
      .otherwise(n.cast("double"))
  }

  /** Jitter percentile spreading (amp_udpstream.py:179-204): when fewer
    * than 10 percentiles are available, reuse values in stepped fashion so
    * the output always has 10 entries.
    */
  def spreadPercentiles(pcts: Column): Column = {
    val n = size(pcts)
    transform(sequence(lit(0), lit(9)), i =>
      when(n === 0, lit(null))
        .otherwise(element_at(pcts, floor(i * n / 10).cast("int") + 1)))
  }
}
