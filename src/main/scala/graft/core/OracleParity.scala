package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine (Spark vs DuckDB oracle) floating-point parity conventions.
  *
  * The driver hash-compares cell values, so every double that crosses the
  * oracle boundary must be bit-identical in both engines:
  *   - large SUMs of doubles: cast operands to DECIMAL(18,6), sum exactly,
  *     round, then cast back to DOUBLE — both engines produce the same bits
  *     (double->decimal casts and decimal arithmetic are exact & identical).
  *   - AVG / STDDEV / small sums: compute in double, `round(x, 4)` — the
  *     cross-engine drift is ~1e-12 relative, far inside a 1e-4 grid.
  *   - epoch seconds: Spark `cast(ts as long)` truncates; DuckDB oracle must
  *     use `CAST(floor(epoch(ts)) AS BIGINT)`.
  *   - natural log (BM25 log-idf, LM cross-entropy, DSIR log-ratio):
  *     NEVER Spark's `log()` — it is StrictMath (fdlibm), which disagrees
  *     with the oracle engine's platform ln on ~6% of inputs. Use
  *     [[graft.functions.PlatformLn]] (Math.log: 0.06% disagreement, all
  *     1 ulp) and quantize at 1e-9, coarse enough that a 1-ulp gap on a
  *     magnitude-~16 value cannot cross a quantization boundary.
  */
object OracleParity {
  val Scale = 4

  /** Canonical decimal type for exact cross-engine money arithmetic. */
  val Dec: DecimalType = DecimalType(18, 6)

  def dec(c: Column): Column = c.cast(Dec)

  /** Exact decimal sum of a double expression, emitted as a 2dp double. */
  def decSum(c: Column, dp: Int = 2): Column =
    round(sum(c.cast(Dec)), dp).cast(DoubleType)

  /** Finish an exact decimal aggregate: round + cast back to double. */
  def decOut(c: Column, dp: Int = 2): Column = round(c, dp).cast(DoubleType)

  // -- "exact partials, deterministic finisher" aggregates --------------
  // Sum the 6dp-quantized decimals exactly, cast to double, then finish
  // with plain IEEE double arithmetic. Both engines see bit-identical
  // operands, so results are bit-identical with NO rounding step at all.

  /** sum(x) with cross-engine-identical result bits. */
  def exactSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** avg(x) = exactSum / count, bit-identical across engines. */
  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  /** Sample stddev from exact decimal partials:
    * sqrt(max(s2 - s1²/n, 0) / (n-1)); NULL when n < 2 (like stddev_samp).
    * The max(…, 0) clamp keeps tiny negative epsilons from producing NaN.
    */
  def exactStddev(c: Column): Column = {
    val n = count(c)
    val s1 = exactSum(c)
    val s2 = sum((c.cast(Dec) * c.cast(Dec))).cast(DoubleType)
    when(n >= 2, sqrt(greatest(s2 - s1 * s1 / n, lit(0.0)) / (n - lit(1))))
  }

  /** DuckDB SQL fragments mirroring the exact aggregates above. */
  object Sql {
    def dec(x: String): String = s"CAST($x AS DECIMAL(18,6))"

    /** DECIMAL→DOUBLE via an exact integer + small-fraction split.
      * DuckDB's native decimal→double cast computes
      * `(double) unscaled / 10^scale` — TWO roundings — and lands 1 ULP
      * off the correctly-rounded value Spark/Java produce once the
      * unscaled value passes 2^53 (observed at GenScale sf10:
      * Σ event_id = 1.676e13 → unscaled 1.676e19; q_matrix_tier_multi
      * event_id_avg flipped its 9th decimal). Splitting keeps both parts
      * exactly representable — the integer part is < 2^53 for any total
      * this engine can aggregate, the remainder's unscaled is ≤ 5·10^5 —
      * so the ONE rounding happens at the final addition: correctly
      * rounded for |total| < 2^47 (a 6-dp decimal can never tie a
      * rounding midpoint there; proof in ROUND_NOTES r10).
      */
    def decToDouble(s: String): String =
      s"(CAST(CAST(($s) AS DECIMAL(38,0)) AS DOUBLE) + " +
        s"CAST(($s) - CAST(($s) AS DECIMAL(38,0)) AS DOUBLE))"

    def exactSum(x: String): String = decToDouble(s"sum(${dec(x)})")
    def exactAvg(x: String): String = s"(${exactSum(x)} / count($x))"
    def exactStddev(x: String): String =
      s"""(CASE WHEN count($x) >= 2 THEN sqrt(greatest(
         |  ${decToDouble(s"sum(${dec(x)} * ${dec(x)})")}
         |    - ${exactSum(x)} * ${exactSum(x)} / count($x), 0.0)
         |  / (count($x) - 1)) END)""".stripMargin.replace("\n", " ")
  }

  def r4(c: Column): Column = round(c, Scale)

  /** Round every DoubleType / Array(DoubleType) column to `Scale` places. */
  def roundDoubles(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType => round(col(f.name), Scale).as(f.name)
        case ArrayType(DoubleType, _) =>
          transform(col(f.name), x => round(x, Scale)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
