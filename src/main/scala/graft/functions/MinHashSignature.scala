package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused MinHash signature over a shingle-hash array:
  * `signature[i] = min over s in set of xxhash64(i, s)` for
  * `i = 0 until numHashes` — one pass, one expression, no explode and no
  * shuffle.
  *
  * Replaces the relational form (explode shingles → hash aggregation with
  * `numHashes` MIN buffers), which was correct and map-side-combined but
  * paid 64 codegen'd builtin-hash evaluations per EXPLODED row plus a full
  * shuffle of (doc, shingle) pairs. Here signature computation is a
  * map-only projection over the materialized sets: at 100 TB the only
  * shuffle left in the MinHash+LSH pipeline is the band-bucket join.
  *
  * Bit-identical to `xxhash64(lit(i), col)`: the builtin left-folds Spark's
  * XXH64 over its arguments, so per-plane seeds are precomputed as
  * `XXH64.hashInt(i, 42)` (the int literal folded into the default seed)
  * and each shingle contributes `XXH64.hashLong(s, seed_i)` — the same
  * static hash the builtin's generated code calls. Parity is asserted
  * against the compositional form in DedupSpec.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(
      input.asInstanceOf[ArrayData], MinHashSignature.seeds(numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seeds = ctx.addReferenceObj(
      "minhashSeeds", MinHashSignature.seeds(numHashes), "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.MinHashSignature.signature($v, $seeds);"
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {

  /** Per-plane seeds: the int literal `i` folded into xxhash64's default
    * seed 42, exactly as the builtin does for its first argument.
    */
  def seeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  /** Hot loop shared by eval and generated code. Empty sets yield
    * Long.MaxValue signatures (the relational MIN over zero rows was NULL —
    * callers filter empty docs before signing; asserted in DedupSpec).
    */
  def signature(set: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = set.numElements()
    var j = 0
    while (j < n) {
      val s = set.getLong(j)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(s, seeds(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(set: Column, numHashes: Int): Column =
    ColumnBridge.toColumn(MinHashSignature(ColumnBridge.toExpression(set), numHashes))
}
