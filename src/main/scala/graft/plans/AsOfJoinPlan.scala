package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, BindReferences, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Rung (c) of the custom-operator ladder: a whole-operator as-of join as a
  * first-class Catalyst citizen — logical node → planner strategy →
  * physical sort-merge operator — registered through
  * `ExperimentalMethods.extraStrategies` (see `graft.query.TimeSeriesOps
  * .asofJoinNative`).
  *
  * Why a physical operator when the window composition
  * (`TimeSeriesOps.asofJoin`) already works: the composition UNIONS both
  * sides through one exchange+sort and carries values with a running
  * window — every left row pays the window machinery and the unioned sort
  * is over |L|+|R| rows. This operator declares the same distribution
  * (cluster both sides by key) but merges the two sorted streams directly:
  * each side is sorted separately (cheaper than sorting the union), the
  * merge is a single forward pass with O(1) state — the textbook as-of
  * merge — and Catalyst's EnsureRequirements still plans the exchanges, so
  * AQE sizing/skew handling applies unchanged at 100 TB.
  *
  * The node carries column NAMES, not attribute references: analyzer
  * rewrites (DeduplicateRelations re-aliases the right subtree whenever
  * both sides scan the same table — the common self-as-of case) change
  * exprIds under unknown nodes, so keys/ts/values are resolved against the
  * CURRENT child outputs, lazily, on both the logical and physical node.
  *
  * Semantics (identical to the composition, asserted in
  * TimeSeriesOpsSpec + the q_asof_native oracle row): for each left row,
  * the LATEST right row of the same key with `right.ts <= left.ts`
  * (inclusive); inner drops unmatched left rows, `leftOuter` keeps them
  * with NULLs. Right side should be unique per (key, ts) for determinism.
  * Timestamps are BIGINT epoch values (the engine's time contract); right
  * rows with NULL timestamps are ignored.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCols: Seq[String],
    tsCol: String,
    rightValueCols: Seq[String],
    asofAttrs: Seq[Attribute],
    leftOuter: Boolean)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule completing the Catalyst citizenship: Catalyst cannot
  * push filters through an UNKNOWN node, so a time-range or key predicate
  * above the as-of join would otherwise run after the exchange+merge
  * instead of reaching the parquet scan. Safe pushes:
  *
  *   - predicates over LEFT columns → into the left child (each left row
  *     is joined independently, inner or outer alike);
  *   - the subset of those over the JOIN KEYS → additionally into the
  *     right child with the key attributes substituted (rows of a pruned
  *     key can never match a surviving left row).
  *
  * Predicates touching the produced `asof_*` columns stay above the join.
  * Registered alongside the strategy in `TimeSeriesOps.asofJoinNative`.
  */
object AsOfJoinFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinNode) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val leftKeyAttrs = aj.keyCols.flatMap(n => aj.left.output.find(_.name == n))
        val keyToRight = leftKeyAttrs.flatMap(lk =>
          aj.right.output.find(_.name == lk.name).map(lk -> _)).toMap
        val keyOnly = pushable.filter(
          _.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(leftKeyAttrs)))
        val newLeft = Filter(pushable.reduce(And), aj.left)
        val newRight = keyOnly.reduceOption(And).fold(aj.right) { kp =>
          Filter(
            kp.transform {
              case a: AttributeReference if keyToRight.contains(a) => keyToRight(a)
            },
            aj.right)
        }
        val rewritten = aj.copy(left = newLeft, right = newRight)
        kept.reduceOption(And).map(Filter(_, rewritten)).getOrElse(rewritten)
      }
  }
}

/** Plans AsOfJoinNode → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, keys, ts, vals, attrs, outer) =>
      AsOfJoinExec(keys, ts, vals, attrs, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    keyCols: Seq[String],
    tsCol: String,
    rightValueCols: Seq[String],
    asofAttrs: Seq[Attribute],
    leftOuter: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  private def attrOf(side: SparkPlan, n: String): Attribute =
    side.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"as-of join: column $n not in [${side.output.map(_.name).mkString(", ")}]"))

  private def leftKeys: Seq[Expression] = keyCols.map(attrOf(left, _))
  private def rightKeys: Seq[Expression] = keyCols.map(attrOf(right, _))
  private def leftTs: Expression = attrOf(left, tsCol)
  private def rightTs: Expression = attrOf(right, tsCol)
  private def rightCarried: Seq[Expression] =
    attrOf(right, tsCol) +: rightValueCols.map(attrOf(right, _))

  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: AttributeSet = AttributeSet(asofAttrs)

  // cluster both sides on the join keys — EnsureRequirements inserts
  // compatible exchanges exactly as it does for sort-merge joins
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // each side sorted by (keys, ts) — two separate sorts, not one over the union
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val numAsof = asofAttrs.length
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val carriedExprs = rightCarried
    val outAttrs = output
    val asofOut = asofAttrs
    left.execute().zipPartitions(right.execute()) { (li, ri0) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val carryProj = UnsafeProjection.create(carriedExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ asofOut)
      val nullCarry = new GenericInternalRow(numAsof)
      val joined = new JoinedRow
      val ri = ri0.buffered

      // O(1) merge state: the latest matching right row (carried columns
      // only) and its key — both COPIES (sorter iterators reuse buffers)
      var lastMatch: InternalRow = null
      var lastMatchKey: InternalRow = null

      li.flatMap { l =>
        val lk = lKeyProj(l)
        val ltAny = lTsBound.eval(l)
        if (lastMatch != null && keyOrd.compare(lastMatchKey, lk) != 0) {
          lastMatch = null
          lastMatchKey = null
        }
        if (ltAny != null) {
          val lt = ltAny.asInstanceOf[Long]
          var advance = true
          while (advance && ri.hasNext) {
            val h = ri.head
            val c = keyOrd.compare(rKeyProj(h), lk)
            if (c < 0) { ri.next(); () } // right key behind every future left key
            else if (c == 0) {
              val rtAny = rTsBound.eval(h)
              if (rtAny == null) { ri.next(); () } // null ts: ignore
              else if (rtAny.asInstanceOf[Long] <= lt) {
                lastMatch = carryProj(h).copy()
                lastMatchKey = lk.copy()
                ri.next(); ()
              } else advance = false
            } else advance = false
          }
        }
        if (lastMatch != null) Iterator.single(outProj(joined(l, lastMatch)))
        else if (leftOuter) Iterator.single(outProj(joined(l, nullCarry)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
