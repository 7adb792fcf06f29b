package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/**
 * AS-OF join as a WHOLE-OPERATOR extension: custom logical node +
 * planner strategy + physical operator — the (c)-tier of the custom
 * operator ladder (compose ops < custom expression < custom plan node).
 *
 * Semantics (identical to [[graft.ops.Events.asOfJoin]], which the
 * DuckDB `ASOF LEFT JOIN` oracle checks): for every left row, carry the
 * latest right row of the same key with `right.ts <= left.ts`, or nulls
 * if none.
 *
 * Scale design: both children are hash-clustered on the key and sorted
 * by (key, ts) — Spark's EnsureRequirements inserts exactly one
 * co-partitioned exchange per side; the merge itself is a streaming
 * single pass per partition with O(1) state (ONE carried row), never
 * materializing a window buffer. Versus the union+window form this
 * halves the rows flowing through the sort and needs no
 * `last(..., ignoreNulls)` running-frame evaluation; at 100 TB both
 * forms shuffle once, but the merge pass is the cheaper reducer.
 */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    keyCol: String,
    tsCol: String,
    valueCols: Seq[String],
    carriedAttrs: Seq[Attribute],
    toleranceMicros: Option[Long])
  extends BinaryNode {

  // Columns are resolved BY NAME against the children's CURRENT outputs
  // (at planning time), not stored as resolved references: analyzer /
  // optimizer rules (DeduplicateRelations when both sides share a scan,
  // alias collapsing, …) re-id child attributes, and a custom node is
  // not covered by their attribute-rewrite machinery.
  private def find(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
      s"as-of join: column $n not found in ${p.output.map(_.name)}"))
  def leftKey: Attribute = find(left, keyCol)
  def leftTs: Attribute = find(left, tsCol)
  def rightKey: Attribute = find(right, keyCol)
  def rightTs: Attribute = find(right, tsCol)
  def rightValues: Seq[Attribute] = valueCols.map(find(right, _))

  override def output: Seq[Attribute] = left.output ++ carriedAttrs

  // the carried columns are CREATED here (not drawn from a child), like
  // Generate's generator output — declare them so CheckAnalysis accepts
  // the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carriedAttrs)

  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      Seq(leftKey, leftTs, rightKey, rightTs) ++ rightValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {
  /** Construct from analyzed child plans, validating names and the
    * integral-µs ts type now; `carriedAttrs` are fresh (nullable)
    * outputs for (asof_ts, asof_values...). */
  def apply(
      left: LogicalPlan, right: LogicalPlan,
      keyCol: String, tsCol: String, valueCols: Seq[String],
      outPrefix: String, toleranceMicros: Option[Long] = None): AsOfJoinNode = {
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: column $name not found in ${p.output.map(_.name)}"))
    attr(left, keyCol)
    val lTs = attr(left, tsCol)
    val rTs = attr(right, tsCol)
    require(lTs.dataType == LongType && rTs.dataType == LongType,
      s"as-of join requires integral (epoch-µs long) $tsCol timestamps")
    require(toleranceMicros.forall(t => t >= 0 && t < Long.MaxValue),
      s"as-of tolerance must be in [0, Long.MaxValue), got $toleranceMicros")
    val values = valueCols.map(attr(right, _))
    val carried =
      AttributeReference(s"$outPrefix$tsCol", rTs.dataType, nullable = true)() +:
        values.map(v => AttributeReference(s"$outPrefix${v.name}", v.dataType, nullable = true)())
    new AsOfJoinNode(left, right, keyCol, tsCol, valueCols, carried, toleranceMicros)
  }
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Injected per-session via
  * `ColumnBridge.addStrategy` (or cluster-wide through
  * `graft.functions.GraftExtensions`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(
        n.leftKey, n.leftTs, n.rightKey, n.rightTs, n.rightValues,
        n.output, n.toleranceMicros, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/**
 * Streaming sort-merge as-of join. Children are clustered by key and
 * sorted (key asc, ts asc); each partition pair merges in one pass:
 * advance the right cursor while it is `<=` the current left row
 * (by (key, ts)), remembering the latest same-key right row, and emit
 * left + carried (or nulls). State per partition = one buffered row.
 */
case class AsOfJoinExec(
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightValues: Seq[Expression],
    output: Seq[Attribute],
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val nValues = rightValues.size
    val tolerance = toleranceMicros.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // per-task construction: generated orderings/projections are not
      // serializable, so everything codegen'd is built on the executor
      val keyOrdering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(keyType))
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), lOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), rOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
      // carried payload = (asof_ts, values...) — copied on store, O(1) state
      val rCarryProj = UnsafeProjection.create(rightTs +: rightValues, rOut)
      val resultProj = UnsafeProjection.create(output, lOut ++ output.drop(lOut.size))
      val nullRow = new GenericInternalRow(1 + nValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTs: Long = 0L
        private var carried: UnsafeRow = _
        private var carriedKey: UnsafeRow = _

        // NULL-ts rows follow the oracle's inequality semantics
        // (`right.ts <= left.ts` is false when either side is NULL):
        // right rows with NULL ts are skipped, left rows with NULL ts
        // carry nulls. getLong on a null slot would silently read 0.
        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && ri.hasNext) {
            val r = ri.next()
            val tsRow = rTsProj(r)
            if (!tsRow.isNullAt(0)) {
              rHead = r
              rHeadKey = rKeyProj(r).copy()
              rHeadTs = tsRow.getLong(0)
            }
          }
        }

        advanceRight()

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val lk = lKeyProj(l).copy()
          val ltRow = lTsProj(l)
          if (ltRow.isNullAt(0)) {
            // NULL left ts never matches; nulls sort FIRST under the
            // required ascending order, so no right rows are skipped early
            return resultProj(joined(l, nullRow))
          }
          val lt = ltRow.getLong(0)
          var cmp = if (rHead == null) 1 else keyOrdering.compare(rHeadKey, lk)
          while (rHead != null && (cmp < 0 || (cmp == 0 && rHeadTs <= lt))) {
            if (cmp == 0) {
              carried = rCarryProj(rHead).copy()
              carriedKey = rHeadKey
            }
            advanceRight()
            cmp = if (rHead == null) 1 else keyOrdering.compare(rHeadKey, lk)
          }
          // tolerance: a carried row older than (left.ts - tolerance) is
          // treated as absent (pandas merge_asof semantics); the carried
          // payload's first field IS the right ts. The merge invariant
          // guarantees carried.ts <= lt, so the true distance is >= 0 —
          // a NEGATIVE subtraction result means Long overflow (distance
          // beyond Long.MaxValue), i.e. out of any tolerance.
          val withinTolerance = carried != null && {
            val dist = lt - carried.getLong(0)
            tolerance == Long.MaxValue || (dist >= 0 && dist <= tolerance)
          }
          val payload =
            if (withinTolerance && keyOrdering.compare(carriedKey, lk) == 0) carried
            else nullRow
          resultProj(joined(l, payload))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
