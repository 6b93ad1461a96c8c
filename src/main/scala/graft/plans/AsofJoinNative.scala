package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/**
 * NATIVE backward as-of join — the rung (c) of the custom-operator ladder
 * (SURVEY §1.5): a whole-operator `LogicalPlan` + `SparkStrategy` +
 * `SparkPlan`, registered via `SparkSessionExtensions`, for semantics the
 * built-in operators can only express indirectly.
 *
 * Semantics (= DuckDB `ASOF LEFT JOIN`, the same contract as
 * [[graft.ops.TimeOps.asofJoinBackward]]): for each left row, the payload
 * of the most recent right row with equal key and `rightTs <= leftTs`;
 * nulls when none. NULL keys and NULL timestamps match nothing (exactly
 * SQL comparison semantics). Ties on (key, ts) resolve to the greatest
 * payload tuple — the composed operator's documented tie-break — by
 * requiring the payload columns in the right child's sort order.
 *
 * Physical shape: both children hash-clustered on the key and sorted by
 * (key, ts) — `EnsureRequirements` inserts the exchanges and sorts, AQE
 * still re-plans them — then ONE forward two-pointer merge pass per
 * co-partition. vs the union+window composition: no union of the two row
 * shapes, no window buffer holding a whole key-group, no post-filter;
 * each right row is visited once and only match candidates are copied.
 * Cost per partition is |L| + |R| with O(1) carried state — the shape
 * that survives 100 TB because it never materializes a key-group.
 *
 * The moving parts stay interpreted (`eval`, not codegen) — the per-row
 * work is two comparisons and a projection; the scan/filter/sort below
 * remain inside WholeStageCodegen spans.
 */
object AsofJoinNative {

  /** Backward as-of join via the native operator. `right` is projected to
    * (key, ts, payload*) before planning so column pruning needs no
    * operator-specific optimizer rule. Payload columns must not clash
    * with left column names (same contract as the composed operator). */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    // key/ts types MUST match across sides: ClusteredDistribution is
    // satisfied per child, so an int-vs-long key pair would hash-partition
    // differently (murmur3 of int 5 ≠ long 5), silently mis-pairing
    // partitions — fail fast instead
    def dt(df: DataFrame, c: String) = df.schema(c).dataType
    require(dt(left, key) == dt(right, key),
      s"key type mismatch: ${dt(left, key)} vs ${dt(right, key)}")
    require(dt(left, leftTs) == dt(right, rightTs),
      s"ts type mismatch: ${dt(left, leftTs)} vs ${dt(right, rightTs)}")
    val r = right.select((key +: rightTs +: payload).distinct.map(right(_)): _*)
    val rp = r.queryExecution.analyzed
    val payloadOut = payload.map { p =>
      val a = rp.output.find(_.name == p).getOrElse(
        throw new IllegalArgumentException(s"payload column $p missing from right"))
      a.withNullability(true).newInstance()
    }
    val node = AsofJoinNode(left.queryExecution.analyzed, rp,
      key, leftTs, rightTs, payload, payloadOut)
    Bridge.ofRows(left.sparkSession, node)
  }
}

/** Logical node. Columns are referenced BY NAME and re-resolved against
  * child outputs at planning time, so analyzer rewrites of the children
  * (DeduplicateRelations on self-joins, etc.) cannot dangle references.
  * `payloadOut` holds the pre-allocated output attributes — stored in the
  * node so `output` stays stable across tree copies. */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    key: String, leftTs: String, rightTs: String,
    payload: Seq[String], payloadOut: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  // the payload attrs are MINTED here (fresh exprIds, nullable) — declare
  // them produced or CheckAnalysis reports them missing from the children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  // columns are stored as NAMES, so the default expression-derived
  // references are empty and ColumnPruning would strip the key/ts/payload
  // columns out of the children. Derive references from the child outputs
  // (never dangles across analyzer rewrites).
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a => a.name == key || a.name == leftTs) ++
      right.output.filter(a =>
        a.name == key || a.name == rightTs || payload.contains(a.name)))
  override lazy val resolved: Boolean = childrenResolved
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical form, one physical form. Injected by
  * [[graft.functions.GraftExtensions]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsofJoinNode =>
      AsofJoinExec(n.key, n.leftTs, n.rightTs, n.payload, n.payloadOut,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    key: String, leftTs: String, rightTs: String,
    payload: Seq[String], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"column $name missing from ${side.nodeName}"))

  private def lKey = attr(left, key)
  private def rKey = attr(right, key)
  private def lTs = attr(left, leftTs)
  private def rTs = attr(right, rightTs)

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  /** Hash-cluster both sides on the key; EnsureRequirements co-partitions. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(lKey)) :: ClusteredDistribution(Seq(rKey)) :: Nil

  /** Sorted merge input. The right side additionally sorts by the payload
    * columns so the last row of an equal-(key, ts) run — the one the merge
    * keeps — is the greatest payload: the deterministic tie-break. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTs, Ascending)),
    Seq(SortOrder(rKey, Ascending), SortOrder(rTs, Ascending)) ++
      payload.map(p => SortOrder(attr(right, p), Ascending)))

  /** Left rows pass through in order with payload appended — advertise
    * both properties so downstream operators needing the same
    * clustering/ordering skip their exchange and sort. */
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(lKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(lTs.dataType)
    val lOut = left.output
    val rOut = right.output
    // payload reads must be null-tolerant: the no-match row is all nulls
    // regardless of the right child's declared nullability — bind by hand
    // (BindReferences would copy the child schema's nullable=false)
    val outExprs: Seq[Expression] =
      lOut.zipWithIndex.map { case (a, i) => BoundReference(i, a.dataType, a.nullable) } ++
        payload.map { p =>
          val a = attr(right, p)
          BoundReference(lOut.length + rOut.indexWhere(_.exprId == a.exprId),
            a.dataType, nullable = true)
        }
    val lKeyB = BindReferences.bindReference[Expression](lKey, lOut)
    val lTsB = BindReferences.bindReference[Expression](lTs, lOut)
    val rKeyB = BindReferences.bindReference[Expression](rKey, rOut)
    val rTsB = BindReferences.bindReference[Expression](rTs, rOut)

    // fast path: key and ts physically integral (long/int backed) → the
    // merge runs on primitive longs read from two tiny codegen'd
    // projections, no per-row boxing or interpreted ordering. Timestamps
    // compare by their raw micros — order-preserving, no lossy cast.
    val physGet: PartialFunction[org.apache.spark.sql.types.DataType, (InternalRow, Int) => Long] = {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => (r, i) => r.getLong(i)
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => (r, i) => r.getInt(i).toLong
      case org.apache.spark.sql.types.ShortType => (r, i) => r.getShort(i).toLong
      case org.apache.spark.sql.types.ByteType => (r, i) => r.getByte(i).toLong
    }
    val fastPath =
      Seq(lKey, lTs, rKey, rTs).map(_.dataType).forall(physGet.isDefinedAt)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outExprs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      var rRow: InternalRow = null
      var rDone = !rIt.hasNext
      if (!rDone) rRow = rIt.next()
      var lastKey: Any = null
      var lastMatch: InternalRow = null

      if (fastPath) {
        // attributes sit at fixed ordinals in the sorted child rows —
        // read them in place, no extraction projection per row
        val lki = lOut.indexWhere(_.exprId == lKey.exprId)
        val lti = lOut.indexWhere(_.exprId == lTs.exprId)
        val rki = rOut.indexWhere(_.exprId == rKey.exprId)
        val rti = rOut.indexWhere(_.exprId == rTs.exprId)
        val lkGet = physGet(lKey.dataType); val ltGet = physGet(lTs.dataType)
        val rkGet = physGet(rKey.dataType); val rtGet = physGet(rTs.dataType)
        var lastK = 0L
        var haveMatch = false
        lIt.map { l =>
          if (l.isNullAt(lki) || l.isNullAt(lti)) proj(joined(l, nullRight))
          else {
            val lk = lkGet(l, lki); val lt = ltGet(l, lti)
            var scan = !rDone
            while (scan) {
              var step = false
              if (rRow.isNullAt(rki)) step = true
              else {
                val rk = rkGet(rRow, rki)
                if (rk < lk) step = true
                else if (rk == lk) {
                  if (rRow.isNullAt(rti)) step = true
                  else if (rtGet(rRow, rti) <= lt) {
                    lastK = rk; haveMatch = true
                    lastMatch = rRow.copy(); step = true
                  }
                }
              }
              if (step) {
                if (rIt.hasNext) rRow = rIt.next() else { rDone = true; rRow = null }
                scan = !rDone
              } else scan = false
            }
            val m = if (haveMatch && lastK == lk) lastMatch else nullRight
            proj(joined(l, m))
          }
        }
      } else lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        if (lk == null || lt == null) proj(joined(l, nullRight))
        else {
          // consume right rows that can no longer matter for any later
          // left row of this key: key strictly behind, or same key with
          // ts <= this left ts (left is ts-ascending within the key)
          var scan = !rDone
          while (scan) {
            val rk = rKeyB.eval(rRow)
            var step = false
            if (rk == null) step = true // nulls sort first; match nothing
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) step = true
              else if (c == 0) {
                val rt = rTsB.eval(rRow)
                if (rt == null) step = true // null ts matches nothing
                else if (tsOrd.compare(rt, lt) <= 0) {
                  lastKey = rk
                  lastMatch = rRow.copy()
                  step = true
                }
              }
            }
            if (step) {
              if (rIt.hasNext) rRow = rIt.next() else { rDone = true; rRow = null }
              scan = !rDone
            } else scan = false
          }
          val m =
            if (lastMatch != null && keyOrd.compare(lastKey, lk) == 0) lastMatch
            else nullRight
          proj(joined(l, m))
        }
      }
    }
  }
}
