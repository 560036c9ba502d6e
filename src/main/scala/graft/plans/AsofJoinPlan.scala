package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class Catalyst operator — the §4(c) extension
  * path: a custom `LogicalPlan` node, a `SparkStrategy` that plans it,
  * and a `SparkPlan` that executes a per-partition ordered merge.
  *
  * Semantics (LEFT OUTER as-of): for every left row, the single right
  * row with equal `keys` and the greatest `rightTime <= leftTime`;
  * unmatched left rows keep nulls on the right — time-series
  * "latest-value-at" enrichment (DuckDB's native `ASOF JOIN`, which is
  * exactly what the driver oracle runs against this operator).
  *
  * Why an operator instead of composition: the composable forms either
  * explode candidates (range join + rank + filter: every left×right
  * time-pair within a key shuffles) or interleave both tables through
  * one window (union + last_value IGNORE NULLS: a second full sort and a
  * wide carried row). The operator declares the MINIMAL requirement —
  * co-partition both sides on `keys`, sort within partitions by
  * (keys, time) — and EnsureRequirements plans exactly one exchange +
  * one sort per side; the merge itself is a single forward pass, O(L+R)
  * per partition, carrying one candidate row of state. That is the plan
  * shape a 100 TB as-of enrichment needs: no candidate blow-up, no
  * second shuffle, skew bounded by the keys' partitioning.
  *
  * Ties on `rightTime` within a key are broken by whatever total order
  * the caller pins (pre-aggregate the right side to one row per
  * (key, time) — as the declared query does — or append a tiebreaker to
  * the right sort): the merge keeps the LAST right row in sort order
  * among equal times, matching `max_by` semantics.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] → [[AsofJoinExec]]. Injected per-session via
  * `spark.experimental.extraStrategies` (runtime fallback) or
  * cluster-wide via `GraftExtensions.injectPlannerStrategy`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Ordered-merge as-of join. Requirements declare the contract;
  * EnsureRequirements inserts the exchanges/sorts that satisfy it.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows stream through in their incoming (key, time) order
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  private def timeToLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case other => throw new IllegalStateException(
      s"as-of time must be long-backed (LONG/INT/TIMESTAMP/DATE), got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val ltIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rtIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // upcast to Expression BEFORE binding: bindReference[A] casts its
      // result back to A, and a BoundReference is not an Attribute
      val lKeyProj = UnsafeProjection.create(
        leftKeys.map(k => BindReferences.bindReference(k: Expression, lOut)))
      val rKeyProj = UnsafeProjection.create(
        rightKeys.map(k => BindReferences.bindReference(k: Expression, rOut)))
      val lTimeRef = BindReferences.bindReference(leftTime: Expression, lOut)
      val rTimeRef = BindReferences.bindReference(rightTime: Expression, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // one row of lookahead + one candidate row — the whole merge state
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var rHeadTime: Long = _
        private var rHeadTimeNull: Boolean = _
        private var cand: InternalRow = _
        private var candKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit = {
          var done = false
          while (!done) {
            if (rIter.hasNext) {
              rHead = rIter.next().copy() // iterator rows are reused buffers
              rHeadKey = rKeyProj(rHead).copy()
              // SQL join equality: NULL matches nothing — the natural
              // ordering below compares NULLs as EQUAL, so a null-keyed
              // right row must never become a candidate. Discard here.
              if (!rHeadKey.anyNull) {
                val t = rTimeRef.eval(rHead)
                rHeadTimeNull = t == null
                rHeadTime = if (rHeadTimeNull) 0L else timeToLong(t)
                done = true
              }
            } else { rHead = null; rHeadKey = null; done = true }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // NULL join keys match nothing (SQL/DuckDB ASOF semantics):
          // emit the null-right row without consuming any right rows.
          if (lKey.anyNull) return toUnsafe(joiner(l, nullRight))
          val lt = lTimeRef.eval(l)
          if (lt == null) return toUnsafe(joiner(l, nullRight))
          val ltv = timeToLong(lt)
          var scanning = true
          while (scanning && rHead != null) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) advanceRight() // right key behind: discard
            else if (c == 0 && !rHeadTimeNull && rHeadTime <= ltv) {
              cand = rHead; candKey = rHeadKey // newest-so-far for this key
              advanceRight()
            } else if (c == 0 && rHeadTimeNull) advanceRight()
            else scanning = false // right ahead of left: stop
          }
          val matched =
            cand != null && keyOrd.compare(candKey, lKey) == 0
          toUnsafe(joiner(l, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the operator. */
object AsofJoinOps {
  /** LEFT-OUTER as-of join: for each left row, the right row with equal
    * join keys and the greatest `rightTime` ≤ `leftTime`. Installs the
    * planner strategy on the session idempotently.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graftx.GraftSqlBridge.ofRows(spark,
      AsofJoin(lPlan, rPlan,
        leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}
