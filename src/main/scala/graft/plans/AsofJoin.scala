package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the whole-operator tier of SURVEY §2's custom-op
  * preference order (a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * injected via `SparkSessionExtensions`), used where composing built-ins
  * can't express the PLAN we want: for each left row, the single latest
  * right row of the same key strictly before it in the order columns.
  *
  * The compose-based alternatives each pay something this operator doesn't:
  * a lag-window self-union (q_join_asof) carries BOTH relations through one
  * window sort and can only look up the same relation; a range-bucketed
  * join (q_join_range's shape) explodes probes and re-filters. This exec
  * declares SortMergeJoin's exact distribution + ordering requirements
  * (ClusteredDistribution on the key, sort by key ++ order on both sides),
  * so Catalyst plans ONE co-partitioned shuffle per side, reuses any
  * existing compatible partitioning, and the merge itself is a single
  * forward pass holding ONE buffered candidate row — O(1) memory per
  * partition beyond the sorts, no window buffer, no probe amplification.
  * At 100 TB it scales exactly as SMJ does (spill-able external sorts,
  * AQE-sized shuffle), and a hot key costs one reducer a linear scan, not
  * a quadratic pair set.
  *
  * Left-outer semantics: unmatched left rows null-extend the right side.
  * The right order columns must totally order rows within a key (callers
  * pass a unique tiebreaker, e.g. (ts_us, event_id)) — then "latest
  * strictly-prior" is unique and the operator is deterministic.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    allowExact: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved &&
    (leftKeys ++ rightKeys ++ leftOrder ++ rightOrder).forall(_.resolved) &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftOrder.map(_.dataType) == rightOrder.map(_.dataType)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]; a no-op for every other node. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lo, ro, fwd, tol, exact) =>
      AsofJoinExec(lk, rk, lo, ro, fwd, tol, exact, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children arrive hash-clustered on the key and
  * sorted by key ++ order (declared below, enforced by EnsureRequirements
  * like any shuffled join); the merge advances the right iterator while it
  * is before the current left row, remembering only the LAST right row
  * seen per key — the backward as-of match by construction. In `forward`
  * mode no candidate is buffered at all: the lookahead row itself is the
  * first at-or-after match. `tolerance` bounds the match distance on the
  * FIRST order column (an integer domain — both sides must be LongType);
  * `allowExact` shifts the strict inequality to ≤ (backward) / ≥
  * (forward), the pandas merge_asof knob. All three are per-row O(1) on
  * top of the same single merge pass — direction and tolerance change
  * WHICH comparison runs, not the pass structure, so the 100 TB cost
  * model (two spill-able sorts, one co-partitioned shuffle each side) is
  * identical for every variant. */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    forward: Boolean,
    tolerance: Option[Long],
    allowExact: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortOrders(keys: Seq[Expression], ord: Seq[Expression]): Seq[SortOrder] =
    (keys ++ ord).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortOrders(leftKeys, leftOrder), sortOrders(rightKeys, rightOrder))

  // rows stream out in left order, one per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = sortOrders(leftKeys, leftOrder)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val ordTypes = leftOrder.map(_.dataType)
    val (lKeyEx, rKeyEx, lOrdEx, rOrdEx) = (leftKeys, rightKeys, leftOrder, rightOrder)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // executor-side codegen, the same way SortMergeJoinExec builds its
      // key generators and orderings
      val lkGen = UnsafeProjection.create(lKeyEx, lOut)
      val loGen = UnsafeProjection.create(lOrdEx, lOut)
      val rkGen = UnsafeProjection.create(rKeyEx, rOut)
      val roGen = UnsafeProjection.create(rOrdEx, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val joined = new JoinedRow
      // bind against nullable-marked right attrs: the join is left-outer, so
      // the projection must null-check right columns even when the child
      // declared them non-nullable (binding against rOut as-is would codegen
      // an unchecked read and surface null-extended longs as 0)
      val outProj = UnsafeProjection.create(allOut, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val (isFwd, tol, exact) = (forward, tolerance, allowExact)
      new Iterator[InternalRow] {
        // lookahead right row, copied out of the iterator's reused buffers
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rOrd: InternalRow = _
        private var haveR = false
        // backward only: latest right row (strictly/at-or) before the
        // current left row
        private var cand: InternalRow = _
        private var candKey: InternalRow = _
        private var candOrd: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val raw = rIter.next()
            rKey = rkGen(raw).copy()
            rOrd = roGen(raw).copy()
            rRow = raw.copy()
            haveR = true
          } else haveR = false

        // tolerance gates the distance on the FIRST order column; `later`
        // and `earlier` are in match direction, so the diff is ≥ 0
        private def within(later: InternalRow, earlier: InternalRow): Boolean =
          tol.forall(t => later.getLong(0) - earlier.getLong(0) <= t)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lkGen(lRow) // valid until the next lkGen call
          val lOrd = loGen(lRow)
          var advancing = true
          while (haveR && advancing) {
            val ck = keyOrd.compare(rKey, lKey)
            // rows the CURRENT left row has passed: backward keeps the
            // last of them as the candidate, forward just skips them (a
            // skipped row can never match a later left row — left order
            // is ascending). Equal-order rows belong to the passed side
            // exactly when the mode's inequality is satisfied by them.
            val passed = ck < 0 || (ck == 0 && {
              val c = ordOrd.compare(rOrd, lOrd)
              c < 0 || (c == 0 && (if (isFwd) !exact else exact))
            })
            if (passed) {
              if (!isFwd) { cand = rRow; candKey = rKey; candOrd = rOrd }
              advanceRight()
            } else advancing = false
          }
          val out =
            if (isFwd) {
              // the lookahead row is the first at-or-after by construction
              val m = haveR && keyOrd.compare(rKey, lKey) == 0 && within(rOrd, lOrd)
              if (m) rRow else nullRight
            } else {
              val m = cand != null && keyOrd.compare(candKey, lKey) == 0 &&
                within(lOrd, candOrd)
              if (m) cand else nullRight
            }
          outProj(joined(lRow, out))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public builder: `AsofJoin.join(left, right, keys, order)` appends to each
  * left row the latest strictly-prior right row of the same key (null-extended
  * when none). Column pairs are (leftName, rightName); sides must not share
  * output column names (rename the right side first, the q_join_range idiom). */
object AsofJoin {

  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      order: Seq[(String, String)],
      forward: Boolean = false,
      tolerance: Option[Long] = None,
      allowExact: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "as-of join sides must not share column names — rename the right side")
    tolerance.foreach(t => require(t >= 0, s"as-of tolerance must be >= 0, got $t"))
    val lPlan = left.queryExecution.analyzed
    // re-alias every right column: fresh exprIds make a self-as-of
    // unambiguous without relying on analyzer-side deduplication of a
    // node it doesn't know
    val rPlan = right.select(right.columns.toIndexedSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*).queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column `$name` not found among ${plan.output.map(_.name).mkString(", ")}"))
    val lOrd = order.map(o => resolve(lPlan, o._1))
    if (tolerance.isDefined)
      require(lOrd.head.dataType == org.apache.spark.sql.types.LongType &&
        resolve(rPlan, order.head._2).dataType == org.apache.spark.sql.types.LongType,
        "as-of tolerance applies to the first order column, which must be BIGINT " +
          s"on both sides (got ${lOrd.head.dataType})")
    val plan = AsofJoinPlan(lPlan, rPlan,
      keys.map(k => resolve(lPlan, k._1)), keys.map(k => resolve(rPlan, k._2)),
      lOrd, order.map(o => resolve(rPlan, o._2)),
      forward, tolerance, allowExact)
    org.apache.spark.sql.classic.GraftSqlInternal.ofRows(spark, plan)
  }
}
