package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.types.LongType

/** Whole-operator custom plan (SURVEY §7.3 ladder, step (c)): the as-of
  * join as its own `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * WHY a physical operator when [[graft.operators.AlignJoin.asOfJoin]]
  * already composes the same semantics from built-ins: the composed form
  * UNIONS both sides and runs a window carry over left+right rows — every
  * left row is materialized inside the window buffer alongside the right
  * rows, and the carried payload columns travel through the union as
  * NULL-padded extra columns. The native operator keeps the sides apart:
  * each shuffles ONCE on the key (the same exchange the window needed),
  * sorts by (key, time) — both planned by Spark's own EnsureRequirements
  * machinery via `requiredChildDistribution`/`requiredChildOrdering`, so
  * AQE, reused exchanges, and skew handling all still apply — and then a
  * single forward merge pass per partition pairs each left row with the
  * latest right row at-or-before it. No union, no NULL-column padding, no
  * window buffer: O(1) state per key (the one buffered match), the
  * streaming-merge shape a 100 TB as-of join wants.
  *
  * POSITIONAL CONTRACT (why the node stores indices, not Attributes):
  * analyzer/optimizer rules that regenerate attribute ids (e.g.
  * relation deduplication when both sides read the same source) rewrite
  * child subtrees generically but cannot be assumed to rewrite an opaque
  * node's stored `Attribute` fields. The node therefore pins COLUMN
  * POSITIONS — right output is `[keys..., time, payload...]`, left key /
  * time positions are explicit — and derives the live attributes from
  * `children.output` on demand, so any id rewrite below is self-healing.
  * The wrapper [[AsOfNative.asOfJoin]] establishes the layout with
  * explicit projections.
  *
  * Semantics (identical to the composed operator, spec-asserted): per
  * key, each left row pairs with the latest right row with
  * `rightTime <= leftTime`; ties on equal rightTime are pre-resolved by
  * the caller-supplied tiebreak; an optional `tolerance` nulls matches
  * older than `leftTime - tolerance`. Time columns must be LongType
  * (epoch micros — the engine's ordering convention).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeyIdx: Seq[Int],
    leftTimeIdx: Int,
    tolerance: Option[Long],
    payloadOut: Seq[Attribute])
  extends BinaryNode {

  def leftKeys: Seq[Attribute] = leftKeyIdx.map(left.output)
  def leftTime: Attribute = left.output(leftTimeIdx)
  def rightKeys: Seq[Attribute] = right.output.take(leftKeyIdx.size)
  def rightTime: Attribute = right.output(leftKeyIdx.size)
  def payload: Seq[Attribute] = right.output.drop(leftKeyIdx.size + 1)

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // consumes every child column (the wrapper pre-prunes both sides)
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)
  // the asof_* columns are minted here, not read from a child
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate, the merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfMergeJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeyIdx, n.leftTimeIdx, n.tolerance, n.payloadOut) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeyIdx: Seq[Int],
    leftTimeIdx: Int,
    tolerance: Option[Long],
    payloadOut: Seq[Attribute])
  extends BinaryExecNode {

  private def leftKeys = leftKeyIdx.map(left.output)
  private def leftTime = left.output(leftTimeIdx)
  private def rightKeys = right.output.take(leftKeyIdx.size)
  private def rightTime = right.output(leftKeyIdx.size)
  private def payload = right.output.drop(leftKeyIdx.size + 1)

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // both sides hash-cluster on the full key list; EnsureRequirements
  // inserts the exchanges AND makes the two sides' partitioning
  // compatible (same mechanism SortMergeJoin relies on)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true, None) :: Nil

  // in-partition (key, time) order on both sides — planned as SortExec
  // by EnsureRequirements when a child isn't already sorted
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through 1:1 in order, so the left child's layout
  // survives the operator — consumers can reuse it
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tol = tolerance
    val payloadWidth = payloadOut.size
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = payload
    val lOut = left.output
    val rOut = right.output
    val outTypes = output.map(_.dataType).toArray
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
        // time columns are REQUIRED LongType at fixed ordinals (the node's
        // positional contract), so read them unboxed — a bound-reference
        // eval() here boxes one java.lang.Long PER ROW on the hot path
        val lTimeAt = lOut.indexWhere(_.exprId == lTimeExpr.exprId)
        val rTimeAt = rOut.indexWhere(_.exprId == rTimeExpr.exprId)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val resultProj = UnsafeProjection.create(outTypes)
        val joined = new JoinedRow
        val nullPayload = new GenericInternalRow(payloadWidth)

        new Iterator[InternalRow] {
          private var rHead: InternalRow = _
          private var prevLeftKey: UnsafeRow = _
          private var matchTime: Long = 0L
          private var matchPayload: UnsafeRow = _

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            // the buffered match belongs to the PREVIOUS left key; on a
            // key change it is stale by construction (left is key-sorted),
            // so invalidate here instead of copying+comparing the match's
            // own key per row — one compare against the previous left key
            // (copied once per KEY GROUP, not per right match) replaces
            // the per-row matchKey copy the first version paid
            if (prevLeftKey == null || keyOrd.compare(prevLeftKey, lk) != 0) {
              matchPayload = null
              prevLeftKey = lk.copy()
            }
            // advance the right side up to (key, time): every right row
            // at-or-before the current left row updates the buffered
            // match (later rows at the same key overwrite earlier — the
            // "latest" convention), rows for earlier keys are discarded
            if (!l.isNullAt(lTimeAt)) {
              val lt = l.getLong(lTimeAt)
              var continue = true
              while (continue) {
                if (rHead == null) {
                  if (rIter.hasNext) rHead = rIter.next() else continue = false
                }
                if (rHead != null) {
                  val rk = rKeyProj(rHead)
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) rHead = null // behind the current key
                  else if (c == 0) {
                    if (rHead.isNullAt(rTimeAt)) rHead = null // unordered: unusable
                    else {
                      val rt = rHead.getLong(rTimeAt)
                      if (rt <= lt) {
                        matchTime = rt
                        matchPayload = payloadProj(rHead).copy()
                        rHead = null
                      } else continue = false // future row: keep for later
                    }
                  } else continue = false // right already at a later key
                }
              }
              val valid = matchPayload != null &&
                tol.forall(t => lt - matchTime <= t)
              resultProj(joined(l, if (valid) matchPayload else nullPayload))
            } else resultProj(joined(l, nullPayload))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the custom plan — signature-compatible with
  * [[graft.operators.AlignJoin.asOfJoin]] (same semantics, same output
  * columns `asof_<c>`), so callers can swap implementations. */
object AsOfNative {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String],
               rightTiebreak: Seq[String] = Nil,
               tolerance: Option[Long] = None): DataFrame = {
    // tie resolution identical to the composed operator: one row per
    // (keys, rightTime), largest tiebreak tuple wins — same shuffle key
    // as the merge join's own exchange
    val rightDedup =
      if (rightTiebreak.isEmpty) right
      else right.withColumn("__dup_rn", row_number().over(
          Window.partitionBy((keys :+ rightTime).map(col): _*)
            .orderBy(rightTiebreak.map(c => col(c).desc): _*)))
        .where(col("__dup_rn") === 1).drop("__dup_rn")
    // establish the positional contract: right = [keys..., time,
    // payload...]. The aliases also mint fresh attribute ids, keeping the
    // node's children disjoint even when both sides read one source (the
    // opaque node cannot rely on analyzer relation-dedup to rewrite it).
    val rPruned = rightDedup.select(
      ((keys :+ rightTime) ++ rightCols).map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rPruned.queryExecution.analyzed
    // resolve names the way Spark's analyzer would (spark.sql.caseSensitive,
    // default insensitive), and REJECT ambiguity: a bare first-match
    // indexWhere would silently key/time the join on the first of two
    // same-named columns — the positional contract below makes that a
    // wrong-answer bug, not an analyzer error, so fail loudly here instead
    val nameEq: (String, String) => Boolean =
      if (left.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean) _ == _
      else _.equalsIgnoreCase(_)
    def idx(out: Seq[Attribute], name: String): Int = {
      val matches = out.zipWithIndex.collect { case (a, i) if nameEq(a.name, name) => i }
      require(matches.nonEmpty, s"column $name not found in ${out.map(_.name)}")
      require(matches.size == 1,
        s"column $name is ambiguous (${matches.size} matches) in ${out.map(_.name)}; " +
          "alias the duplicate columns before the as-of join")
      matches.head
    }
    def attrOf(out: Seq[Attribute], name: String): Attribute = out(idx(out, name))
    val lt = lPlan.output(idx(lPlan.output, leftTime))
    val rt = rPlan.output(keys.size)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType (epoch micros), got ${lt.dataType}/${rt.dataType}")
    // the merge compares keys with an ordering built from the LEFT key
    // types — a silently mismatched right type (e.g. int vs long) would
    // compare raw slots and mis-join rather than fail, so reject here
    keys.foreach { k =>
      val (l, r) = (attrOf(lPlan.output, k), attrOf(rPlan.output, k))
      require(l.dataType == r.dataType,
        s"as-of key '$k' type mismatch: left ${l.dataType} vs right ${r.dataType}")
    }
    val payloadOut = rPlan.output.drop(keys.size + 1).map(a =>
      AttributeReference("asof_" + a.name, a.dataType, nullable = true)())
    GraftSqlShims.ofRows(left.sparkSession,
      AsOfJoinNode(lPlan, rPlan,
        keys.map(k => idx(lPlan.output, k)), idx(lPlan.output, leftTime),
        tolerance, payloadOut))
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` (inclusive) — "the next reading at-or-after
    * t", pandas merge_asof's `direction='forward'`. Implemented by
    * running the backward merge on NEGATED times: order reversal maps
    * least-rt≥t to greatest-(−rt)≤(−t) EXACTLY, including the inclusive
    * boundary, and `tolerance` becomes the lookahead bound
    * (`rightTime − leftTime <= tolerance` nulls beyond it) through the
    * same `lt − matchTime` check. Same custom plan, same single
    * key-shuffle, same merge exec — zero new execution code. Equal-time
    * tie resolution keeps the convention of the backward form: one row
    * per (keys, rightTime), LARGEST `rightTiebreak` tuple wins. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      rightCols: Seq[String],
                      rightTiebreak: Seq[String] = Nil,
                      tolerance: Option[Long] = None): DataFrame = {
    val ln = left.withColumn(leftTime, -col(leftTime))
    val rn = right.withColumn(rightTime, -col(rightTime))
    asOfJoin(ln, rn, keys, leftTime, rightTime, rightCols, rightTiebreak, tolerance)
      .withColumn(leftTime, -col(leftTime))
  }
}
