package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** The whole-operator extension path (SURVEY §5: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`): a native backward as-of join.
  *
  * Semantics (identical to `Analytics.asofJoin`, the composed
  * union+window form): for every left row, attach the LATEST right row
  * of the same key with `right.ts <= left.ts`, or nulls when none
  * exists. The composed form pays one union + one
  * last(ignoreNulls)-over-window pass; this native operator instead
  * declares the join's true requirements to the planner — co-partition
  * both sides on the key, sort each by (key, ts) — and then streams the
  * two sorted iterators through a single forward-only merge per
  * partition: no union row blow-up, no window state, right rows
  * consumed once and never buffered beyond the one candidate row.
  *
  * Scale shape: exactly a sort-merge join's wiring (EnsureRequirements
  * inserts the exchanges/sorts; AQE still re-plans the shuffles), with
  * O(1) memory per partition beyond the sort. The merge itself is the
  * textbook as-of scan: both sides ascend by (key, ts), so a right row
  * behind the current left key is dead (left keys only grow) and a
  * right row ahead of it parks as the lookahead.
  */
object AsOf {

  /** Backward as-of join of `left` with `right` on `key`, matching the
    * latest right row with ts ≤ the left row's ts. Output = left columns
    * followed by right columns (nullable); the caller disambiguates
    * duplicate names by aliasing before the call.
    *
    * Installs [[AsOfJoinStrategy]] into the session's experimental
    * strategies idempotently — `GraftExtensions` also injects it for
    * `spark.sql.extensions` users.
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    // Batch-only by design (SURVEY §4): planned per-microbatch this
    // exec would carry no state across batches — a left row arriving
    // after its right match's microbatch would silently miss it. The
    // streaming tier is the keyed-state shape, not the merge shape.
    require(!left.isStreaming && !right.isStreaming,
      "AsOf.join is batch-only: the merge exec assumes both sides complete and " +
        "sorted; for streams use graft.streaming.StreamAsOf (latest-right-per-key " +
        "state + watermark reorder)")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rpRaw = right.queryExecution.analyzed
    // Self-join-shaped inputs (both sides derived from one source) share
    // attribute ids; the analyzer's DeduplicateRelations would re-alias
    // the right child WITHOUT rewriting this custom node's expressions
    // (it only knows how to do that for built-in nodes). Re-alias the
    // right side ourselves first, so the node is built against the ids
    // that will actually execute.
    val rp: LogicalPlan =
      if (lp.outputSet.intersect(rpRaw.outputSet).isEmpty) rpRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rpRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rpRaw)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, key), attr(rp, key), attr(lp, ts), attr(rp, ts)))
  }
}

/** Logical node: resolved by construction (its expressions are the
  * children's own attribute references). The optimizer leaves unknown
  * nodes alone, so nothing is pushed through it — callers project/filter
  * before the join.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: one physical candidate for the logical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Declares ClusteredDistribution on the key
  * for both children (EnsureRequirements co-partitions them — the same
  * contract SortMergeJoin uses) and (key, ts) ascending child orderings,
  * then merges per partition.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // Codegen'd orderings/projections are per-partition state — they
      // are not serializable and must be instantiated on the executor.
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val lkProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
      val ltProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rkProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
      val rtProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      // Bind against a NULLABLE view of the right side: an unmatched
      // left row carries an all-null right row, and binding to the
      // child's original non-nullable attributes would elide the null
      // checks and read garbage from the empty slots.
      val resultProj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)
      var lookahead: InternalRow = null          // right row not yet folded
      var candidate: InternalRow = null          // latest right row ≤ current left
      var candidateKey: InternalRow = null
      lIt.map { lRow =>
        val lKey = lkProj(lRow).copy()
        val lTs = ltProj(lRow).copy()
        // SQL join semantics: NULL never matches. The natural row
        // ordering would otherwise treat NULL keys as equal (and sort
        // them first), silently pairing null-key rows across sides — a
        // null-key/ts left row takes the null-right output without
        // consuming the right side.
        if (lKey.isNullAt(0) || lTs.isNullAt(0)) {
          resultProj(joined(lRow, nullRight))
        } else {
          var scanning = true
          while (scanning && (lookahead != null || rIt.hasNext)) {
            if (lookahead == null) lookahead = rIt.next().copy()
            val rk = rkProj(lookahead)
            if (rk.isNullAt(0) || rtProj(lookahead).isNullAt(0)) {
              lookahead = null // a null-key/ts right row matches nothing
            } else {
              val cmp = keyOrd.compare(rk, lKey)
              if (cmp < 0) {
                // Behind the current left key — left keys only grow, so
                // it can never match again.
                lookahead = null
              } else if (cmp == 0 && tsOrd.compare(rtProj(lookahead), lTs) <= 0) {
                candidate = lookahead
                candidateKey = rkProj(candidate).copy()
                lookahead = null
              } else {
                scanning = false // right side is ahead — park it
              }
            }
          }
          val matched = candidate != null && keyOrd.compare(candidateKey, lKey) == 0
          resultProj(joined(lRow, if (matched) candidate else nullRight))
        }
      }
    }
  }
}
