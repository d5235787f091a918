package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Native as-of join — the whole-operator rung of the custom-Catalyst ladder
  * (SURVEY.md §4.3c): logical node + planner strategy + physical exec,
  * installed via `SparkSessionExtensions`.
  *
  * Semantics: for every left row, attach the LATEST right timestamp that is
  * strictly earlier, matching on an equi-key ("what was the last click before
  * this purchase"). The composable formulation (q11: equi-join on key with a
  * range predicate, then max per left row) materializes every
  * (left, earlier-right) PAIR before aggregating — O(Σ_key n_l·n_r) rows,
  * quadratic on active keys at 100 TB. This operator is the plan that join
  * shape actually wants: both sides hash-clustered on the key and sorted by
  * (key, ts) — the same exchange a sort-merge join would pay — then one
  * forward-only merge pass per partition. O(n log n), no pair blow-up, no
  * per-key state beyond one timestamp.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        tsOut: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ tsOut
  // tsOut is minted by this operator, not drawn from a child
  override def producedAttributes: AttributeSet = AttributeSet(tsOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-to-one lowering of [[AsOfJoinPlan]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, out) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Child requirements mirror SortMergeJoinExec: hash-clustered on the key
  * (EnsureRequirements inserts compatible exchanges — or none, if an earlier
  * operator already partitioned this way) and sorted by (key, ts). The merge
  * itself is a single forward pass: the right cursor advances while its row
  * sorts before the current left row's (key, ts), remembering only the last
  * right timestamp seen for the current key — which, because the right side
  * is ts-sorted, IS the strictly-latest earlier match.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        tsOut: AttributeReference) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output :+ tsOut
  override def producedAttributes: AttributeSet = AttributeSet(tsOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lkB = BindReferences.bindReference(leftKey, lOut)
    val ltB = BindReferences.bindReference(leftTs, lOut)
    val rkB = BindReferences.bindReference(rightKey, rOut)
    val rtB = BindReferences.bindReference(rightTs, rOut)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outAttrs, lOut :+ tsOut)
      val joined = new JoinedRow
      val tsRow = new GenericInternalRow(1)
      // right-side cursor state: the last consumed right (key, ts); valid
      // while the current left row shares that key
      var rRow: InternalRow = null
      var rKey = 0L
      var rTs = 0L
      var lastKey = 0L
      var lastTs = 0L
      var hasLast = false
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && ri.hasNext) {
          val cand = ri.next()
          val k = rkB.eval(cand)
          val t = rtB.eval(cand)
          if (k != null && t != null) {
            rRow = cand
            rKey = k.asInstanceOf[Long]
            rTs = t.asInstanceOf[Long]
          } // null key/ts can never match — skip
        }
      }
      advanceRight()
      li.map { lRow =>
        val lkAny = lkB.eval(lRow)
        val ltAny = ltB.eval(lRow)
        if (lkAny == null || ltAny == null) {
          tsRow.setNullAt(0)
        } else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          while (rRow != null && (rKey < lk || (rKey == lk && rTs < lt))) {
            if (rKey == lk) { lastKey = lk; lastTs = rTs; hasLast = true }
            advanceRight()
          }
          if (hasLast && lastKey == lk) tsRow.update(0, lastTs)
          else tsRow.setNullAt(0)
        }
        proj(joined(lRow, tsRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.joinAsOf(purchases, clicks, "user_id", "ts", "ts",
  * "prior_click_ts")`. Keys must be integral, timestamps TimestampType;
  * the output is every left row plus a nullable `outCol` timestamp. */
object AsOf {
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTsCol: String, rightTsCol: String, outCol: String): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Self-join dedup is normally the analyzer's job, but it cannot remap the
    // key/ts expressions inside a node class it does not know. When the two
    // sides share expression ids (both derived from one scan), re-alias every
    // right column up front so the tree is conflict-free before analysis.
    val rPlan =
      if (rPlan0.output.exists(lPlan.outputSet.contains))
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))
    def req(a: Attribute, t: DataType): Attribute = {
      // fail at construction, not as a per-task ClassCastException after the
      // shuffles have already run
      require(a.dataType == t, s"as-of column ${a.name} must be $t, got ${a.dataType}")
      a
    }
    val tsOut = AttributeReference(outCol, TimestampType, nullable = true)()
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        req(attr(lPlan.output, key), LongType),
        req(attr(rPlan.output, key), LongType),
        req(attr(lPlan.output, leftTsCol), TimestampType),
        req(attr(rPlan.output, rightTsCol), TimestampType), tsOut))
  }
}
