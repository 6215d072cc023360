package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the full custom-operator rung: a resolved
  * [[AsofJoinPlan]] logical node, planned by [[AsofJoinStrategy]]
  * (injected through `SparkSessionExtensions.injectPlannerStrategy`,
  * see [[graft.GraftExtensions]]) into [[AsofJoinExec]], a
  * sort-merge physical operator.
  *
  * Why a physical operator when `Relational.asofJoin`'s union-timeline
  * form already has the right asymptotics: the union form pays for
  * generality in bytes. Every unioned row is padded to the WIDTH OF
  * BOTH SIDES (left rows carry null right-value slots, right rows a
  * null left-struct), the single per-key sort runs over |L|+|R| rows
  * of that widened frame, and the carried match is a struct rebuilt
  * per row by a Window operator. The native exec shuffles each side
  * at its own width, sorts each side separately (two smaller runs
  * instead of one merged run), and streams one forward pass per
  * partition with O(1) state — no widening, no Window buffer, and
  * EnsureRequirements elides the exchange/sort entirely when a side
  * is already hash-partitioned and time-sorted (bucketed feature
  * tables — the shape a 100 TB feature store actually stores).
  *
  * Semantics (identical to `Relational.asofJoin`, pinned by the
  * AsofJoinNativeSpec parity suite and the `events_asof_native*`
  * DuckDB `ASOF JOIN` gates): for each left row, the single right row
  * with equal key and the LARGEST rightTime <= leftTime; matches
  * older than `toleranceUs` are nulled (outer) or dropped (inner);
  * null keys and null times never match (SQL equi-join semantics —
  * note the union-timeline form groups null keys like a groupBy; its
  * callers pre-filter, ours doesn't need to). Right rows should be
  * unique per (key, time): among equal (key, time) right rows the
  * last in sort order wins, which is nondeterministic across retries
  * exactly as documented on the union form.
  *
  * Reference semantics: the event-attribution / feature-enrichment
  * lookup of run_example2template.py-style pipelines; engine shape is
  * original (Spark has no as-of join; pandas-on-Spark rewrites to the
  * union-timeline form, see SPARK-36813 discussion — public API docs).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    inner: Boolean,
    broadcastRight: Option[Boolean] = None) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    s"asof join needs matching key lists: ${leftKeys.size} vs ${rightKeys.size}")
  toleranceUs.foreach(t => require(t > 0, s"toleranceUs must be positive: $t"))

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output
                    else right.output.map(_.withNullability(true)))

  override lazy val resolved: Boolean = {
    val exprs = leftKeys ++ rightKeys :+ leftTime :+ rightTime
    childrenResolved && exprs.forall(_.resolved) &&
      leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType } &&
      leftTime.dataType == LongType && rightTime.dataType == LongType
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsofJoinPlan]] → [[AsofJoinExec]] (sort-merge) or
  * [[AsofBroadcastExec]] (collect + broadcast the right timeline, left
  * untouched). Physical selection mirrors Spark's equi-join choice:
  * `broadcastRight = Some(x)` pins the operator; `None` goes by the
  * right side's estimated size vs `autoBroadcastJoinThreshold` —
  * exactly the dial users already tune for BroadcastHashJoin. At
  * 100 TB the broadcast form is the difference between shuffling the
  * fact table and shuffling NOTHING: a dimension-sized timeline
  * (rates, configs, model rollouts) rides to the executors and the
  * fact side is enriched in place, partitioning and order preserved.
  *
  * Stateless object — safe to register once per session via
  * extensions and once more via `experimental.extraStrategies`
  * (duplicate registrations plan identically; the planner takes the
  * first non-empty result).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      val doBroadcast = p.broadcastRight.getOrElse {
        val threshold =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        threshold > 0 && p.right.stats.sizeInBytes <= threshold
      }
      val exec: SparkPlan =
        if (doBroadcast)
          AsofBroadcastExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
            p.toleranceUs, p.inner, planLater(p.left), planLater(p.right))
        else
          AsofJoinExec(p.leftKeys, p.rightKeys, p.leftTime, p.rightTime,
            p.toleranceUs, p.inner, planLater(p.left), planLater(p.right))
      exec :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join exec.
  *
  * Scale contract: `requiredChildDistribution` co-clusters both sides
  * on the keys (EnsureRequirements inserts compatible hash exchanges,
  * or none when a side is already bucketed on the key), and
  * `requiredChildOrdering` asks each side for (keys…, time) ascending
  * (a per-partition external sort — spills, never OOMs, and is
  * elided for time-sorted bucketed inputs). The merge itself is one
  * forward pass over the two sorted iterators with O(1) retained
  * state per partition (the last in-window right row, copied), so a
  * hot key costs sort I/O only — there is no per-key buffer to blow
  * up, unlike a pair-materializing range join. Output order is the
  * left child's (keys…, time) order and output partitioning the left
  * child's, both exposed so downstream per-key operators reuse the
  * exchange.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    inner: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output
                    else right.output.map(_.withNullability(true)))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val tol = toleranceUs
    val isInner = inner
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      // bind against the OUTPUT attributes (right side nullable when
      // outer) — binding against rightOut's original non-nullable
      // attrs would skip the null check and read the null-pad row as
      // zeros
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // lookahead right row; its key/time are extracted eagerly so
        // the row buffer may be reused by the sorter on the next pull
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _          // copied (proj reuses)
        private var rHeadTime: Long = 0L
        private var rHeadValid = false               // non-null key+time
        // last in-window right row for the CURRENT left key (copied —
        // the only retained state; O(1) per partition)
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _
        private var matchedTime: Long = 0L
        private var nextRow: InternalRow = _

        advanceRight()

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rHead = rIter.next()
            val t = rTimeProj(rHead)
            val k = rKeyProj(rHead)
            rHeadValid = !t.isNullAt(0) && !k.anyNull
            rHeadTime = if (rHeadValid) t.getLong(0) else 0L
            rHeadKey = k.copy()
          } else rHead = null
        }

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val ltRow = lTimeProj(l)
            val ltNull = ltRow.isNullAt(0)
            val lt = if (ltNull) 0L else ltRow.getLong(0)
            // drain right rows at or before (lk, lt): rows with a
            // smaller key are passed forever (left keys ascend), rows
            // with the same key and time <= lt supersede the match
            if (!ltNull && !lk.anyNull) {
              var c = if (rHead != null) keyOrd.compare(rHeadKey, lk) else 1
              while (rHead != null && (c < 0 || (c == 0 && rHeadTime <= lt))) {
                if (c == 0 && rHeadValid) {
                  matched = rHead.copy()
                  matchedKey = rHeadKey
                  matchedTime = rHeadTime
                }
                advanceRight()
                c = if (rHead != null) keyOrd.compare(rHeadKey, lk) else 1
              }
            }
            val ok = !ltNull && !lk.anyNull && matched != null &&
              keyOrd.compare(matchedKey, lk) == 0 &&
              tol.forall(t => lt - matchedTime <= t)
            if (ok) {
              numOutputRows += 1
              return outProj(joined(l, matched))
            } else if (!isInner) {
              numOutputRows += 1
              return outProj(joined(l, nullRight))
            }
            // inner + no fresh match: drop the left row, keep going
          }
          null
        }

        override def hasNext: Boolean = {
          if (nextRow == null) nextRow = computeNext()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }
}

/** Broadcast as-of join exec: the right timeline is collected,
  * grouped per key into a time-sorted array, and broadcast; each left
  * partition enriches its rows in place by hash-lookup + binary
  * search (rightmost time <= left time). Same semantics as
  * [[AsofJoinExec]] — tolerance, inner/outer, null key/time rules,
  * and the same tie rule (among equal (key, time) right rows the last
  * in scan order wins: the per-key sort is STABLE, so later-collected
  * duplicates land later and the rightmost-<= search returns them).
  *
  * Scale contract: the LEFT side requires no distribution and no
  * ordering — zero exchanges, zero sorts; `outputPartitioning` and
  * `outputOrdering` pass the left child's through, so an upstream
  * bucketing or sort survives the join. Memory is bounded by the
  * planner's broadcast threshold exactly as for BroadcastHashJoin:
  * the build structure is O(|right|) per executor (keys are copied
  * UnsafeRows, per-key times live in a primitive long array). The
  * build itself is one pass + per-key sorts = O(|R| log maxGroup).
  */
case class AsofBroadcastExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    inner: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output
                    else right.output.map(_.withNullability(true)))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "buildRows" -> SQLMetrics.createMetric(sparkContext, "broadcast build rows"))

  // no requirements on either side: the right is collected whole, the
  // left streams wherever it already lives
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofBroadcastExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val buildRows = longMetric("buildRows")
    val tol = toleranceUs
    val isInner = inner
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val lTimeExpr = leftTime
    val outAttrs = output

    // driver-side build: one pass to group, stable per-key time sort
    val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
    val rTimeProj = UnsafeProjection.create(Seq(rightTime), rightOut)
    val grouped = new java.util.HashMap[UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
    right.executeCollect().foreach { r =>
      val k = rKeyProj(r)
      val t = rTimeProj(r)
      if (!k.anyNull && !t.isNullAt(0)) {
        var buf = grouped.get(k)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
          grouped.put(k.copy(), buf)
        }
        buf += ((t.getLong(0), r))
        buildRows += 1
      }
    }
    val table = new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])](
      grouped.size())
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1) // stable: ties keep collect order
      table.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    val bcast = sparkContext.broadcast(table)

    left.execute().mapPartitions({ lIter =>
      val tbl = bcast.value
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val ltRow = lTimeProj(l)
        var m: InternalRow = null
        if (!ltRow.isNullAt(0) && !lk.anyNull) {
          val lt = ltRow.getLong(0)
          val entry = tbl.get(lk)
          if (entry != null) {
            val times = entry._1
            // rightmost index with times(i) <= lt
            var lo = 0
            var hi = times.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= lt) lo = mid + 1 else hi = mid
            }
            val idx = lo - 1
            if (idx >= 0 && tol.forall(t => lt - times(idx) <= t))
              m = entry._2(idx)
          }
        }
        if (m != null) {
          numOutputRows += 1
          Iterator.single(outProj(joined(l, m)))
        } else if (!isInner) {
          numOutputRows += 1
          Iterator.single(outProj(joined(l, nullRight)))
        } else Iterator.empty
      }
    }, preservesPartitioning = true)
  }
}
