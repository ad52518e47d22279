package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class plan node — the whole-operator extension
  * tier (SURVEY §4 preference (c)): Spark has no native as-of join, and the
  * window-function encoding (operators/Relational.joinAsof) forces BOTH
  * relations through one union-shaped window. This node instead declares
  * the operator's true requirements to the planner — hash co-partitioning
  * on the key and (key, ts) sort order on each side — and the physical
  * operator is a single forward-merge pass per partition: for every fact
  * row, the dim row with the greatest ts ≤ fact.ts within the same key
  * (inner, backward-looking — the semantics of DuckDB's ASOF JOIN, kdb's
  * aj, pandas merge_asof). At 100 TB this is exactly one shuffle per side
  * (none if the data is already bucketed by key) and zero buffering beyond
  * one dim row — compare the window encoding, which materializes and sorts
  * the UNION of both tables.
  *
  * Registered via SparkSessionExtensions (GraftExtensions injects
  * [[AsOfJoinStrategy]]); constructed fully-resolved by [[AsOfJoin.join]]
  * from the analyzed child plans, so no analyzer changes are needed.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Children arrive hash-partitioned on the key
  * (EnsureRequirements inserts the exchanges — or elides them when the
  * layout already satisfies the distribution, e.g. bucketed tables) and
  * sorted by (key, ts); the merge keeps exactly one candidate dim row.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (factIter, dimIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsBound = BindReferences.bindReference(leftTs, left.output)
      val rTsBound = BindReferences.bindReference(rightTs, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow

      val dims = dimIter.buffered
      // The single buffered candidate: the dim row (and its key) with the
      // greatest ts ≤ the current fact ts seen so far for the current key.
      var candidate: InternalRow = null
      var candidateKey: InternalRow = null

      factIter.flatMap { fact =>
        val fKey = lKeyProj(fact)
        val fTsV = lTsBound.eval(fact)
        // SQL asof equality semantics: a NULL key matches nothing (DuckDB
        // ASOF JOIN, kdb aj) — RowOrdering's natural ordering would treat
        // two null keys as equal, so null-key rows are skipped explicitly
        // on both sides.
        if (fTsV == null || fKey.anyNull) Iterator.empty
        else {
          val fTs = fTsV.asInstanceOf[Long]
          // Advance the dim side while it is behind (smaller key, or same
          // key with ts ≤ fact ts), remembering the last same-key row.
          var advancing = true
          while (advancing && dims.hasNext) {
            val dim = dims.head
            val dKey = rKeyProj(dim)
            if (dKey.anyNull) { dims.next() } // null dim key never matches
            else {
              val cmp = keyOrd.compare(dKey, fKey)
              val dTsV = rTsBound.eval(dim)
              if (cmp < 0) { dims.next() }
              else if (cmp == 0 && dTsV != null &&
                  dTsV.asInstanceOf[Long] <= fTs) {
                candidate = dim.copy()
                candidateKey = dKey.copy()
                dims.next()
              } else if (cmp == 0 && dTsV == null) { dims.next() }
              else advancing = false
            }
          }
          if (candidate != null && keyOrd.compare(candidateKey, fKey) == 0 &&
              rTsBound.eval(candidate).asInstanceOf[Long] <= fTs)
            Iterator.single(resultProj(joined(fact, candidate)))
          else Iterator.empty
        }
      }
    }
  }
}

object AsOfJoin {
  /** Build the as-of join from analyzed child plans, resolving key/ts
    * columns by name against each side — the node enters the optimizer
    * fully resolved. Column names across the two sides should be disjoint
    * (rename the dim side first), exactly like DataFrame join outputs.
    */
  def join(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      factTs: String, dimTs: String): DataFrame = {
    val s: SparkSession = fact.sparkSession
    val lPlan = fact.queryExecution.analyzed
    val rPlan = dim.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    // The merge compares timestamps as raw Longs — reject any ts column
    // whose runtime representation is not Long-backed up front, instead of
    // a ClassCastException deep inside an executor task.
    def requireLongBacked(a: Attribute, side: String): Attribute = {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      a.dataType match {
        case TimestampType | TimestampNTZType | LongType => a
        case other => throw new IllegalArgumentException(
          s"as-of $side ts column ${a.name} must be TIMESTAMP/TIMESTAMP_NTZ/BIGINT, got $other " +
            "(cast it before the join)")
      }
    }
    GraftSqlBridge.ofRows(s, AsOfJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, factKey)), Seq(attr(rPlan, dimKey)),
      requireLongBacked(attr(lPlan, factTs), "fact"),
      requireLongBacked(attr(rPlan, dimTs), "dim")))
  }
}
