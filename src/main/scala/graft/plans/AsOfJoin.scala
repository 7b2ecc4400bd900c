package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.TimestampType

/** As-of join as a first-class operator: full custom stack —
  * LogicalPlan node -> planner Strategy -> physical sorted-merge
  * SparkPlan (SURVEY.md §2.7; the (c) extension path of the build
  * contract). Semantics: for every left row, the greatest right
  * `time` with the same key that is <= the left row's time
  * (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`).
  *
  * Physical algorithm: both sides hash-partitioned on the key
  * (`ClusteredDistribution`, so EnsureRequirements co-partitions them
  * exactly like a sort-merge join) and sorted (key, time) within
  * partitions; one linear merge pass per partition tracks only the
  * last-seen right (key, time) — O(n+m), zero buffering, no point
  * lookups. At 100 TB: one shuffle per side, same cost envelope as
  * any equi-join of the two tables.
  *
  * Current scope (all the fixture needs; lift by widening the binder):
  * LongType keys, TimestampType times, inner attributes referenced by
  * name. The union+window formulation (Relational.q16) remains as the
  * built-in-only alternative; q19 verifies this operator against the
  * same DuckDB ASOF oracle.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    matchedTime: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedTime
  // matchedTime is produced by this node, not read from the children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedTime)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.matchedTime) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    matchedTime: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedTime

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val matchCell = new GenericInternalRow(1)
      // only the scalars of the right cursor are retained — rows
      // themselves are never buffered
      var rHasHead = false
      var rHeadKey = 0L
      var rHeadTime = 0L
      def advanceRight(): Unit = {
        rHasHead = false
        while (!rHasHead && rIter.hasNext) {
          val r = rIter.next()
          val k = rKey.eval(r); val t = rTime.eval(r)
          if (k != null && t != null) {
            rHeadKey = k.asInstanceOf[Long]
            rHeadTime = t.asInstanceOf[Long]
            rHasHead = true
          }
        }
      }
      advanceRight()
      var haveMatch = false
      var matchKey = 0L
      var matchTime = 0L
      lIter.map { lRow =>
        val lk = lKey.eval(lRow); val lt = lTime.eval(lRow)
        if (lk == null || lt == null) matchCell.setNullAt(0)
        else {
          val lkL = lk.asInstanceOf[Long]; val ltL = lt.asInstanceOf[Long]
          while (rHasHead &&
            (rHeadKey < lkL || (rHeadKey == lkL && rHeadTime <= ltL))) {
            matchKey = rHeadKey; matchTime = rHeadTime; haveMatch = true
            advanceRight()
          }
          if (haveMatch && matchKey == lkL) matchCell.update(0, matchTime)
          else matchCell.setNullAt(0)
        }
        project(joined(lRow, matchCell))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

object AsOf {
  /** As-of join `left` to `right`: adds `outName` = greatest
    * right(timeCol) per key at-or-before the left row's time (null if
    * none). Key columns must be LongType, time columns TimestampType. */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           key: String, time: String, outName: String): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = leftDf.queryExecution.analyzed
    // re-alias the right side so its exprIds are fresh — left and
    // right may scan the same table, and a shared exprId would make
    // the key references ambiguous (self-join problem)
    val rPlan = rightDf
      .select(rightDf.columns.map(c => rightDf(c).as(c)).toIndexedSeq: _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, time), attr(rPlan, time),
      AttributeReference(outName, TimestampType, nullable = true)())
    shims.ofRows(spark, node)
  }
}
