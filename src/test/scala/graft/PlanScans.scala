package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plan walk for the pruning/pushdown audits: every parquet
  * leaf scan under an (adaptive) physical plan. ONE definition across
  * the test suites — a Spark upgrade that wraps plans in a new AQE
  * node is a one-file fix.
  */
object PlanScans {
  def leafScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => leafScans(a.executedPlan)
    case q: QueryStageExec => leafScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(leafScans)
  }

  /** Every shuffle exchange under an (adaptive) physical plan — the
    * walk the exchanges-carry-ids-only audits need: logical plans
    * have no Exchange nodes at all, so a shuffled-width claim checked
    * on `optimizedPlan` is vacuous. */
  def shuffles(p: SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
    p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }
}
