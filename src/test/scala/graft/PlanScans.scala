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
}
