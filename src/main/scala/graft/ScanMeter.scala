package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Diagnostic helper (tests + stress tools): execute a DataFrame and read back its parquet scans'
  * `numOutputRows` — the rows that SURVIVED parquet row-group/page
  * skipping and reached Spark. The I/O-side evidence for the layout
  * specs (q382 zone maps, q383 bloom filters).
  */
trait ScanMeter {

  /** All FileSourceScan nodes of an EXECUTED plan, through AQE stages. */
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case o => (o.children ++ o.subqueries).flatMap(fileScans)
  }

  /** Execute `df` and return (result rows, scans' numOutputRows sum). */
  def runAndMeter(df: DataFrame): (Set[Seq[Any]], Long) = {
    val rows = df.collect().map(_.toSeq).toSet
    val ss = fileScans(df.queryExecution.executedPlan)
    assert(ss.nonEmpty, "expected a FileSourceScan in the executed plan")
    (rows, ss.map(_.metrics("numOutputRows").value).sum)
  }
}
