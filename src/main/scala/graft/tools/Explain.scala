package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dump formatted physical plans for named queries (dev tool):
  *   sbt "runMain graft.tools.Explain sf0.01 q02_top_revenue ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.01")}"
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8)
    // AQE wraps plans in AdaptiveSparkPlan pre-execution, hiding codegen
    // spans; disable it here so the static plan shows codegen ids
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
