package graft.tools

import graft.core.GraftSession

/** Per-operator metric dump for a named SparkEntry query (dev tool):
  * executes the query's OWN queryExecution via executeCollect (the noop
  * sink would re-plan a second execution whose metrics this tool cannot
  * see) and prints each physical operator with its populated SQL metrics
  * — numOutputRows, pipelineTime, numPartitions, shuffle sizes. The
  * r13 q75 diagnosis (AQE coalescing a compute-bound stage to one
  * partition) was invisible in the formatted plan but one line here.
  *
  *   sbt "runMain graft.tools.StageMetrics sf0.1 q118_excise_contamination"
  */
object StageMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.1")}"
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: StageMetrics <sf> <queryName> [more...]")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup so codegen/session costs don't pollute the timings
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val n = df.queryExecution.executedPlan.executeCollect().length
      println(f"\n========== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows ==========")
      def dump(p: org.apache.spark.sql.execution.SparkPlan, indent: Int): Unit = {
        val interesting = Set("numOutputRows", "pipelineTime", "numPartitions",
          "numCoalescedPartitions", "partitionDataSize", "dataSize", "collectTime",
          "buildTime", "broadcastTime", "shuffleBytesWritten", "shuffleRecordsWritten",
          "scanTime", "numFiles", "spillSize", "peakMemory", "sortTime",
          "aggTime", "avgHashProbe")
        val m = p.metrics.collect {
          case (k, v) if interesting(k) && v.value != 0 => s"$k=${v.value}"
        }.mkString(", ")
        println("  " * indent + p.nodeName + (if (m.isEmpty) "" else s"  [$m]"))
        p.children.foreach(dump(_, indent + 1))
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            dump(a.executedPlan, indent + 1)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            dump(q.plan, indent + 1)
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
            () // child already walked via children
          case _ => ()
        }
      }
      dump(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
