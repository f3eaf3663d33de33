package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(FormattedMode).split("\n").take(45).mkString("\n"))
    }
    spark.stop()
  }
}
