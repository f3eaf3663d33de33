package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Ad-hoc single-query timer: runs each named query N times against a
  * directory through the noop sink and prints per-run seconds. Dev tool.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    sys.props.getOrElseUpdate("graft.memo.durable",
      sys.env.getOrElse("SPARK_GRAFT_MEMO_DURABLE", "true"))
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args; r <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      println(f"$name run$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
