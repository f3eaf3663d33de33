package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.datagen.DataGen
import graft.streaming.Sessionize

/** Large-n stress check (dev tool): sessionize synthetic events well beyond
  * the testdata scale to observe throughput and shuffle behavior the bench
  * corpus can't exercise. Rows are generated distributed (spark.range), so
  * n is bounded by time, not driver memory.
  *
  *   sbt "runMain graft.tools.Stress 20000000"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val spark = GraftSession.local(32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name: $rows%,d rows in $secs%.1f s (${n / secs / 1e6}%.1f M events/s)")
    }
    val events = DataGen.syntheticEvents(spark, n)
    time("tumbling sessionize")(
      Sessionize.tumbling(events).count())
    time("gap sessionize")(
      Sessionize.gapSession(events, gap = "5 minutes").count())
    time("user rollup")(
      events.groupBy(col("user_id"))
        .agg(count(lit(1)), countDistinct(col("event_type"))).count())
    spark.stop()
  }
}
