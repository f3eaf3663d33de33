package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SyntheticEventsSourceSpec extends SparkTestBase {

  private def read(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.SyntheticEventsSource")
      .option("rows", rows).option("numPartitions", parts).load()

  test("generates the requested rows across partitions with valid domains") {
    val df = read(10000, parts = 8)
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 8)
    val types = df.select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("page_view", "click", "add_to_cart", "purchase"))
    assert(df.select(countDistinct(col("user_id"))).head.getLong(0) <= 50)
    // deterministic across reads
    assert(read(10000, 8).exceptAll(df).count() === 0)
  }

  test("range filters on event_seq are pushed into partition planning") {
    val df = read(1000000, parts = 16)
      .where(col("event_seq") >= 100 && col("event_seq") < 200)
    // pushdown shrinks the generated range: visible in the scan description
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("range=[100,200)"), s"pushdown missing in:\n$scan")
    assert(df.count() === 100)
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000).select("url")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("cols=url"), s"pruning missing in:\n$scan")
    assert(df.distinct().count() === 5)
  }

  test("streams through the standard pipeline: sessionize the source") {
    val sessions = graft.streaming.Sessionize.tumbling(
      read(5000).drop("event_seq"))
    assert(sessions.agg(sum(col("number_of_events"))).head.getLong(0) === 5000L)
  }
}
