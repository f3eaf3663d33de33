package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ingest.EventIngest
import graft.lake.Lake
import graft.streaming.Sessionize

/** End-to-end streaming demo: JSON file stream → decode/enrich (P1-P11) →
  * partitioned parquet lake (K2) → batch read-back + windowed sessionization
  * (ST1-ST9 shape, broker-free). Run:
  *   sbt "runMain graft.StreamDemo /tmp/graft_demo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(Files.createTempDirectory("graft_demo").toString)
    val in = s"$base/in"; val lake = s"$base/lake"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))

    val spark = GraftSession.local()
    // drop a batch of reference-shaped events into the source dir
    val sample = (0 until 100).map { i =>
      val cat = if (i % 5 == 0) "null" else s""""electronics.smartphone.v$i""""
      s"""{"user_id":"u${i % 7}","event_type":"${if (i % 11 == 0) "purchase" else "view"}",
         |"product_id":"p$i","event_time":"2019-10-01 12:${i % 60}:00 UTC",
         |"category_id":"c${i % 3}","category_code":$cat,"brand":"b","price":"${i * 1.5}",
         |"user_session":"s${i % 13}"}""".stripMargin.replaceAll("\n", "")
    }
    Files.write(Paths.get(s"$in/events.json"),
      sample.mkString("\n").getBytes("UTF-8"))

    // stream: file source → enrich → partitioned parquet sink
    val stream = EventIngest.enrich(
      EventIngest.jsonFileSource(spark, in))
    val q = Lake.startStreamingSink(stream, lake, ckpt)
    q.processAllAvailable()
    q.stop()

    // read back with partition pruning and summarize; the partition value
    // must come from Spark's current_date() (session TZ = UTC) — the JVM's
    // LocalDate.now uses the machine zone and can be a day off
    val today = spark.range(1).select(current_date().cast("string"))
      .collect().head.getString(0)
    val silver = Lake.readPartition(spark, lake, "extracted_date", today)
    println(s"[demo] silver rows: ${silver.count()}")
    silver.groupBy(col("main_category")).count().orderBy(col("main_category"))
      .show(5, truncate = false)

    // windowed sessionization of the same events (batch mode, ts column renamed)
    val sessions = Sessionize.tumbling(
      silver.select(col("user_id"), col("event_type"),
        lit("/demo").as("url"), col("event_time").as("timestamp"),
        lit("organic").as("utm_source")))
    println(s"[demo] sessions: ${sessions.count()}")
    sessions.orderBy(col("user_id"), col("window_start")).show(5, truncate = false)
    spark.stop()
  }
}
