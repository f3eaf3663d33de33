package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datagen.DataGen
import graft.ingest.EventIngest
import graft.model.Models
import graft.streaming.Sessionize

/** One-command Kafka smoke (see tools/kafka_smoke.md): produce synthetic
  * events to a real broker, read them back through the JSON decode path,
  * and stream-sessionize them. NOT runnable in the offline build sandbox —
  * requires a broker and the spark-sql-kafka-0-10 connector on the
  * classpath; every transform downstream of the source is covered
  * broker-free by the test suite (MemoryStream + payload round-trip).
  */
object KafkaSmoke {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: KafkaSmoke <bootstrap-servers> <topic>")
      sys.exit(2)
    }
    val Array(bootstrap, topic) = args.take(2)
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // K1: produce 1,000 synthetic web events
    val events = DataGen.syntheticEvents(spark, n = 1000)
    DataGen.writeKafka(events, bootstrap, topic)
    println(s"[smoke] produced 1000 events to $topic")

    // S1 (batch flavor): read back + decode, verify round-trip fidelity
    val back = spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val decoded = EventIngest.decodeJson(back, Models.webEventSchema)
    val n = decoded.count()
    require(n >= 1000, s"expected >= 1000 decoded rows, got $n")
    require(decoded.where(col("user_id").isNull || col("timestamp").isNull)
      .count() == 0, "JSON decode produced null key fields")
    println(s"[smoke] decoded $n rows OK")

    // ST1-ST6: streaming sessionization from the same topic
    val stream = EventIngest.kafkaSource(spark, bootstrap, topic)
    val q = Sessionize.tumbling(EventIngest.decodeJson(stream, Models.webEventSchema))
      .writeStream.format("memory").queryName("kafka_smoke")
      .outputMode("append").start()
    q.processAllAvailable()
    val emitted = spark.table("kafka_smoke").count()
    // events span ~1 h of 1-min windows with a 10-min watermark, so most
    // windows must have closed — zero emissions means the pipeline is broken
    require(emitted > 0, "streaming sessionization emitted no windows")
    println(s"[smoke] streaming emitted $emitted windows")
    q.stop()
    spark.stop()
    println("[smoke] PASS")
  }
}
