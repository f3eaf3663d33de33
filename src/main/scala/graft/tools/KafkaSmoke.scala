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
    println(s"[smoke] streaming emitted ${spark.table("kafka_smoke").count()} windows")
    q.stop()
    spark.stop()
    println("[smoke] PASS")
  }
}
