package graft.tools

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import graft.core.{GraftSession, Tables}

/** Storage-codec audit (dev tool): writes the largest fact table
  * (lineitem) at a given SF in each candidate (format, codec) pair and
  * reports on-disk bytes plus write and full-scan read times. The
  * storage decision that dominates a 100 TB lake's cost: codec choice
  * moves footprint by ~2× and scan CPU by ~1.5× — this prints the
  * actual trade on this corpus rather than folklore.
  *
  *   sbt "runMain graft.tools.CodecAudit /root/testdata/sf0.1"
  */
object CodecAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(16)
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.lineitem(spark, sfDir)
    df.persist()
    val rows = df.count() // materialize the source once

    def dirBytes(p: Path): Long = {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    def scanAll(path: String, fmt: String): Long = {
      val t0 = System.nanoTime()
      spark.read.format(fmt).load(path).write.format("noop")
        .mode("overwrite").save()
      (System.nanoTime() - t0) / 1000000
    }

    println(f"rows=$rows%d source=$sfDir")
    println("format  codec         MB   write_ms  scan_ms")
    for ((fmt, codec) <- Seq(
        ("parquet", "snappy"), ("parquet", "zstd"), ("parquet", "gzip"),
        ("parquet", "none"),
        ("orc", "snappy"), ("orc", "zstd"), ("orc", "zlib"),
        ("json", "none"), ("json", "gzip"),
        ("csv", "none"), ("csv", "gzip"))) {
      val dir = Files.createTempDirectory(s"codec_${fmt}_$codec")
      val t0 = System.nanoTime()
      df.write.format(fmt).option("compression", codec)
        .mode("overwrite").save(dir.toString)
      val writeMs = (System.nanoTime() - t0) / 1000000
      val mb = dirBytes(dir) / 1e6
      val scanMs = scanAll(dir.toString, fmt)
      println(f"$fmt%-7s $codec%-10s $mb%7.1f   $writeMs%7d  $scanMs%7d")
    }
  }
}
