package graft.lake

import graft.{ScanMeter, SparkTestBase}
import org.apache.spark.sql.functions._

/** q382 end-to-end (VERDICT r9 item 4): the clustered table is not just
  * WRITTEN with a good layout (LakeClusteredSpec proves the footer
  * stats) — the SCAN path must actually skip. This spec executes the
  * gated aggregate against the clustered copy and against a round-robin
  * "natural" copy of the SAME rows, reads the FileSourceScan's
  * numOutputRows metric (rows that survived parquet row-group pruning
  * and reached Spark), and asserts the clustered scan reads a fraction
  * of the table while the natural scan reads all of it — with
  * hash-identical results.
  */
class ClusteredScanSpec extends SparkTestBase with ScanMeter {

  private val sf = "/root/testdata/sf0.001"

  test("q382: clustered scan row-group-skips; natural layout cannot; results match") {
    // the gated operator: writes the clustered copy once, scans it
    val (clusteredRows, clusteredRead) =
      runAndMeter(Lake.clusteredScan(spark, sf))

    // natural layout: the SAME rows, round-robin across the same file count
    val clusteredPath = Lake.clusteredLineitemPath(spark, sf)
    val natural = java.nio.file.Files.createTempDirectory("graft-natural")
      .resolve("lineitem_n").toString
    spark.read.parquet(clusteredPath).repartition(16)
      .write.mode("overwrite").parquet(natural)
    val (naturalRows, naturalRead) =
      runAndMeter(Lake.clusteredScanAggregate(spark.read.parquet(natural)))

    assert(clusteredRows === naturalRows, "layout must not change content")
    val total = spark.read.parquet(clusteredPath).count()
    assert(naturalRead === total,
      s"round-robin row groups span the whole space: expected all $total rows read")
    assert(clusteredRead * 2 <= total,
      s"clustered scan should skip >= half the rows, read $clusteredRead of $total")
    info(s"clustered read $clusteredRead / $total rows; natural read $naturalRead")
  }
}
