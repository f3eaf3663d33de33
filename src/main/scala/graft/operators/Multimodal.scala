package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as a distributed mapPartitions stage.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a clearly
  * marked deterministic STUB standing in for a real decoder (libjpeg /
  * ffmpeg bindings); everything around it — the binary column, the schema,
  * the partition-wise batching, the select-pushdown-friendly projection —
  * is the real Spark plumbing a production decode stage uses. Swap the stub
  * body for a codec call and nothing else changes.
  *
  * Scale notes: decode is a narrow map stage (no shuffle); binary payloads
  * stay columnar in parquet; metadata-only queries never touch the bytes
  * (column pruning drops `payload` at the scan).
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean)

  /** Attach a binary payload column. The testdata has no real media, so the
    * document text bytes stand in for an encoded image buffer.
    */
  def withPayload(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("image/fake-"), col("source")).as("media_type"))

  /** STUB decoder — deterministic fake. A real implementation decodes the
    * payload header (e.g. JPEG SOF) here; the fake derives plausible
    * dimensions from the byte length so results are reproducible and
    * oracle-checkable. Marked ??? in spirit: DO NOT interpret the numbers.
    */
  private def fakeDecode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, mediaType, n,
      width = (64 + n % 577).toInt,
      height = (64 + (n * 31) % 417).toInt,
      n_frames = 1 + (n % 7).toInt,
      ok = n > 0)
  }

  /** Distributed decode: partition-wise iteration (the Scala analogue of
    * mapInPandas batch processing) producing a typed metadata Dataset.
    */
  def decodeMeta(spark: SparkSession, sfDir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(spark, sfDir).as[MediaRecord]
      .mapPartitions(_.map(r => fakeDecode(r.doc_id, r.media_type, r.payload)))
  }

  /** Metadata summary per media_type over the decoded stream. NOTE: this
    * runs the decode (typed mapPartitions is opaque to Catalyst, so the
    * payload IS read — that's inherent to decoding). In a real pipeline the
    * decode output is persisted once as a metadata table and catalog
    * queries hit that table with payload-free column pruning.
    */
  def metaSummary(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir).toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"),
        sum(col("n_frames").cast("long")).as("total_frames"))
}
