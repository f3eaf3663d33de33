package graft.streaming

import java.io.{DataInputStream, EOFException, FileInputStream}
import net.jpountz.lz4.LZ4BlockInputStream
import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Decoder for the reference's committed streaming checkpoint at
  * `/root/reference/tmp` (HDFS-backed state store, lz4-compressed deltas) —
  * the accidental golden trace of the historical stateful query
  * (SURVEY.md §2.9): 1-minute tumbling windows keyed by user_id,
  * 10-minute watermark, append mode, 7 committed micro-batches.
  *
  * Formats decoded here (all public Spark on-disk formats):
  *  - offsets/N: line 2 = batch metadata JSON (batchWatermarkMs), line 3 =
  *    per-topic end offsets.
  *  - state/0/P/V.delta: lz4-java block stream of records
  *    [keySize, keyBytes, valueSize, valueBytes] with valueSize = -1 for a
  *    removal (append-mode emission) and keySize = -1 as EOF. Version V
  *    holds the updates committed by micro-batch V-1.
  *  - key UnsafeRow schema (state/0/0/_metadata/schema):
  *    (user_id string, window struct<start timestamp, end timestamp>).
  */
object CheckpointTrace {

  val Root = "/root/reference/tmp"
  val Partitions = 200
  val Batches = 7
  val WatermarkDelayMs = 600000L

  final case class BatchMeta(id: Int, watermarkMs: Long, endOffset: Long)

  /** Per-record state-store mutation: `tombstone = true` means the key was
    * evicted (its window emitted) in micro-batch `batch`.
    */
  final case class KeyTouch(batch: Int, partition: Int, user: String,
      winStartMs: Long, winEndMs: Long, tombstone: Boolean)

  def offsets: Seq[BatchMeta] = (0 until Batches).map { b =>
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$Root/offsets/$b"))
    val wm = """"batchWatermarkMs":(\d+)""".r
      .findFirstMatchIn(lines.get(1)).get.group(1).toLong
    val off = """\{"0":(\d+)\}""".r
      .findFirstMatchIn(lines.get(2)).get.group(1).toLong
    BatchMeta(b, wm, off)
  }

  /** All key mutations across every partition and batch, in file order. */
  lazy val keyTouches: Seq[KeyTouch] = for {
    p <- 0 until Partitions
    v <- 1 to Batches
    t <- decodeDelta(s"$Root/state/0/$p/$v.delta", v - 1, p)
  } yield t

  def decodeDelta(path: String, batch: Int, partition: Int): Seq[KeyTouch] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Nil
    val in = new DataInputStream(new LZ4BlockInputStream(new FileInputStream(f)))
    try {
      val out = Seq.newBuilder[KeyTouch]
      var done = false
      while (!done) {
        val keySize =
          try in.readInt()
          catch { case _: EOFException => done = true; -1 }
        if (keySize == -1) done = true
        else {
          val keyBytes = new Array[Byte](keySize)
          in.readFully(keyBytes)
          val valueSize = in.readInt()
          val tombstone = valueSize < 0
          if (!tombstone) {
            val skip = new Array[Byte](valueSize)
            in.readFully(skip)
          }
          val key = new UnsafeRow(2)
          key.pointTo(keyBytes, keySize)
          val user = key.getUTF8String(0).toString
          val win = key.getStruct(1, 2)
          // timestamps are stored as micros since epoch
          out += KeyTouch(batch, partition, user,
            win.getLong(0) / 1000L, win.getLong(1) / 1000L, tombstone)
        }
      }
      out.result()
    } finally in.close()
  }
}
