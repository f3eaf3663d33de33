package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Round-10 scale stress: the pieces this round added or fixed, run at
  * 100-1000× their gate scale on local[32].
  *
  *  1. 4-dimensional Z-order clustered write + pruned scan on 2M rows —
  *     exercises the widened morton (bit positions ≥ 31, exactly where
  *     the pre-fix 32-bit shiftleft silently wrapped) and measures real
  *     row-group skipping on a 4-D box predicate.
  *  2. MaintainedTable additive maintenance over 30 daily micro-batches
  *     of 100k orders each (3M rows through the gold path), with a full
  *     replay of every batchId — the fence must keep the store
  *     byte-identical and never rescan history (per-batch work is
  *     delta + day-grain merge).
  *  3. KeySetMaintain monotone store growth to 2M distinct keys, then a
  *     duplicate-heavy batch (90% already-seen) — the union-distinct
  *     merge is the scale-relevant path (shuffle on the key, store-sized,
  *     not history×delta).
  *
  * Run: `sbt "runMain graft.tools.Stress10"` (optional arg: row scale).
  */
object Stress10 {
  def main(args: Array[String]): Unit = {
    // round the scale to a multiple of 100: the key-set expectations
    // (n/100 new keys, the 90%-dup construction) and the 30×(n/20)
    // batching are exact integer identities only then — an arbitrary
    // arg would fail the assertions spuriously
    val n = {
      val raw = args.headOption.map(_.toLong).getOrElse(2_000_000L)
      math.max(100L, raw - raw % 100)
    }
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress10] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-stress10").toString

    // --- 1. 4-D z-order: dims hashed off id, 8 bits each -> top morton
    // bit position 4*7+3 = 31, the first wrapped position pre-fix
    val rows4d = spark.range(n).select(col("id"),
      (pmod(hash(col("id"), lit(1)), lit(256))).cast("int").as("d0"),
      (pmod(hash(col("id"), lit(2)), lit(256))).cast("int").as("d1"),
      (pmod(hash(col("id"), lit(3)), lit(256))).cast("int").as("d2"),
      (pmod(hash(col("id"), lit(4)), lit(256))).cast("int").as("d3"))
    time("4-D clustered write (morton bits past 31)") {
      graft.lake.Lake.writeClustered(rows4d, s"$tmp/z4",
        Seq("d0", "d1", "d2", "d3"), numFiles = 32)
      n
    }
    time("4-D pruned scan (64^4/256^4 = 0.4% box)") {
      val hits = spark.read.parquet(s"$tmp/z4")
        .where(col("d0").between(0, 63) && col("d1").between(0, 63)
          && col("d2").between(0, 63) && col("d3").between(0, 63))
        .count()
      val expected = rows4d.where(col("d0").between(0, 63)
        && col("d1").between(0, 63) && col("d2").between(0, 63)
        && col("d3").between(0, 63)).count()
      assert(hits == expected, s"layout changed content: $hits != $expected")
      hits
    }

    // --- 2. additive gold maintenance: 30 daily batches of n/20 orders,
    // then a FULL replay of all 30 batchIds (fence must no-op each)
    val perBatch = n / 20
    def batchOf(day: Int) = spark.range(perBatch)
      .select(date_add(lit("2024-01-01").cast("date"), day)
          .cast("timestamp").as("o_orderdate"),
        (pmod(col("id"), lit(100000)) / lit(100.0)).as("o_totalprice"))
    val gold = s"$tmp/gold"
    time(s"gold maintain: 30 x $perBatch-row daily batches") {
      (0 until 30).foreach(d =>
        graft.streaming.GoldMaintain.maintainParquet(gold)(batchOf(d), d.toLong))
      spark.read.parquet(gold).count()
    }
    time("gold maintain: full 30-batch replay is fenced to a no-op") {
      val before = spark.read.parquet(gold)
        .agg(sum(col("cents")), sum(col("n_orders"))).collect()(0)
      (0 until 30).foreach(d =>
        graft.streaming.GoldMaintain.maintainParquet(gold)(batchOf(d), d.toLong))
      val after = spark.read.parquet(gold)
        .agg(sum(col("cents")), sum(col("n_orders"))).collect()(0)
      assert(before == after, s"replay double-counted: $before -> $after")
      30L
    }

    // --- 3. monotone key-set store: 2M distinct keys, then 90%-dup batch
    val keys = s"$tmp/keys"
    time(s"key-set maintain: $n distinct keys in one batch") {
      graft.streaming.KeySetMaintain.maintainParquet(keys, "user_id")(
        spark.range(n).select(col("id").as("user_id")), 0L)
      spark.read.parquet(keys).count()
    }
    time("key-set maintain: 90%-duplicate second batch") {
      // batch of n/10 keys starting 9n/100 below the store's max key:
      // the first 9n/100 are already seen (90%), the last n/100 are new
      graft.streaming.KeySetMaintain.maintainParquet(keys, "user_id")(
        spark.range(n / 10).select((col("id") + lit(n - 9 * n / 100))
          .as("user_id")), 1L)
      val got = spark.read.parquet(keys).count()
      assert(got == n + n / 100, s"expected ${n + n / 100} keys, got $got")
      got
    }

    spark.stop()
  }
}
