package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Round-12 RangedRank scale margin (VERDICT r11 item 4): Stress11 pinned
  * bit-exactness vs the single-partition window at 20M and timed 100M
  * (26.4 s vs 201.4 s); this leg extends the curve to 500M+ rows to pin
  * the near-linear claim and separates the helper's Row-codec overhead
  * from the unavoidable sort cost:
  *
  *  1. `RangedRank.withGlobalRank` (rank + one running sum) at each scale,
  *     verified by closed-form invariants instead of the window control
  *     (which is one task sorting everything — ~34 min at 500M): the rank
  *     must cover 1..n exactly (sum rn = n(n+1)/2, max rn = n) and pass
  *     B's final running sum must equal pass A's independently-accumulated
  *     grand total. Both catch any offset/boundary error — they are the
  *     same identities the 20M/100M legs proved bit-exact against the
  *     window.
  *  2. A sorted-DataFrame CONTROL at the same scale: the identical
  *     `repartitionByRange + sortWithinPartitions` plus a trivial
  *     aggregate, entirely inside codegen. RangedRank minus control ≈ the
  *     InternalRow→Row deserialization + per-partition walk the r11
  *     verdict flagged as the helper's one overhead ("what's wrong 4") —
  *     measured, not guessed.
  *
  * Run: `sbt "runMain graft.tools.Stress12 [rows ...]"` (default
  * 500,000,000).
  */
object Stress12 {
  def main(args: Array[String]): Unit = {
    val scales = if (args.isEmpty) Seq(500_000_000L) else args.toSeq.map(_.toLong)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress12] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    for (n <- scales) {
      // same shape as Stress11 leg 3: hashed key with ties, unique
      // tie-break, small payload
      val rows = spark.range(n).select(
        hash(col("id"), lit(7)).cast("long").as("k"),
        col("id"),
        pmod(col("id"), lit(997L)).as("v"))

      timed(f"RangedRank rank+prefix over $n%,d rows") {
        val t0 = System.nanoTime()
        val rr = graft.operators.RangedRank.withGlobalRank(rows,
          Seq(col("k"), col("id")), "rn", Seq("v" -> "cum_v"))
        val passA = (System.nanoTime() - t0) / 1e9
        val r = rr.df.agg(max(col("rn")), sum(col("rn")), max(col("cum_v")))
          .collect()(0)
        // closed-form rank identities + pass A/B agreement
        assert(rr.total == n && r.getLong(0) == n,
          s"rank must cover 1..$n: total=${rr.total}, max=${r.getLong(0)}")
        // n(n+1)/2 fits a long through n = 6.07e9; sum(long) is LongType
        val expectSum = (BigInt(n) * BigInt(n + 1) / 2).toLong
        assert(r.getLong(1) == expectSum,
          s"sum(rn) must be n(n+1)/2: ${r.getLong(1)} vs $expectSum")
        assert(r.getLong(2) == rr.totalLong("cum_v"),
          "pass B's final running sum must equal pass A's grand total")
        println(f"[stress12]   pass A (shuffle+offsets): $passA%.1f s " +
          f"(${n / passA / 1e6}%.1fM rows/s)")
      }

      timed(f"sorted-DataFrame control over $n%,d rows (no Row codec)") {
        val p = spark.sessionState.conf.numShufflePartitions
        val sorted = rows.repartitionByRange(p, col("k"), col("id"))
          .sortWithinPartitions(col("k"), col("id"))
        // cheap fully-codegen consumption of every sorted row
        val r = sorted.agg(sum(col("v")), count(lit(1))).collect()(0)
        assert(r.getLong(1) == n)
      }
    }
    spark.stop()
  }
}
