package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests for [[RangedRank]] on SEEDED random frames: random
  * sizes (including sizes far below the partition count, so most range
  * partitions are empty), random tie density (key domains from 1 — ALL
  * rows tied, the worst skew a range partitioner can see — up to near-
  * unique), random null rates and signs in the summed column, and random
  * ascending/descending order per round. The invariant is the contract
  * itself: rank and inclusive running sum must be BIT-IDENTICAL to the
  * single-partition `Window.orderBy` they replace, on every schedule.
  */
class RangedRankPropSpec extends SparkTestBase {

  private val rnd = new scala.util.Random(0x5eedfeed)

  private def randomFrame(n: Int, keyDomain: Int, nullPct: Int) = {
    val s = spark; import s.implicits._
    (1 to n).map { i =>
      val v = rnd.nextInt(keyDomain).toLong
      val cents: java.lang.Long =
        if (rnd.nextInt(100) < nullPct) null
        else java.lang.Long.valueOf(rnd.nextInt(2001) - 1000L)
      (i.toLong, v, cents)
    }.toDF("id", "v", "cents")
  }

  test("rank + running sum equal the window oracle on random frames") {
    (1 to 8).foreach { round =>
      val n = 1 + rnd.nextInt(1500)
      val keyDomain = 1 + rnd.nextInt(n) // 1 = total skew, n = near-unique
      val nullPct = rnd.nextInt(50)
      val df = randomFrame(n, keyDomain, nullPct)
      val ord =
        if (rnd.nextBoolean()) Seq(col("v"), col("id"))
        else Seq(col("v").desc, col("id"))
      val w = Window.orderBy(ord: _*)
      val expected = df
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("cum", coalesce(sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)))
        .select(col("id"), col("r"), col("cum")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = RangedRank.withGlobalRank(df, ord, "r",
        Seq("cents" -> "cum"))
      val gotRows = got.df.select(col("id"), col("r"), col("cum"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotRows === expected,
        s"round $round diverged (n=$n, keys=$keyDomain, nulls=$nullPct%)")
      assert(got.total === n.toLong, s"round $round total")
      val oracle = df.agg(coalesce(sum(col("cents")), lit(0L)))
        .collect()(0).getLong(0)
      assert(got.totalLong("cum") === oracle, s"round $round grand total")
    }
  }

  test("single-key total skew still covers ranks 1..n exactly once") {
    val s = spark; import s.implicits._
    // every row has the SAME range key: one range partition receives the
    // whole frame and the others are empty — offsets must still be exact
    val df = (1 to 500).map(i => (i.toLong, 1L)).toDF("id", "v")
    val got = RangedRank.withGlobalRank(df, Seq(col("v"), col("id")), "r")
    val ranks = got.df.select(col("r")).collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 500L))
    assert(got.total === 500L)
  }
}
