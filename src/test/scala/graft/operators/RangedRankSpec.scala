package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.DecimalType

/** RangedRank must be BIT-IDENTICAL to the single-partition window it
  * replaces (rank and running sums are exact integer/decimal values —
  * any divergence is a correctness bug, not noise), while planning NO
  * window at all: the whole point is that the q367/q375/q218 grain never
  * funnels through one task.
  */
class RangedRankSpec extends SparkTestBase {

  private def sampleDf = {
    import spark.implicits._
    // adversarial mix: duplicate sort values (tie-broken by id), nulls in
    // the summed column, negatives, and enough rows to span partitions
    (1 to 997).map { i =>
      val v = (i * 7919) % 43 // many ties
      val cents: java.lang.Long =
        if (i % 13 == 0) null else java.lang.Long.valueOf((i % 101) - 50L)
      (i.toLong, v.toLong, cents)
    }.toDF("id", "v", "cents")
  }

  test("rank + long prefix sum match the single-partition window bit-for-bit") {
    val df = sampleDf
    val w = Window.orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cents")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) null
        else java.lang.Long.valueOf(r.getLong(4)))).toSet
    val got = RangedRank.withGlobalRank(df, Seq(col("v"), col("id")),
      "r", Seq("cents" -> "cum"))
    val gotRows = got.df.collect().map(r => (r.getLong(0), r.getLong(3),
      java.lang.Long.valueOf(r.getLong(4)))).toSet
    // the window's running sum is NULL until the first non-null value;
    // RangedRank starts at 0 (both "sum of nothing" conventions appear in
    // engines; callers here always coalesce(.., 0)) — normalize
    val expNorm = expected.map { case (id, r, c) =>
      (id, r,
        java.lang.Long.valueOf(if (c == null) 0L else c.longValue)) }
    assert(gotRows === expNorm)
    assert(got.total === 997L)
    val centsTotal = df.agg(sum(col("cents"))).collect()(0).getLong(0)
    assert(got.totalLong("cum") === centsTotal)
  }

  test("decimal prefix sums are exact and keep the source scale") {
    val df = sampleDf
      .withColumn("kd", coalesce(col("cents"), lit(0L))
        .cast(DecimalType(38, 0)))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("kd")).over(w))
      .select(col("id"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getDecimal(1).stripTrailingZeros)).toSet
    val got = RangedRank.withGlobalRank(df, Seq(col("v"), col("id")),
      "r", Seq("kd" -> "cum"))
    assert(got.df.schema("cum").dataType === DecimalType(38, 0))
    val gotRows = got.df.select(col("id"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getDecimal(1).stripTrailingZeros)).toSet
    assert(gotRows === expected)
  }

  test("descending + multi-key order matches row_number exactly") {
    val df = sampleDf
    val w = Window.orderBy(col("v").desc, col("cents").asc_nulls_first,
      col("id"))
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
      .select(col("id"), col("r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangedRank.withGlobalRank(df,
      Seq(col("v").desc, col("cents").asc_nulls_first, col("id")), "r")
    val gotRows = got.df.select(col("id"), col("r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRows === expected)
  }

  test("no WindowExec anywhere in the ranked plan") {
    val got = RangedRank.withGlobalRank(sampleDf,
      Seq(col("v"), col("id")), "r", Seq("cents" -> "cum"))
    val windows = got.df.queryExecution.sparkPlan.collect {
      case w: WindowExec => w
    }
    assert(windows.isEmpty, s"RangedRank must not plan windows: $windows")
  }

  test("empty input yields an empty frame and zero totals") {
    val df = sampleDf.where(lit(false))
    val got = RangedRank.withGlobalRank(df, Seq(col("v"), col("id")),
      "r", Seq("cents" -> "cum"))
    assert(got.df.count() === 0L)
    assert(got.total === 0L)
    assert(got.totalLong("cum") === 0L)
  }
}
