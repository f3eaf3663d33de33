package graft.operators

import graft.SparkTestBase
import graft.analytics.{Funnels, Relational, Sessions}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7h operators: RFM migration, head/tail
  * boilerplate, activity heatmap, session return gaps. Driver-side
  * replays on sf0.001.
  */
class Round7hOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rfm migration: matrix mass equals the user union; flows reconcile") {
    val got = Funnels.rfmMigration(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every cell label is a known segment or 'absent'
    val labels = Set("champion", "loyal", "at_risk", "new", "hibernating", "absent")
    got.keys.foreach { case (a, b) =>
      assert(labels(a) && labels(b))
      assert(!(a == "absent" && b == "absent")) // at least one half active
    }
    // total mass = distinct users over the whole window
    val nUsers = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(got.values.sum === nUsers)
    // the 'from' margin over non-absent rows = first-half segment counts
    val ev = graft.core.Tables.events(spark, sf)
    val mid = ev.agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.to_date(col("ts"))).as("d0"),
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.to_date(col("ts"))).as("d1"))
      .selectExpr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT)) AS mid")
      .collect().head.getDate(0)
    val firstHalf = Funnels.rfmSegmentsOf(
      ev.where(org.apache.spark.sql.functions.to_date(col("ts"))
        < org.apache.spark.sql.functions.lit(mid)))
      .groupBy(col("segment")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromMargin = got.toSeq.filter(_._1._1 != "absent")
      .groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    assert(fromMargin === firstHalf)
  }

  test("head/tail boilerplate: shared flags replay positional chunk hashes") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    def head(w: Array[String]) = w.take(8).mkString(" ")
    def tail(w: Array[String]) = w.takeRight(8).mkString(" ")
    val headCounts = docs.groupBy(d => head(d._2)).view.mapValues(_.size).toMap
    val tailCounts = docs.groupBy(d => tail(d._2)).view.mapValues(_.size).toMap
    val expect = docs.groupBy(_._1).view.mapValues { ds =>
      (ds.length.toLong,
        ds.count(d => headCounts(head(d._2)) >= 2).toLong,
        ds.count(d => tailCounts(tail(d._2)) >= 2).toLong)
    }.toMap
    val got = Dedup.headTailBoilerplate(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, h, t) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, h, t)))
      assert(r.getDouble(4) === r6(h.toDouble / n))
      assert(r.getDouble(5) === r6(t.toDouble / n))
    }
  }

  test("activity heatmap: cells partition events; shares normalize") {
    val rows = Relational.activityHeatmap(spark, sf).collect()
    val total = graft.core.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 23)
    }
    // per-day shares sum to ~1 within rounding
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    }
  }

  test("session return gaps: histogram replays the sessionized lead gaps") {
    val events = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), org.apache.spark.sql.functions.unix_micros(col("ts")),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = events.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      // 30-min gap sessionization
      val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = s.head._2; var end = s.head._2
      s.tail.foreach { e =>
        if (e._2 - end > 1800L * 1000000L) {
          sessions += ((start, end)); start = e._2
        }
        end = e._2
      }
      sessions += ((start, end))
      sessions.toSeq.sortBy(_._1).sliding(2).collect {
        case Seq((_, e1), (s2, _)) => (s2 - e1) / 3600000000L
      }
    }.toSeq
    val expect = gaps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Sessions.sessionReturnGaps(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(got.map(_.getLong(0)).toSet === expect.keySet)
    val total = gaps.length.toLong
    var cum = 0L
    got.foreach { r =>
      assert(r.getLong(1) === expect(r.getLong(0)), s"gap ${r.getLong(0)}")
      cum += r.getLong(1)
      assert(r.getDouble(2) === r6(r.getLong(1).toDouble / total))
      assert(r.getDouble(3) === r6(cum.toDouble / total))
    }
  }
}
