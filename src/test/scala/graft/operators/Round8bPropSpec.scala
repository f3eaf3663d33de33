package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.col
import graft.SparkTestBase

/** Property tests for the round-8b statistical kernels against brute-force
  * in-JVM references on RANDOM fixtures — heavy ties, constant series,
  * negative values, tiny groups: the shapes the real corpus never
  * produces. Seeded generators, deterministic samples (the suite's
  * convention).
  */
class Round8bPropSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  // (date, price) orders with FEW distinct prices → heavy ties, and few
  // distinct days → tied day aggregates
  private val ordersGen: Gen[List[(Int, Double)]] = for {
    n <- Gen.choose(6, 60)
    rows <- Gen.listOfN(n, for {
      day <- Gen.choose(0, 9)
      price <- Gen.oneOf(1.0, 2.5, 2.5, 7.0, -3.0)
    } yield (day, price))
  } yield rows

  private def toOrdersDf(rows: List[(Int, Double)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (d, p) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1996, 1, 1).plusDays(d)), p)
    }.toDF("o_orderdate", "o_totalprice")
  }

  test("kendall tau-b: exact pair census matches brute force on tied random series") {
    (1L to 8L).foreach { seed =>
      val rows = sample(ordersGen, seed)
      val daily = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, g) =>
          (g.length.toLong, g.map(p => math.rint(p._2 * 100).toLong).sum)
        }
      var (c, d, tx, ty, tb) = (0L, 0L, 0L, 0L, 0L)
      for (i <- daily.indices; j <- (i + 1) until daily.length) {
        val dx = java.lang.Long.signum(daily(j)._1 - daily(i)._1)
        val dy = java.lang.Long.signum(daily(j)._2 - daily(i)._2)
        if (dx == 0 && dy == 0) tb += 1
        else if (dx == 0) tx += 1
        else if (dy == 0) ty += 1
        else if (dx == dy) c += 1
        else d += 1
      }
      val r = graft.analytics.Relational.kendallTauDailyOf(toOrdersDf(rows)).head
      assert(r.getLong(0) === daily.length.toLong, s"seed $seed")
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        === ((c, d, tx, ty, tb)), s"seed $seed")
    }
  }

  test("theil-sen vs kendall inputs: day grain identical under both collapses") {
    // sanity tie between the two day-grain driver solves: identical spine
    (1L to 4L).foreach { seed =>
      val rows = sample(ordersGen, seed)
      val df = toOrdersDf(rows)
      val kd = graft.analytics.Relational.kendallTauDailyOf(df).head.getLong(0)
      val ts = graft.analytics.Relational.theilSenTrendOf(df).head
      // theil-sen runs on the zero-filled spine (calendar days), kendall
      // on order days only — spine length ≥ order-day count
      assert(ts.getLong(0) >= kd)
    }
  }

  test("multiset set ops on random bags follow the min/max-difference identities") {
    val s = spark
    import s.implicits._
    val bagGen = for {
      n <- Gen.choose(0, 30)
      xs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield xs
    (1L to 8L).foreach { seed =>
      val a = sample(bagGen, seed)
      val b = sample(bagGen, seed + 100)
      val da = a.toDF("v"); val db = b.toDF("v")
      val inter = da.intersectAll(db).groupBy(col("v")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val except = da.exceptAll(db).groupBy(col("v")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Seq("a", "b", "c").foreach { v =>
        val ca = a.count(_ == v).toLong
        val cb = b.count(_ == v).toLong
        assert(inter.getOrElse(v, 0L) === math.min(ca, cb), s"seed $seed $v")
        assert(except.getOrElse(v, 0L) === math.max(ca - cb, 0L), s"seed $seed $v")
      }
    }
  }
}
