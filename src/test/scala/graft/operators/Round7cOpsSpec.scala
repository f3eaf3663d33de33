package graft.operators

import graft.SparkTestBase
import graft.analytics.{Relational, TextAnalytics}
import org.apache.spark.sql.functions.col

/** Semantics of the round-7c operators: BPE fertility per language,
  * packing straddle audit, Hill tail index, the Haar revenue pyramid,
  * and the source vocabulary-overlap matrix. Driver-side exact replays
  * on sf0.001; the DuckDB oracle covers sf0.01.
  */
class Round7cOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bpe fertility: language rollup reconciles with the per-doc encode") {
    val enc = TextAnalytics.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).view.mapValues { ds =>
      val words = ds.map(_._3.split(" ", -1).length.toLong).sum
      val toks = ds.map(d => enc(d._1)._2).sum
      (ds.length.toLong, words, toks)
    }.toMap
    val got = TextAnalytics.bpeFertility(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === expect.keySet)
    got.foreach { r =>
      val (n, w, t) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === w)
      assert(r.getLong(3) === t)
      assert(r.getDouble(4) >= 1.0) // every word is at least one subword
    }
  }

  test("packing straddle: audit replays the manifest boundary arithmetic") {
    val manifest = Curation.shardManifest(spark, sf).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expect = manifest.groupBy(_._1).view.mapValues { rows =>
      val straddle = rows.filter { case (_, bin, start, n) =>
        start + n > (bin + 1) * 2048L
      }
      (rows.length.toLong, rows.map(_._4).sum, straddle.length.toLong,
        straddle.map { case (_, bin, start, n) =>
          start + n - (bin + 1) * 2048L
        }.sum)
    }.toMap
    val got = Curation.packingStraddleAudit(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, toks, ns, cut) = expect(r.getInt(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === ((n, toks, ns, cut)))
    }
  }

  test("hill tail: fixed-point replay of the top-201 order statistics") {
    val lens = graft.core.Tables.documents(spark, sf)
      .select(col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, id) => (-c, id) }.take(201).map(_._1)
    val xref = lens.min
    def lnFp(x: Long): Long = math.rint(math.log(x.toDouble) * 1e6).toLong
    val invAlphaRaw = (lens.map(lnFp).sum - 201L * lnFp(xref)).toDouble / 2e8
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TextAnalytics.hillTailIndex(spark, sf).collect().head
    assert(row.getInt(0) === 200)
    assert(row.getLong(1) === xref)
    assert(row.getDouble(2) === r6(invAlphaRaw))
    assert(row.getDouble(3) === r6(1.0 / invAlphaRaw))
    assert(row.getDouble(3) > 0.0) // lengths are heavy-tailed, not constant
  }

  test("haar pyramid: coefficients replay and levels telescope") {
    val daily = graft.core.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(col("o_orderdate"))
        .as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(col("o_totalprice") * 100, 0)
          .cast("long")).as("cents"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = daily.map(_._1).min
    val byIdx = daily.map { case (d, c) =>
      java.time.temporal.ChronoUnit.DAYS.between(d0, d) -> c
    }.toMap
    val got = Relational.haarRevenue(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // exact replay of every emitted coefficient
    got.foreach { case ((level, block), (approx, detail)) =>
      val lo = block << level
      val members = byIdx.filter { case (i, _) =>
        i >= lo && i < lo + (1L << level)
      }
      assert(members.nonEmpty) // blocks only exist where data does
      assert(approx === members.values.sum, s"approx L$level b$block")
      val half = lo + (1L << (level - 1))
      val exp = members.map { case (i, c) => if (i < half) c else -c }.sum
      assert(detail === exp, s"detail L$level b$block")
    }
    // telescoping: a block's approx equals the sum of its child approxes
    got.keys.filter(_._1 > 1).foreach { case (level, block) =>
      val kids = Seq(2 * block, 2 * block + 1)
        .flatMap(b => got.get((level - 1, b)).map(_._1))
      assert(got((level, block))._1 === kids.sum, s"L$level b$block children")
    }
  }

  test("vocab overlap: pair matrix replays driver-side shingle sets") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.groupBy(_._1).view
      .mapValues(_.iterator.flatMap(d => shingles(d._2)).toSet).toMap
    val got = TextAnalytics.vocabOverlap(spark, sf).collect()
    val expectPairs = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size if inter > 0
    } yield (a, b) -> inter).toMap
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet
      === expectPairs.keySet)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === sets(a).size.toLong)
      assert(r.getLong(3) === sets(b).size.toLong)
      assert(r.getLong(4) === expectPairs((a, b)).toLong)
      assert(r.getDouble(5) <= 1.0 && r.getDouble(5) > 0.0)
    }
  }
}
