package graft.operators

import graft.SparkTestBase
import graft.analytics.Sessions
import org.apache.spark.sql.functions.col

/** Semantics of q179–q181: cell label purity (entropy-recipe replay),
  * component-size histogram (recount vs the component table), and the
  * session-size histogram (recount vs the session rollup) — each checked
  * against an independent Scala recount of its own upstream stage.
  */
class PurityHistogramSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cell purity: majority and entropy replay from the assignment table") {
    val s = spark
    val av = Similarity.ivfAssignTrained(s, sf).select(col("vec_id"), col("cell"))
      .join(graft.core.Tables.embeddings(s, sf).select(col("vec_id"), col("label")),
        "vec_id")
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    val byCell = av.groupBy(_._1)
    val expected = byCell.map { case (cell, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val n = rows.size
      val (majLabel, majN) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      val efp = counts.values.map { c =>
        val p = c.toDouble / n
        math.round(round6(-p * math.log(p)) * 1e6)
      }.sum
      cell -> ((n.toLong, majLabel, round6(majN.toDouble / n),
        round6(efp.toDouble / 1e6)))
    }
    val got = Similarity.cellPurity(s, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got === expected)
  }

  test("component sizes: histogram recounts the component table; mass adds up") {
    val s = spark
    val comp = Curation.dedupComponents(s, sf).collect()
      .map(r => r.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
    val expected = comp.values.groupBy(_.toLong).view
      .mapValues(_.size.toLong).toMap
    val got = Curation.componentSizeHistogram(s, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    val nDocs = Curation.componentSizeHistogram(s, sf).collect()
      .map(r => r.getLong(2)).sum
    assert(nDocs === comp.values.sum.toLong)
  }

  test("session sizes: histogram recounts the session rollup") {
    val s = spark
    val sizes = Sessions.sessionGap(s, sf).select(col("number_of_events"))
      .collect().map(_.getLong(0))
    val expected = sizes.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Sessions.sessionSizeHistogram(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => g._1 -> g._2).toMap === expected)
    got.foreach { case (k, n, share) =>
      assert(share === round6(n.toDouble / sizes.length))
    }
  }
}
