package graft.tools

import graft.core.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 scale stress: the distributed MMR greedy ([[Similarity
  * .mmrSelect]], the flatMapGroups second half of q197) at corpus-scale
  * QUERY counts — the dimension the gate's 3 queries cannot exercise.
  * Planted closed-form truth per query:
  *
  *  - candidates j = 0..9 ("cluster A"): rel = 0.95 − j·0.001, mutual
  *    sim 0.9 (near-duplicates of each other);
  *  - candidates j = 10..19 ("cluster B"): rel = 0.9 − (j−10)·0.001,
  *    sim 0.1 to everything;
  *  - λ = 0.7, k = 5 ⇒ the greedy MUST pick A0 first (pure relevance),
  *    then B0..B3: every later A candidate scores λ·rel − (1−λ)·0.9 ≈
  *    0.39, below every unpicked B's ≈ 0.60 — the diversity flip that
  *    validates max-over-SELECTED across groups, not just rank order.
  *
  * Checks: (1) the full selection order for EVERY query via the closed
  * form (distributed join, zero mismatches); (2) bit-exact row compare
  * for sample queries against an independent driver-side greedy using
  * the same double semantics; (3) runtime at n/4 vs n queries — the
  * per-query groups are independent, so scaling must be ~linear in the
  * query count (one shuffle, no pairwise blow-up).
  *
  * Run: `sbt "runMain graft.tools.Stress15 [nQueries]"` (default 200k
  * queries = 4.2M rel rows + 76M pairwise-sim rows through one shuffle).
  */
object Stress15 {
  private val NCand = 20
  private val K = 5
  private val Lambda = 0.7

  /** The packed candidate grid (kind/query_id/cid/other/x) for
    * `nQueries` planted queries — same layout [[Similarity.mmrRerank]]
    * packs for the production family.
    */
  private def plantedPacked(spark: SparkSession, nQueries: Long): DataFrame = {
    val cands = spark.range(nQueries)
      .select(col("id").as("query_id"))
      .crossJoin(spark.range(NCand.toLong).select(col("id").as("j")))
      .select(col("query_id"), (col("query_id") * 100L + col("j")).as("cid"),
        col("j"),
        when(col("j") < 10, round(lit(0.95) - col("j") * 0.001, 4))
          .otherwise(round(lit(0.9) - (col("j") - 10L) * 0.001, 4)).as("rel"))
    val sims = cands.as("a").join(cands.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.cid") =!= col("b.cid"))
      .select(col("a.query_id").as("query_id"), col("a.cid").as("cid"),
        col("b.cid").as("other"),
        when(col("a.j") < 10 && col("b.j") < 10, lit(0.9))
          .otherwise(lit(0.1)).as("sim"))
    cands.select(lit(0).as("kind"), col("query_id"), col("cid"),
        lit(null).cast("long").as("other"), col("rel").as("x"))
      .unionByName(sims.select(lit(1).as("kind"), col("query_id"),
        col("cid"), col("other"), col("sim").as("x")))
  }

  /** Independent driver-side greedy with the exact double semantics of
    * mmrSelect (λ and 1−λ as the same literals; 6-dp HALF_UP round) for
    * the sample-query bit compare.
    */
  private def referenceRows(qid: Long): Seq[(Long, Int, Long, Double,
      Option[Double], Double)] = {
    val rel = (0 until NCand).map { j =>
      val r = if (j < 10) BigDecimal(0.95 - j * 0.001)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else BigDecimal(0.9 - (j - 10) * 0.001)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (qid * 100L + j) -> r
    }.toMap
    def sim(a: Long, b: Long): Double =
      if (a % 100 < 10 && b % 100 < 10) 0.9 else 0.1
    val oneMinus = 1.0 - Lambda
    var selected = Vector.empty[Long]
    (1 to K).map { step =>
      val best = rel.keys.filterNot(selected.contains).map { c =>
        if (step == 1) (c, rel(c), None: Option[Double], rel(c))
        else {
          val m = selected.map(s => sim(c, s)).max
          (c, rel(c), Some(m), Lambda * rel(c) - oneMinus * m)
        }
      }.minBy { case (c, _, _, mmr) => (-mmr, c) }
      selected :+= best._1
      (qid, step, best._1, best._2, best._3,
        BigDecimal(best._4).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
  }

  def main(args: Array[String]): Unit = {
    val nQueries = args.headOption.map(_.toLong).getOrElse(200_000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress15] $name: $n%,d rows in $s%.1f s")
      s
    }

    // ---- leg 1: closed-form selection order for EVERY query
    val packed = plantedPacked(spark, nQueries).localCheckpoint()
    val tFull = timed(f"mmrSelect over $nQueries%,d queries") {
      val out = Similarity.mmrSelect(spark, packed, K, Lambda)
        .localCheckpoint()
      val n = out.count()
      assert(n == nQueries * K, s"expected ${nQueries * K} rows, got $n")
      // step 1 → A0 (qid·100); step t ≥ 2 → B(t−2) (qid·100 + 10 + t − 2)
      val mismatches = out.where(col("vec_id") =!=
          when(col("step") === 1, col("query_id") * 100L)
            .otherwise(col("query_id") * 100L + 10L + col("step") - 2L))
        .count()
      assert(mismatches == 0,
        s"$mismatches selections differ from the planted closed form")
      val badMs = out.where(
        (col("step") === 1 && col("max_sim_sel").isNotNull) ||
          (col("step") > 1 && col("max_sim_sel") =!= 0.1)).count()
      assert(badMs == 0, s"$badMs rows with wrong max_sim_sel")
      n
    }
    println(f"[stress15] leg1 OK: ${nQueries * K}%,d selections match " +
      "the planted closed form")

    // ---- leg 2: bit-exact sample compare vs the independent reference
    val sampleQids = Seq(0L, 1L, nQueries / 2, nQueries - 1L).distinct
    val got = Similarity.mmrSelect(spark,
        packed.where(col("query_id").isin(sampleQids: _*)), K, Lambda)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getDouble(5)))
      .sortBy(t => (t._1, t._2))
    val want = sampleQids.sorted.flatMap(referenceRows)
    assert(got.toSeq == want,
      s"sample rows diverge from the driver-side reference greedy:\n" +
        s"got  ${got.toSeq}\nwant $want")
    println(s"[stress15] leg2 OK: ${got.length} sample rows bit-equal " +
      "to the independent reference")

    // ---- leg 3: linearity in the query count (independent groups)
    val quarter = plantedPacked(spark, nQueries / 4).localCheckpoint()
    val tQuarter = timed(f"mmrSelect over ${nQueries / 4}%,d queries") {
      Similarity.mmrSelect(spark, quarter, K, Lambda).count()
    }
    println(f"[stress15] leg3: full/quarter wall ratio " +
      f"${tFull / math.max(tQuarter, 0.001)}%.1fx for 4x queries " +
      "(independent per-query groups: expect ~linear, i.e. ≲4x)")
    spark.stop()
  }
}
