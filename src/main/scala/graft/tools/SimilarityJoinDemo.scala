package graft.tools

import graft.core.GraftSession
import graft.operators.Dedup

/** Measures SimilarityJoinRewrite against its own naive control (dev
  * tool): the exact-Jaccard theta self-join over a BOUNDED document
  * window, once with the rule off (BroadcastNestedLoopJoin — O(n²)
  * Jaccard evaluations, which is why the window exists) and once with it
  * on (prefix-filtered bucketed equality join). Rounds 8-12 gated this
  * comparison as q75 itself; the gated query now runs the rewritten plan
  * over the full corpus and the demo lives here (r12 verdict item 2),
  * exactly like [[RangeJoinDemo]] for the range-join rule.
  *
  *   sbt "runMain graft.tools.SimilarityJoinDemo sf0.01 [maxDocId] [--no-control]"
  */
object SimilarityJoinDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.01")}"
    val bound = args.drop(1).find(!_.startsWith("--")).map(_.toLong).getOrElse(1000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def run(label: String, ruleOn: Boolean): Long = {
      val t0 = System.nanoTime()
      // jaccardPairsRewrite pins the rule conf ON inside its own fresh
      // session, so the OFF leg cannot reuse it — the control rebuilds
      // the same theta join by hand on a session with the rule disabled.
      val df =
        if (ruleOn) Dedup.jaccardPairsRewrite(spark, sfDir, maxDocId = Some(bound))
        else {
          import org.apache.spark.sql.functions._
          val s = spark.newSession()
          s.conf.set("spark.graft.similarityJoinRewrite", "false")
          s.conf.set("spark.sql.legacy.sizeOfNull", "false")
          val docs = graft.core.Tables.documents(s, sfDir)
            .where(col("doc_id") < bound)
            .repartition(col("doc_id"))
            .select(col("doc_id"),
              transform(graft.functions.Text.shingles(col("text"), 3),
                sh => graft.functions.Hashing.stableHash60(sh)).as("sh"))
          val a = docs.select(col("doc_id").as("doc1"), col("sh").as("sh1"))
          val b = docs.select(col("doc_id").as("doc2"), col("sh").as("sh2"))
          a.join(b, col("doc1") < col("doc2")
              && graft.functions.Text.jaccardSim(col("sh1"), col("sh2")) >= 0.8)
            .select(col("doc1"), col("doc2"))
        }
      val n = df.count()
      val plan = df.queryExecution.executedPlan.toString
      val shape = if (plan.contains("BroadcastNestedLoopJoin")) "BNLJ"
        else if (plan.contains("CartesianProduct")) "cartesian"
        else "bucketed-equality"
      println(f"[simjoin] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($shape, $n pairs)")
      n
    }
    val skipControl = args.contains("--no-control")
    val b = run(s"rule ON  (prefix-filtered, doc_id<$bound)", ruleOn = true)
    if (!skipControl) {
      val a = run(s"rule OFF (nested loop,      doc_id<$bound)", ruleOn = false)
      require(a == b, s"pair counts diverged: naive $a vs rewritten $b")
      println(s"[simjoin] identical results: $b pairs")
    }
    spark.stop()
  }
}
