package graft.tools

import graft.core.GraftSession
import graft.operators.Similarity

/** Fixture-time codebook trainer (dev tool): runs distributed Lloyd's
  * k-means ([[Similarity.kmeansCodebook]]) on a named sf and prints the
  * resulting centroids — rounded to 6 decimals — as the Scala source of
  * [[graft.operators.TrainedCodebook]].
  *
  * Iterative float means are not portably hash-comparable across engines,
  * so the TRAINING stays spec-verified (KMeansSpec invariants) while the
  * ASSIGNMENT under the resulting pinned centroids is deterministic and
  * oracle-gated (q66): rerun this tool only to regenerate the fixture.
  *
  *   sbt "runMain graft.tools.TrainCodebook sf0.001 8 5"
  */
object TrainCodebook {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.001")}"
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val iters = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val cents = Similarity.kmeansCodebook(spark, sfDir, k, iters)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).map(x => math.rint(x * 1e6) / 1e6)))
      .sortBy(_._1)
    println(s"  // trained by: runMain graft.tools.TrainCodebook ${args.mkString(" ")}")
    println(s"  val centroids: Seq[(Long, Seq[Double])] = Seq(")
    cents.foreach { case (cid, v) =>
      println(s"    (${cid}L, Seq(${v.mkString(", ")})),")
    }
    println("  )")
    spark.stop()
  }
}
