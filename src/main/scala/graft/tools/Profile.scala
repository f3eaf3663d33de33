package graft.tools

import graft.core.GraftSession
import graft.operators.{Dedup, Similarity}

/** Ad-hoc operator profiler (dev tool): full evaluation via the noop sink. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup")(Dedup.exactGroups(spark, sfDir))
    time("minhash_signatures")(Dedup.minhashSignatures(spark, sfDir))
    time("minhash_pairs")(Dedup.minhashPairs(spark, sfDir))
    time("simhash_docs")(Dedup.simhashDocs(spark, sfDir))
    time("simhash_pairs")(Dedup.simhashPairs(spark, sfDir))
    time("jaccard_pairs")(Dedup.jaccardPairs(spark, sfDir))
    time("ann_bruteforce")(Similarity.bruteForceTopK(spark, sfDir))
    spark.stop()
  }
}
