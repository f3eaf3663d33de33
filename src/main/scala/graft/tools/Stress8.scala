package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession

/** Round-8 multimodal stress (dev tool): drives the q284-q288 media
  * pipeline at 20-100× the sf0.1 corpus — synthetic documents with the
  * testdata schema whose text bytes stand in for encoded payloads, the
  * same substitution the operators themselves make. Measures the narrow
  * mapPartitions stages (decode, frame sampling, feature extraction) as
  * corpus-linear throughput and the dedup/ANN stages as
  * candidate-bounded aggregates; planted duplicate payloads (every
  * docs-per-dup'th document repeats the payload of its anchor) give the
  * frame dedup a known answer to find.
  *
  *   sbt "runMain graft.tools.Stress8 100000 20"
  */
object Stress8 {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(100_000L)
    val docsPerDup = args.lift(1).map(_.toLong).getOrElse(20L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[stress8] $name: $rows%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_r8").toString
    // duplicate payloads: doc i with i % docsPerDup == 1 reuses the text
    // of anchor i-1, so every (anchor, copy) pair shares ALL frames
    val seed = when(pmod(col("id"), lit(docsPerDup)) === 1, col("id") - 1)
      .otherwise(col("id"))
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64(seed, lit(j)), lit(5000)))): _*)
          .as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        lit(360L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    time(s"decode meta ($nDocs payloads)")(
      graft.operators.Multimodal.decodeMeta(spark, dir).count())
    time(s"frame sample ($nDocs payloads, stride 2)")(
      graft.operators.Multimodal.frameSample(spark, dir).count())
    time(s"byte features ($nDocs payloads, d=8)")(
      graft.operators.Multimodal.byteHistogramFeatures(spark, dir).count())
    time(s"resize plan ($nDocs payloads)")(
      graft.operators.Multimodal.resizePlan(spark, dir).count())
    val expectDups = nDocs / docsPerDup
    time(s"frame dedup ($nDocs payloads, ~$expectDups planted dup docs)")(
      graft.operators.Multimodal.frameDedup(spark, dir).count())
    // with planted byte-identical payloads the verify pass must confirm
    // real duplicate groups (verified=1), not only checksum collisions
    time(s"frame dedup verify ($nDocs payloads)") {
      val v = graft.operators.Multimodal.frameDedupVerify(spark, dir)
        .agg(sum(when(col("verified") === 1, 1L).otherwise(0L)).as("nv"),
          count(lit(1)).as("n")).collect()(0)
      println(s"[stress8]   verified dup groups: ${v.getLong(0)} of ${v.getLong(1)}")
      v.getLong(1)
    }
    time(s"feature ann ($nDocs candidates, 50 queries)")(
      graft.operators.Multimodal.mediaFeatureAnn(spark, dir).count())
    // the production dedup key: the digest itself. Every planted
    // (anchor, copy) pair shares all sampled frames byte-for-byte, so the
    // digest-keyed group count must track the planted duplicates — and
    // unlike the byte-sum key it cannot be contaminated by collisions
    time(s"digest-keyed dedup ($nDocs payloads)") {
      import spark.implicits._
      val groups = graft.operators.Multimodal
        .withPayload(spark, dir).as[graft.operators.Multimodal.MediaRecord]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            md.reset(); md.update(r.payload)
            (r.doc_id, md.digest().map("%02x".format(_)).mkString)
          }
        }.toDF("doc_id", "payload_md5")
        .groupBy("payload_md5").count().where(col("count") >= 2).count()
      println(s"[stress8]   whole-payload digest dup groups: $groups" +
        s" (planted: ${nDocs / docsPerDup})")
      groups
    }
    spark.stop()
  }
}
