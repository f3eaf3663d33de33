package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.datagen.DataGen
import graft.streaming.Sessionize

/** Large-n stress check (dev tool): sessionize synthetic events well beyond
  * the testdata scale to observe throughput and shuffle behavior the bench
  * corpus can't exercise. Rows are generated distributed (spark.range), so
  * n is bounded by time, not driver memory.
  *
  *   sbt "runMain graft.tools.Stress 20000000"
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20_000_000L)
    val nDocsArg = args.lift(1).map(_.toLong).getOrElse(100_000L)
    val spark = GraftSession.local(32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name: $rows%,d rows in $secs%.1f s (${n / secs / 1e6}%.1f M events/s)")
    }
    val events = DataGen.syntheticEvents(spark, n)
    time("tumbling sessionize")(
      Sessionize.tumbling(events).count())
    time("gap sessionize")(
      Sessionize.gapSession(events, gap = "5 minutes").count())
    time("user rollup")(
      events.groupBy(col("user_id"))
        .agg(count(lit(1)), countDistinct(col("event_type"))).count())

    // dedup at 20× the sf0.1 corpus: synthesize a documents table (with
    // planted near-dups: every 50th doc repeats the previous doc's words
    // plus one) and run the full MinHash-LSH pipeline against it
    val nDocs = nDocsArg
    val docDir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          concat(lit("w"), pmod(xxhash64(when(col("id") % 50 === 0, col("id") - 1)
            .otherwise(col("id")), lit(j)), lit(5000)))): _*).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
        lit(0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$docDir/documents.parquet")
    time(s"minhash signatures ($nDocs docs)")(
      graft.operators.Dedup.minhashSignatures(spark, docDir).count())
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.minhashPairs(spark, docDir, threshold = 0.7).count()
    println(f"[stress] minhash LSH pairs ($nDocs docs): $pairs pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // resolve the planted pairs into canonical clusters: every 50th doc
    // pairs with its predecessor, so expected components of size 2 =
    // nDocs/50 (minus doc 0's self-reference guard) and everything else
    // is a singleton
    val t1 = System.nanoTime()
    val comps = graft.operators.Curation.dedupComponents(spark, docDir, threshold = 0.7)
    val clustered = comps.where(col("doc_id") =!= col("component")).count()
    println(f"[stress] connected components ($nDocs docs): $clustered docs folded into clusters in ${(System.nanoTime() - t1) / 1e9}%.1f s")

    // round-3 curation operators at the same 20× corpus: chunk-level dedup
    // (planted near-dups share every chunk), decontamination (1/97 of docs
    // act as the benchmark slice), repetition metrics (map-side), and the
    // cross-source leakage matrix (sources cycle src0..src19, so the
    // planted adjacent-id near-dups land in different sources)
    val t2 = System.nanoTime()
    val sharedDocs = graft.operators.Dedup.chunkShared(spark, docDir)
      .where(col("n_shared_chunks") > 0).count()
    println(f"[stress] chunk dedup ($nDocs docs): $sharedDocs docs with shared chunks in ${(System.nanoTime() - t2) / 1e9}%.1f s")
    val t3 = System.nanoTime()
    val contaminated = graft.operators.Curation.decontaminate(spark, docDir)
      .where(col("contaminated") === 1).count()
    println(f"[stress] decontamination ($nDocs docs): $contaminated contaminated docs in ${(System.nanoTime() - t3) / 1e9}%.1f s")
    // noop write, not count(): count() lets Catalyst prune the map-side
    // projection and times an empty scan (the PERF.md bench gotcha)
    val t4 = System.nanoTime()
    graft.analytics.TextAnalytics.repetition(spark, docDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[stress] repetition metrics ($nDocs docs): full noop evaluation in ${(System.nanoTime() - t4) / 1e9}%.1f s")
    val t5 = System.nanoTime()
    val leakPairs = graft.operators.Dedup.sourceLeakage(spark, docDir).count()
    println(f"[stress] source leakage ($nDocs docs): $leakPairs source pairs in ${(System.nanoTime() - t5) / 1e9}%.1f s")

    // round-4 operators at the same corpus: tf-idf under the de-skewed df
    // plan (persisted tf + broadcast df), sliding-window chunking, and the
    // pinned-weight quality model (both map-side)
    val t6 = System.nanoTime()
    val tfidfRows = graft.analytics.TextAnalytics.tfidfTopTerms(spark, docDir).count()
    println(f"[stress] tf-idf top terms ($nDocs docs): $tfidfRows rows in ${(System.nanoTime() - t6) / 1e9}%.1f s")
    val t7 = System.nanoTime()
    val chunkRows = graft.analytics.TextAnalytics.slidingChunks(spark, docDir).count()
    println(f"[stress] sliding chunks ($nDocs docs): $chunkRows chunks in ${(System.nanoTime() - t7) / 1e9}%.1f s")
    val t8 = System.nanoTime()
    val keptDocs = graft.analytics.TextAnalytics.qualityModelScore(spark, docDir)
      .where(col("keep") === 1).count()
    println(f"[stress] quality model ($nDocs docs): $keptDocs kept in ${(System.nanoTime() - t8) / 1e9}%.1f s")

    // round-5 operators at the same corpus: winnowing fingerprints (the
    // hash-once window plan), winnow-collision dedup, the PII regex chain,
    // and temperature-smoothed mixing
    val t9 = System.nanoTime()
    val fpRows = graft.analytics.TextAnalytics.winnowFingerprints(spark, docDir).count()
    println(f"[stress] winnow fingerprints ($nDocs docs): $fpRows rows in ${(System.nanoTime() - t9) / 1e9}%.1f s")
    val t10 = System.nanoTime()
    val wPairs = graft.operators.Dedup.winnowPairs(spark, docDir, threshold = 0.7).count()
    println(f"[stress] winnow-collision pairs ($nDocs docs): $wPairs pairs in ${(System.nanoTime() - t10) / 1e9}%.1f s")
    // noop write: a count() would prune the regex projection entirely
    val t11 = System.nanoTime()
    graft.streaming.StreamCurate.scrubPii(
        graft.core.Tables.documents(spark, docDir))
      .write.format("noop").mode("overwrite").save()
    println(f"[stress] pii scrub ($nDocs docs): full noop evaluation in ${(System.nanoTime() - t11) / 1e9}%.1f s")
    val t12 = System.nanoTime()
    val mixKept = graft.operators.Curation.domainMixTemperature(spark, docDir).count()
    println(f"[stress] temperature mix ($nDocs docs): $mixKept kept in ${(System.nanoTime() - t12) / 1e9}%.1f s")

    // round-5b operators at the same corpus: boilerplate scrub (planted
    // dups share every chunk, so the flagged set is well-populated),
    // frequent n-grams (two-level aggregate), per-source score calibration
    // (histogram CDF + broadcast join-back), and the per-source quality cap
    // (WindowGroupLimit). Semantic resolution is not re-stressed here: its
    // component and (component, dim) aggregate stages are the
    // dedupComponents / randomProjection shapes stressed above, and its
    // pair stage is q68's, whose cell count k is a corpus-scale parameter
    // (the pinned 8-cell fixture codebook would quadratically explode at
    // 100k vectors by design, not by plan defect).
    val t9b = System.nanoTime()
    graft.operators.Curation.boilerplateScrub(spark, docDir)
      .write.format("noop").mode("overwrite").save() // count() would prune clean_text
    println(f"[stress] boilerplate scrub ($nDocs docs): full noop evaluation in ${(System.nanoTime() - t9b) / 1e9}%.1f s")
    val t10b = System.nanoTime()
    val hotGrams = graft.analytics.TextAnalytics.frequentNgrams(spark, docDir).count()
    println(f"[stress] frequent n-grams ($nDocs docs): $hotGrams rows in ${(System.nanoTime() - t10b) / 1e9}%.1f s")
    val t11b = System.nanoTime()
    graft.analytics.TextAnalytics.scoreCalibration(spark, docDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[stress] score calibration ($nDocs docs): full noop evaluation in ${(System.nanoTime() - t11b) / 1e9}%.1f s")
    val t12b = System.nanoTime()
    val capped = graft.analytics.TextAnalytics.topQualityPerSource(spark, docDir).count()
    println(f"[stress] per-source quality cap ($nDocs docs): $capped kept in ${(System.nanoTime() - t12b) / 1e9}%.1f s")

    // round-5c text/graph operators at the same corpus: BM25 (shared tf
    // table + broadcast stats), bigram surprisal (the broadcast bigram-LM
    // table is the stress point: ~5M distinct bigrams at this vocab), and
    // integer PageRank over the planted near-dup graph
    val t13a = System.nanoTime()
    val bmRows = graft.analytics.TextAnalytics.bm25Rank(spark, docDir,
      terms = Seq("w0", "w1", "w2", "w3")).count()
    println(f"[stress] bm25 ($nDocs docs): $bmRows rows in ${(System.nanoTime() - t13a) / 1e9}%.1f s")
    val t13b = System.nanoTime()
    val bgRows = graft.analytics.TextAnalytics.bigramSurprisal(spark, docDir).count()
    println(f"[stress] bigram surprisal ($nDocs docs): $bgRows rows in ${(System.nanoTime() - t13b) / 1e9}%.1f s")
    val t13c = System.nanoTime()
    val prRows = graft.operators.Curation.dedupPagerank(spark, docDir, threshold = 0.7).count()
    println(f"[stress] pagerank ($nDocs docs): $prRows edge-touched nodes in ${(System.nanoTime() - t13c) / 1e9}%.1f s")
    val t13d = System.nanoTime()
    val cdcRows = graft.analytics.TextAnalytics.cdcChunks(spark, docDir).count()
    println(f"[stress] cdc chunks ($nDocs docs): $cdcRows chunks in ${(System.nanoTime() - t13d) / 1e9}%.1f s")
    val t13e = System.nanoTime()
    val estRows = graft.operators.Dedup.minhashEstimatorAudit(spark, docDir, threshold = 0.7).count()
    println(f"[stress] minhash estimator audit ($nDocs docs): $estRows pairs in ${(System.nanoTime() - t13e) / 1e9}%.1f s")
    val t13f = System.nanoTime()
    val curRows = graft.operators.Curation.curriculumPacking(spark, docDir).count()
    println(f"[stress] curriculum packing ($nDocs docs): $curRows rows in ${(System.nanoTime() - t13f) / 1e9}%.1f s")
    // margin-gated dedup vs the always-verify pipeline: both reuse the
    // memoized signature/shingle tables built above, so the delta isolates
    // the verify-stage cost the margins skip
    val t13g = System.nanoTime()
    val fastAll = graft.operators.Dedup.minhashPairsFast(spark, docDir, threshold = 0.7)
      .collect()
    val skipped = fastAll.count(_.getInt(3) == 0)
    println(f"[stress] minhash fast pairs ($nDocs docs): ${fastAll.length} pairs " +
      f"($skipped accepted without exact verify) in ${(System.nanoTime() - t13g) / 1e9}%.1f s")
    // round-6 heavies: the intra-doc repeated-gram window (composite-keyed),
    // the normalized-dedup hash shuffle, and the incremental near-dup
    // (batch bands vs history, zero history shuffle)
    val t13h = System.nanoTime()
    val rgRows = graft.analytics.TextAnalytics.repeatedGrams(spark, docDir).count()
    println(f"[stress] repeated grams ($nDocs docs): $rgRows rows in ${(System.nanoTime() - t13h) / 1e9}%.1f s")
    val t13i = System.nanoTime()
    val ndRows = graft.operators.Dedup.normalizedDedup(spark, docDir)
      .where(col("is_duplicate") === 1).count()
    println(f"[stress] normalized dedup ($nDocs docs): $ndRows duplicates in ${(System.nanoTime() - t13i) / 1e9}%.1f s")
    val t13j = System.nanoTime()
    val inRows = graft.operators.Dedup.incrementalNearDup(spark, docDir).count()
    println(f"[stress] incremental near-dup ($nDocs docs): $inRows hits in ${(System.nanoTime() - t13j) / 1e9}%.1f s")

    // round-6b operators at the same corpus: triangle counting (the wedge
    // join over the planted pair graph), incremental component merge
    // (history contracts to label edges), trigram novelty (the biggest
    // gram stream here: distinct + df + join-back), OOV rate (k-bounded
    // vocab broadcast), exponential-clock weighted sampling (pure k-heap),
    // the cross-source pair matrix, pairwise feature correlation (one
    // pass, decimal sums), and the epoch plan (metadata-sized)
    val t13k = System.nanoTime()
    val triRows = graft.operators.Curation.triangleCounts(spark, docDir).count()
    println(f"[stress] triangle counts ($nDocs docs): $triRows docs in triangles in ${(System.nanoTime() - t13k) / 1e9}%.1f s")
    val t13l = System.nanoTime()
    val incRows = graft.operators.Curation.incrementalComponents(spark, docDir).count()
    println(f"[stress] incremental components ($nDocs docs): $incRows labels in ${(System.nanoTime() - t13l) / 1e9}%.1f s")
    val t13m = System.nanoTime()
    val novRows = graft.analytics.TextAnalytics.noveltyScore(spark, docDir).count()
    println(f"[stress] trigram novelty ($nDocs docs): $novRows rows in ${(System.nanoTime() - t13m) / 1e9}%.1f s")
    val t13n = System.nanoTime()
    val oovRows = graft.analytics.TextAnalytics.oovRate(spark, docDir).count()
    println(f"[stress] oov rate ($nDocs docs): $oovRows rows in ${(System.nanoTime() - t13n) / 1e9}%.1f s")
    val t13o = System.nanoTime()
    val wsRows = graft.operators.Curation.weightedSample(spark, docDir).count()
    println(f"[stress] weighted sample ($nDocs docs): $wsRows rows in ${(System.nanoTime() - t13o) / 1e9}%.1f s")
    val t13p = System.nanoTime()
    val csRows = graft.operators.Dedup.crossSourceMatrix(spark, docDir).count()
    println(f"[stress] cross-source matrix ($nDocs docs): $csRows source pairs in ${(System.nanoTime() - t13p) / 1e9}%.1f s")
    val t13q = System.nanoTime()
    val fcRows = graft.analytics.TextAnalytics.featureCorrelation(spark, docDir).count()
    println(f"[stress] feature correlation ($nDocs docs): $fcRows pairs in ${(System.nanoTime() - t13q) / 1e9}%.1f s")
    val t13r = System.nanoTime()
    val epRows = graft.operators.Curation.mixtureEpochPlan(spark, docDir).count()
    println(f"[stress] epoch plan ($nDocs docs): $epRows sources in ${(System.nanoTime() - t13r) / 1e9}%.1f s")

    // JL projection, PQ encode/ADC, and cluster-balanced sampling over a
    // synthetic embeddings table at 100× the bench vector count (64-dim
    // floats from the pinned hash — the corpus schema's shape)
    val nVecs = 200_000L
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => (pmod(xxhash64(col("id"), j), lit(1000)).cast("double") / 500.0 - 1.0)
            .cast("float")).as("embedding"),
        pmod(col("id"), lit(16)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$docDir/embeddings.parquet")
    val t13 = System.nanoTime()
    val projRows = graft.operators.Similarity.randomProjection(spark, docDir).count()
    println(f"[stress] random projection ($nVecs vecs): $projRows rows in ${(System.nanoTime() - t13) / 1e9}%.1f s")
    val t14 = System.nanoTime()
    val pqRows = graft.operators.Similarity.pqEncode(spark, docDir).count()
    println(f"[stress] pq encode ($nVecs vecs): $pqRows rows in ${(System.nanoTime() - t14) / 1e9}%.1f s")
    val t15 = System.nanoTime()
    val adcRows = graft.operators.Similarity.pqTopK(spark, docDir).count()
    println(f"[stress] pq ADC top-k ($nVecs vecs): $adcRows rows in ${(System.nanoTime() - t15) / 1e9}%.1f s")
    val t16 = System.nanoTime()
    val cbsRows = graft.operators.Similarity.clusterBalancedSample(spark, docDir).count()
    println(f"[stress] cluster-balanced sample ($nVecs vecs): $cbsRows rows in ${(System.nanoTime() - t16) / 1e9}%.1f s")
    val t17 = System.nanoTime()
    val eaRows = graft.operators.Similarity.embeddingAudit(spark, docDir).count()
    println(f"[stress] embedding audit ($nVecs vecs): $eaRows labels in ${(System.nanoTime() - t17) / 1e9}%.1f s")
    val t18 = System.nanoTime()
    val rrfRows = graft.operators.Similarity.hybridRetrievalRRF(spark, docDir).count()
    println(f"[stress] hybrid RRF ($nVecs vecs semantic, $nDocs docs lexical): $rrfRows fused rows in ${(System.nanoTime() - t18) / 1e9}%.1f s")
    spark.stop()
  }
}
