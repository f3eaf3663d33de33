package graft.tools

import graft.core.GraftSession
import org.apache.spark.sql.functions._

/** Round-13 scale stress: the TEXT/DEDUP stack on a synthetic corpus 20×
  * (default 100k docs) to 200× (1M) the sf0.1 gate corpus, with PLANTED
  * closed-form truth — the operators this round re-laid-out
  * (documentsSpread + the array_distinct shingle cache) driven through
  * their REAL sfDir entry points against a multi-file parquet table.
  *
  * Corpus construction (fully distributed, deterministic from doc_id —
  * no driver-side text):
  *  - nBase unique docs of 48 words drawn from a 64-word vocab by
  *    xxhash64(base_id, position); every 20th base (base_id % 20 == 7)
  *    additionally carries a fixed 5-word boilerplate tail;
  *  - nExact EXACT duplicates (doc i copies base i − nBase byte-identically);
  *  - nNear NEAR duplicates: the base text with exactly ONE word replaced
  *    by a corpus-unique token ("zz<doc_id>") — 3-shingle Jaccard
  *    ≈ (n−3)/(n+3) ≈ 0.88 against the base, above the 0.8 LSH gate.
  *
  * Legs (each asserts, not just times):
  *  1. exactGroups — duplicate-group count must equal nExact exactly
  *     (base texts are hash-injective at these sizes; near-dup
  *     replacements are unique by construction).
  *  2. minhashPairs(0.8) — recall of planted exact pairs must be 100%
  *     (identical signatures share every band); recall of planted near
  *     pairs must be ≥ 90% (16 perms / 4 bands s-curve gives ~97% at
  *     J≈0.88); every emitted pair is exact-verified ≥ 0.8 by the
  *     operator itself.
  *  3. frequentNgrams(5) — the planted boilerplate 5-gram must rank #1
  *     with its document frequency bit-exact (bases with the tail, plus
  *     their exact and near copies).
  *
  * Run: `sbt "runMain graft.tools.Stress13 [nDocs]"` (default 100000;
  * nDocs is split 90/5/5 into base/exact/near).
  */
object Stress13 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100_000L)
    val nBase = n * 90 / 100
    val nExact = n * 5 / 100
    val nNear = n - nBase - nExact
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    val tmpSf = java.nio.file.Files.createTempDirectory("graft-stress13").toString
    val vocabArr = array((0 until 64).map(w => lit(s"w$w")): _*)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress13] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    time(f"generate $n%,d docs ($nBase%,d base / $nExact%,d exact / $nNear%,d near)") {
      val ids = spark.range(n).select(
        col("id").as("doc_id"),
        when(col("id") < nBase, col("id"))
          .when(col("id") < nBase + nExact, col("id") - nBase)
          .otherwise(col("id") - nBase - nExact).as("base_id"),
        when(col("id") < nBase, lit("base"))
          .when(col("id") < nBase + nExact, lit("exact"))
          .otherwise(lit("near")).as("kind"))
      val baseWords = transform(sequence(lit(0), lit(47)),
        i => element_at(vocabArr,
          pmod(xxhash64(col("base_id"), i), lit(64)).cast("int") + 1))
      val withBoiler = when(pmod(col("base_id"), lit(20)) === 7,
        concat(baseWords,
          array(lit("the"), lit("quick"), lit("brown"), lit("fox"), lit("jumps"))))
        .otherwise(baseWords)
      val mutated = when(col("kind") === "near",
        transform(withBoiler, (w, i) =>
          when(i === 23, concat(lit("zz"), col("doc_id"))).otherwise(w)))
        .otherwise(withBoiler)
      val docs = ids.select(
        col("doc_id"),
        concat_ws(" ", mutated).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(4))).as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      // multi-file layout: the 100 TB arrival shape, NOT the one-split
      // gate fixture — the spread helpers must be harmless here
      docs.repartition(32).write.mode("overwrite").parquet(s"$tmpSf/documents.parquet")
    }

    // leg 1: exact dedup — groups with multiplicity MUST number nExact
    time("exactGroups") {
      val groups = graft.operators.Dedup.exactGroups(spark, tmpSf)
        .where(col("n_docs") >= 2)
      val byMult = groups.groupBy(col("n_docs")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap // multiplicity -> #groups
      val nGroups = groups.count()
      require(nGroups == nExact,
        s"expected $nExact exact-duplicate groups, got $nGroups ($byMult)")
      nGroups
    }

    // leg 2: minhash LSH near-dup at threshold 0.8
    val pairs = time("minhashPairs(0.8) build") {
      val p = graft.operators.Dedup.minhashPairs(spark, tmpSf, threshold = 0.8)
        .select(col("doc1"), col("doc2"))
      p.persist()
      println(f"[stress13]   emitted pairs: ${p.count()}%,d")
      p
    }
    time("minhashPairs recall check") {
      val exactPlanted = spark.range(nExact).select(
        col("id").as("doc1"), (col("id") + nBase).as("doc2"))
      val nearPlanted = spark.range(nNear).select(
        col("id").as("doc1"), (col("id") + nBase + nExact).as("doc2"))
      val exactHit = exactPlanted.join(pairs, Seq("doc1", "doc2")).count()
      val nearHit = nearPlanted.join(pairs, Seq("doc1", "doc2")).count()
      val nearRecall = nearHit.toDouble / nNear
      println(f"[stress13]   exact recall: $exactHit%,d/$nExact%,d, " +
        f"near recall: $nearHit%,d/$nNear%,d (${nearRecall * 100}%.1f%%)")
      require(exactHit == nExact,
        s"exact-duplicate pairs must ALL surface (identical signatures): $exactHit/$nExact")
      require(nearRecall >= 0.9,
        f"near-dup recall $nearRecall%.3f below the 0.9 floor (s-curve predicts ~0.97)")
    }

    // leg 3: boilerplate heavy-hitter — #1 by df, count bit-exact
    time("frequentNgrams(5)") {
      val top = graft.analytics.TextAnalytics.frequentNgrams(spark, tmpSf, n = 5, k = 5)
        .collect()
      val phrase = "the quick brown fox jumps"
      // docs carrying the tail: bases ≡ 7 (mod 20), plus every exact and
      // near copy whose base is ≡ 7 (the near mutation touches word 23,
      // never the tail)
      def carriers(count: Long): Long = (0L until count).count(b => b % 20 == 7)
      val expected = carriers(nBase) + carriers(nExact) + carriers(nNear)
      val first = top.head
      require(first.getAs[String]("gram") == phrase,
        s"expected the planted boilerplate 5-gram first, got: ${top.toSeq}")
      require(first.getAs[Long]("n_docs") == expected,
        s"boilerplate df: expected $expected, got ${first.getAs[Long]("n_docs")}")
      println(f"[stress13]   boilerplate df bit-exact: $expected%,d docs")
    }

    pairs.unpersist()
    println(s"[stress13] ALL LEGS PASSED at n=$n")
    spark.stop()
  }
}
