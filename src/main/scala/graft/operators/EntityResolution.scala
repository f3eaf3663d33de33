package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** Probabilistic record linkage (Fellegi & Sunter, JASA 1969) over the
  * document corpus: block, compare, and estimate per-feature match/
  * non-match agreement probabilities — the scoring backbone of every
  * production entity-resolution system (Splink-style), re-expressed
  * Spark-first.
  *
  * Pipeline shape: a BLOCKING key ((lang, length-bucket)) bounds the
  * comparison space (the classic ER move — compare within blocks only);
  * each blocked pair gets cheap agreement features (same source, length
  * proximity, simhash hamming); ground truth for the probability
  * estimates is exact 3-gram set-Jaccard ≥ 0.7 computed ONLY on the
  * blocked pairs (integer cross-multiplied compare — no float
  * threshold). m_j = P(agree_j | match) and u_j = P(agree_j | non-match)
  * get Laplace-smoothed counts (½/(n+1)) so log-weights are always
  * finite; ln is rounded once per feature (the q71 surprisal contract).
  *
  * Scale: blocking is the quadratic hazard — a block of size s costs
  * s²/2 comparisons, so key choice is capacity planning (documented: at
  * corpus scale tighten the key or switch the candidate generator to
  * the LSH band pairs of [[Dedup.minhashPairs]], which this module's
  * features then score identically). Everything after pairing is
  * feature-keyed aggregation.
  */
object EntityResolution {

  /** Per-feature Fellegi-Sunter parameter table (q316): pair census,
    * smoothed m/u, and agreement/disagreement log-weights.
    */
  /** Memoized blocked-pair feature rows (is_match + the three agreement
    * flags) shared by [[fellegiSunter]] and [[fsScorePatterns]] — ONE
    * quadratic-per-block pair pass per session. Shingles travel as
    * md5-prefix 32-bit longs (hash-set Jaccard, the minhash-family
    * convention — 8-byte array elements instead of ~30-byte strings cut
    * the intersect cost and the broadcast size; both engines hash
    * identically so the label is bit-stable).
    */
  private def blockedPairFeatures(spark: SparkSession, sfDir: String,
      lenBucket: Int, lenTol: Int, hammingTol: Int,
      jaccardT: (Int, Int)): DataFrame =
    SessionMemo.durable(spark, sfDir,
      s"erPairs|$sfDir|$lenBucket|$lenTol|$hammingTol|$jaccardT") {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          expr(s"n_chars div $lenBucket").as("blk"),
          array_distinct(transform(Text.shingles(col("text")),
            s => graft.functions.Hashing.stableHash32(s))).as("shl"))
        .join(Dedup.simhashDocs(spark, sfDir), "doc_id")
        .localCheckpoint()
      def side(t: String) = docs.select(
        col("doc_id").as(s"id_$t"), col("lang"), col("blk"),
        col("source").as(s"src_$t"), col("n_chars").as(s"len_$t"),
        col("shl").as(s"shl_$t"), col("simhash").as(s"sh_$t"))
      val pairs = side("a").join(side("b"), Seq("lang", "blk"))
        .where(col("id_a") < col("id_b"))
      val inter = size(array_intersect(col("shl_a"), col("shl_b")))
      val uni = size(col("shl_a")) + size(col("shl_b")) - inter
      val (jNum, jDen) = jaccardT
      pairs.select(
        // exact-integer Jaccard threshold: inter/uni ≥ jNum/jDen
        (inter * jDen >= uni * jNum && uni > 0).cast("int").as("is_match"),
        (col("src_a") === col("src_b")).cast("int").as("f_same_source"),
        (abs(col("len_a") - col("len_b")) <= lenTol).cast("int").as("f_len_close"),
        (bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= hammingTol)
          .cast("int").as("f_simhash_near"))
    }

  def fellegiSunter(spark: SparkSession, sfDir: String,
      lenBucket: Int = 64, lenTol: Int = 16, hammingTol: Int = 8,
      jaccardT: (Int, Int) = (7, 10)): DataFrame = {
    val feat = blockedPairFeatures(spark, sfDir, lenBucket, lenTol,
      hammingTol, jaccardT)
    val stacked = feat.select(col("is_match"),
      expr("stack(3, 'same_source', f_same_source, 'len_close', f_len_close, " +
        "'simhash_near', f_simhash_near) AS (feature, agree)"))
    val byFeature = stacked.groupBy(col("feature"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("is_match")).as("n_match"),
        sum(col("is_match") * col("agree")).as("match_agree"),
        sum((lit(1) - col("is_match")) * col("agree")).as("nonmatch_agree"))
    // Laplace-smoothed probabilities: (agree + 0.5) / (n + 1) — finite
    // weights even for perfectly-(dis)agreeing features
    val m = (col("match_agree").cast("double") + lit(0.5)) /
      (col("n_match").cast("double") + lit(1.0))
    val u = (col("nonmatch_agree").cast("double") + lit(0.5)) /
      ((col("n_pairs") - col("n_match")).cast("double") + lit(1.0))
    byFeature.select(col("feature"),
      col("n_pairs").cast("long").as("n_pairs"),
      col("n_match").cast("long").as("n_match"),
      col("match_agree").cast("long").as("match_agree"),
      col("nonmatch_agree").cast("long").as("nonmatch_agree"),
      round(m, 6).as("m_prob"),
      round(u, 6).as("u_prob"),
      round(log(m / u), 6).as("agree_weight_ln"),
      round(log((lit(1.0) - m) / (lit(1.0) - u)), 6).as("disagree_weight_ln"))
  }

  /** Fellegi-Sunter score patterns (q318): the 2³ feature-agreement
    * patterns with their pair counts, observed match rates and composite
    * log-weight score (Σ per-feature agree/disagree weights from
    * [[fellegiSunter]]'s m/u estimates) — the match-weight table a
    * Splink-style linker thresholds on, and the empirical check that
    * score orders match rate. Shares the memoized feature table and the
    * pair pass shape with q316.
    */
  def fsScorePatterns(spark: SparkSession, sfDir: String,
      lenBucket: Int = 64, lenTol: Int = 16, hammingTol: Int = 8,
      jaccardT: (Int, Int) = (7, 10)): DataFrame = {
    val feat = blockedPairFeatures(spark, sfDir, lenBucket, lenTol,
      hammingTol, jaccardT)
      .select(col("is_match"), col("f_same_source").as("f_src"),
        col("f_len_close").as("f_len"), col("f_simhash_near").as("f_sim"))
    val params = fellegiSunter(spark, sfDir, lenBucket, lenTol, hammingTol,
      jaccardT)
      .select(col("feature"), col("agree_weight_ln"),
        col("disagree_weight_ln"))
    // correlated pick via broadcast pivot: 3 features → 6 scalar weights
    def weightOf(name: String, flag: Column): Column =
      when(flag === 1, col(s"aw_$name")).otherwise(col(s"dw_$name"))
    val pivoted = params.groupBy()
      .pivot(col("feature"), Seq("same_source", "len_close", "simhash_near"))
      .agg(first(col("agree_weight_ln")).as("aw"),
        first(col("disagree_weight_ln")).as("dw"))
      .toDF("aw_src", "dw_src", "aw_len", "dw_len", "aw_sim", "dw_sim")
    feat.crossJoin(broadcast(pivoted))
      .withColumn("score_ln",
        round(weightOf("src", col("f_src")) + weightOf("len", col("f_len"))
          + weightOf("sim", col("f_sim")), 6))
      .groupBy(col("f_src"), col("f_len"), col("f_sim"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("is_match")).cast("long").as("n_match"),
        max(col("score_ln")).as("score_ln"))
      .withColumn("match_rate",
        round(col("n_match").cast("double") / col("n_pairs").cast("double"), 6))
  }

  /** Blocking-quality audit (q317): reduction ratio (how much of the
    * all-pairs space the (lang, length-bucket) key eliminates) and pair
    * completeness (what fraction of TRUE near-dup pairs — the corpus-wide
    * exact-Jaccard ≥ 0.7 truth set — survive inside blocks). The two
    * numbers every ER design review asks for before trusting a blocking
    * key; q316's probabilities are only as good as this recall.
    *
    * Scale shape: the truth set is the memoized q73-recipe prefix-filter
    * join (equality-keyed, corpus-safe); blocked-pair counting is a
    * per-block s·(s−1)/2 SUM over block sizes — computed from the
    * block-size aggregate, NOT by materializing the pairs; only the
    * truth∩block probe touches pair rows (truth-set-sized). All 1-row
    * aggregates combine via broadcast cross joins.
    */
  def blockingAudit(spark: SparkSession, sfDir: String,
      lenBucket: Int = 64, threshold: Double = 0.7): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        expr(s"n_chars div $lenBucket").as("blk"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val blockedCount = d.groupBy(col("lang"), col("blk"))
      .agg(count(lit(1)).as("s"))
      .agg(sum(col("s") * (col("s") - 1) / 2).cast("long")
        .as("n_blocked_pairs"))
    val truth = Dedup.jaccardPairsPrefix(spark, sfDir, threshold)
      .select(col("doc1"), col("doc2"))
    val truthCount = truth.agg(count(lit(1)).as("n_truth"))
    val inBlock = truth
      .join(d.select(col("doc_id").as("doc1"), col("lang"), col("blk")), "doc1")
      .join(d.select(col("doc_id").as("doc2"), col("lang").as("l2"),
        col("blk").as("b2")), "doc2")
      .where(col("lang") === col("l2") && col("blk") === col("b2"))
      .agg(count(lit(1)).as("n_truth_in_block"))
    nDocs.crossJoin(broadcast(blockedCount))
      .crossJoin(broadcast(truthCount))
      .crossJoin(broadcast(inBlock))
      .select(col("n_docs"),
        (col("n_docs") * (col("n_docs") - 1) / 2).cast("long")
          .as("n_total_pairs"),
        col("n_blocked_pairs"), col("n_truth"), col("n_truth_in_block"),
        round(lit(1.0) - col("n_blocked_pairs").cast("double")
          / (col("n_docs") * (col("n_docs") - 1) / 2).cast("double"), 6)
          .as("reduction_ratio"),
        round(col("n_truth_in_block").cast("double")
          / col("n_truth").cast("double"), 6).as("pair_completeness"))
  }
}
