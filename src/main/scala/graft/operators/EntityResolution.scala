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
  def fellegiSunter(spark: SparkSession, sfDir: String,
      lenBucket: Int = 64, lenTol: Int = 16, hammingTol: Int = 8,
      jaccardT: (Int, Int) = (7, 10)): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        expr(s"n_chars div $lenBucket").as("blk"),
        array_distinct(Text.shingles(col("text"))).as("shl"))
      .join(Dedup.simhashDocs(spark, sfDir), "doc_id")
    def side(t: String) = docs.select(
      col("doc_id").as(s"id_$t"), col("lang"), col("blk"),
      col("source").as(s"src_$t"), col("n_chars").as(s"len_$t"),
      col("shl").as(s"shl_$t"), col("simhash").as(s"sh_$t"))
    val pairs = side("a").join(side("b"), Seq("lang", "blk"))
      .where(col("id_a") < col("id_b"))
    val inter = size(array_intersect(col("shl_a"), col("shl_b")))
    val uni = size(col("shl_a")) + size(col("shl_b")) - inter
    val (jNum, jDen) = jaccardT
    val feat = pairs.select(
      // exact-integer Jaccard threshold: inter/uni ≥ jNum/jDen
      (inter * jDen >= uni * jNum && uni > 0).cast("int").as("is_match"),
      (col("src_a") === col("src_b")).cast("int").as("f_same_source"),
      (abs(col("len_a") - col("len_b")) <= lenTol).cast("int").as("f_len_close"),
      (bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= hammingTol)
        .cast("int").as("f_simhash_near"))
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
}
