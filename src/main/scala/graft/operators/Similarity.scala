package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact — broadcast the (small) query set against
  *    the corpus; one pass, no corpus shuffle, codegen'd cosine. This is
  *    the right plan whenever |queries| is broadcastable, at any corpus
  *    size: 100 TB of vectors stream through map tasks once.
  *  - [[lshTopK]]: bucketed — deterministic random-hyperplane LSH assigns
  *    each vector a bucket; only same-bucket candidates are scored. Trades
  *    recall for a corpus-side shuffle keyed on bucket. The scale path when
  *    queries are too many to broadcast.
  */
object Similarity {

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  /** Exact top-k cosine neighbors for each query vector (default: vec_id <
    * nQueries as the query set), excluding self. Ranking uses the rounded
    * similarity with vec_id tiebreak so results are engine-deterministic.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10): DataFrame = {
    val all = corpus(spark, sfDir)
    val q = all.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Vectors.cosine(col("qv"), col("v")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around a deterministic centroid sample (every `centroidStride`-th
    * vector), then answer queries by scanning only the `nProbe` cells whose
    * centroids are closest to the query.
    *
    * Plan shape at scale: centroids broadcast twice (cell assignment of the
    * corpus — one map pass; probe-list per query); the only corpus shuffle
    * is the equality join on cell id. A trained k-means codebook drops in
    * as a replacement for the stride sample without changing the plan.
    * Deterministic throughout (rounded-cosine + id tiebreaks), so the
    * DuckDB oracle replays it exactly.
    */
  def ivfTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10, nProbe: Int = 4,
      centroidStride: Int = 64): DataFrame = {
    val all = corpus(spark, sfDir)
    val cents = all.where(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

    // cell assignment: argmin distance == argmax cosine, tiebreak min cid
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("v"), col("cid"),
        round(Vectors.cosine(col("v"), col("cv")), 6).as("ccos"))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid").as("cell"))

    // per-query probe list: nProbe closest centroids
    val q = all.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cid"),
        round(Vectors.cosine(col("qv"), col("cv")), 6).as("qcos"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))

    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Vectors.cosine(col("qv"), col("v")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Multi-probe LSH ANN: hyperplane sign buckets on the corpus; each query
    * probes its own bucket plus every bucket at hamming distance 1 (one
    * flipped plane) — the standard multi-probe extension, which buys back
    * most of the recall lost to hard bucket boundaries for the cost of
    * (nPlanes+1)× more probe keys on the (small, broadcastable) query side.
    * The corpus is still touched once and shuffled only on the bucket key.
    */
  def lshTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10, dim: Int = 64, nPlanes: Int = 6): DataFrame = {
    val all = corpus(spark, sfDir)
      .withColumn("bucket", Vectors.hyperplaneBucket(col("v"), dim, nPlanes))
    val q = all.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      .select(col("query_id"), col("qv"),
        explode(array(col("bucket") +: (0 until nPlanes).map(j =>
          col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("probe"))
    val candidates = all.join(broadcast(q), col("bucket") === col("probe"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Vectors.cosine(col("qv"), col("v")), 4).as("cosine"))
      .distinct() // a neighbor can match several probes of the same query
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    candidates.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
