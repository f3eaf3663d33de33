package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Vectors
import graft.functions.Num.dec

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
    // embeddingsSpread: every consumer below is per-row vector math, and
    // the one-split gate table would run it single-task (StageMetrics r13)
    Tables.embeddingsSpread(spark, sfDir)
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

  /** Fixed-size IVF codebook: the `nCentroids` corpus vectors with the
    * smallest pinned md5(vec_id) prefix hash (vec_id tiebreak). |codebook|
    * is corpus-size-INDEPENDENT — a uniform deterministic sample of exactly
    * k vectors at any sf — so the centroid broadcast stays constant-sized
    * and cell assignment stays O(n·k) as the corpus grows. Plan:
    * TakeOrderedAndProject (per-partition k-heap, k·P-row driver merge),
    * not a full sort. A trained k-means table drops in as a replacement
    * without changing any downstream plan shape.
    */
  def ivfCentroids(spark: SparkSession, sfDir: String,
      nCentroids: Int = 16): DataFrame =
    corpus(spark, sfDir)
      .orderBy(graft.functions.Hashing.stableHash32(col("vec_id").cast("string")),
        col("vec_id"))
      .limit(nCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** Squared Euclidean distance between two equal-length double arrays. */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, e) => acc + e)

  /** Distributed Lloyd's k-means refinement of the IVF codebook: start from
    * the deterministic [[ivfCentroids]] sample and run `iters` rounds of
    * assign-to-nearest (argmin squared distance, cid tiebreak) + cell-mean
    * update. Returns the same (cid, cv) schema as [[ivfCentroids]], so it
    * drops into [[ivfTopK]] unchanged — the trained-codebook upgrade the
    * sampled one stands in for.
    *
    * Scale shape per round: the k-entry codebook broadcasts onto one corpus
    * map pass; assignment is a groupBy(vec_id) argmin (n-row shuffle, not
    * n·k); the mean update is posexplode → (cell, dim) partial-aggregated
    * averages → per-cell reassembly of a dim-bounded list. Cells that lose
    * every member keep their previous centroid. `localCheckpoint` truncates
    * the k-row codebook lineage each round. (Verified by spec, not a DuckDB
    * oracle: iterative float means are not portably hash-comparable; the
    * spec asserts fixed |codebook| and monotone non-increasing inertia —
    * Lloyd's invariant.)
    */
  def kmeansCodebook(spark: SparkSession, sfDir: String,
      k: Int = 16, iters: Int = 5): DataFrame = {
    val all = corpus(spark, sfDir)
    var cents = ivfCentroids(spark, sfDir, k).localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = all.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cid"),
          sqDist(col("v"), col("cv")).as("d2"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cell"),
          first(col("v")).as("v"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("mv"))
      cents = cents.alias("o")
        .join(means, col("o.cid") === means("cell"), "left")
        .select(col("o.cid").as("cid"),
          coalesce(means("mv"), col("o.cv")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** Cell assignment of the whole corpus under the TRAINED, pinned
    * codebook ([[TrainedCodebook]] — Lloyd's output rounded to 6 decimals
    * and frozen as literals). This is the oracle-gated face of
    * [[kmeansCodebook]]: training itself is iterative float math that no
    * two engines reproduce bit-for-bit (spec-verified via Lloyd's
    * invariants instead), but assignment under FIXED centroids is
    * deterministic — rounded cosine, cid tiebreak — so the DuckDB oracle
    * replays it exactly from the same constant.
    *
    * Scale shape: the k-row codebook is a broadcast local relation onto
    * one corpus map pass; the only corpus-sized shuffle is the
    * groupBy(vec_id) argmax (n rows with map-side partials, not n·k).
    *
    * [[SessionMemo.durable]] family: the assignment under the PINNED
    * codebook is fully deterministic and n-row-sized, and it fronts the
    * whole trained-cell blocking surface (q66 and the cell joins of
    * q114/q115/q117/the balanced sampler/quantizedAssignment) — before
    * r16 each consumer re-ran the corpus argmax per query (r15 verdict
    * item 2: q115's 7.8 s driver cold re-derived it plus the JL
    * projection uncached).
    */
  def ivfAssignTrained(spark: SparkSession, sfDir: String): DataFrame =
    SessionMemo.durable(spark, sfDir, s"ivfAssignTrained|$sfDir") {
      val s = spark
      import s.implicits._
      val cents = broadcast(TrainedCodebook.centroids.toDF("cid", "cv"))
      corpus(spark, sfDir).crossJoin(cents)
        .select(col("vec_id"), col("cid"),
          round(Vectors.cosine(col("v"), col("cv")), 6).as("ccos"))
        .groupBy(col("vec_id"))
        .agg(
          max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cell"),
          max(col("ccos")).as("cell_cosine"))
    }

  /** Corpus inertia of a codebook (sum of squared distance to the nearest
    * entry) — the diagnostic that tracks k-means convergence. Driver-side
    * scalar by design (it is a single monitoring number).
    */
  def codebookInertia(spark: SparkSession, sfDir: String,
      cents: DataFrame): Double =
    corpus(spark, sfDir).crossJoin(broadcast(cents))
      .select(col("vec_id"), sqDist(col("v"), col("cv")).as("d2"))
      .groupBy(col("vec_id")).agg(min(col("d2")).as("md"))
      .agg(sum(col("md"))).head().getDouble(0)

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around a fixed-size deterministic codebook ([[ivfCentroids]]), then
    * answer queries by scanning only the `nProbe` cells whose centroids are
    * closest to the query.
    *
    * Plan shape at scale: the k-entry codebook broadcasts twice (cell
    * assignment of the corpus — one map pass; probe-list per query); cell
    * assignment is a groupBy(vec_id) argmax with map-side partial
    * aggregation, so the only corpus-sized shuffle carries n rows (not the
    * n·k scored pairs a window-rank formulation would move). Deterministic
    * throughout (rounded-cosine + id tiebreaks), so the DuckDB oracle
    * replays it exactly.
    */
  def ivfTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10, nProbe: Int = 4,
      nCentroids: Int = 16): DataFrame = {
    val all = corpus(spark, sfDir)
    val cents = ivfCentroids(spark, sfDir, nCentroids)

    // cell assignment: argmin distance == argmax cosine, tiebreak min cid;
    // max_by over struct(cos, -cid) == "ORDER BY cos DESC, cid LIMIT 1"
    val assigned = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        round(Vectors.cosine(col("v"), col("cv")), 6).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cell"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("cell"))

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

  /** SemDeDup-style semantic near-duplicate pairs: embeddings are blocked
    * by their [[ivfAssignTrained]] codebook cell and only same-cell pairs
    * are scored — the embedding-space analogue of LSH band blocking, and
    * the way semantic dedup actually runs at corpus scale (cluster first,
    * compare within clusters; cross-cell pairs are the accepted recall
    * trade, exactly as in the SemDeDup recipe).
    *
    * Scale shape: one corpus pass for assignment (broadcast codebook), one
    * equality self-join on `cell` — pair space bounded by cell
    * co-occupancy, never |n|²; a balanced trained codebook keeps cells
    * ~n/k. Deterministic (rounded cosine, id tiebreaks), so the oracle
    * replays it from the same pinned centroids.
    *
    * IMPORTANT at scale: k is a corpus-scale parameter, NOT the fixture's
    * 8 — both the join's shuffle-key cardinality and the per-cell pair
    * count (n/k)² are set by it. Size k ≈ n / targetCellSize (SemDeDup
    * uses tens of thousands of clusters) by retraining [[kmeansCodebook]]
    * with a larger k; the plan shape here is k-independent. The pinned
    * 8-entry codebook exists only so the oracle can replay assignment.
    */
  def semanticNearDups(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame = {
    val av = corpus(spark, sfDir).select(col("vec_id"), col("v"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
    av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec1"), col("b.vec_id").as("vec2"),
        col("a.cell").as("cell"),
        round(Vectors.cosine(col("a.v"), col("b.v")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** JL-projection-ACCELERATED semantic near-dups — the payoff loop of
    * [[randomProjection]]: same trained-cell blocking as
    * [[semanticNearDups]], but every candidate pair is pre-scored with
    * the 8-dim projected cosine (~8× fewer multiply-adds than the full
    * 64-dim scoring) and only pairs clearing `preFilter` pay the exact
    * cosine, which alone decides. Both scores are emitted, so the gate
    * documents the projection's per-pair fidelity.
    *
    * The pre-filter is a recall HEURISTIC, not a proven bound — JL
    * distorts each pair by a data-dependent factor — so `preFilter`
    * defaults far below the decision threshold (0.0 vs 0.3): roughly half
    * the candidate space (negative-projected pairs) dies at 1/8 of the
    * scoring cost, while distortion would have to flip a true 0.3-cosine
    * pair all the way negative to cost recall. The gated CONTRACT is
    * "pairs ≥ threshold among those passing the pre-filter" — the same
    * candidate-stage discipline as the q25/q81 dedup gates.
    *
    * Scale shape: one extra corpus aggregate (the projection), the same
    * cell-blocked equality self-join, and the expensive fold runs on the
    * filtered survivor stream only.
    */
  def projectedNearDups(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3, preFilter: Double = 0.0,
      dOut: Int = 8): DataFrame = {
    val pv = randomProjection(spark, sfDir, dOut)
      .select(col("vec_id"),
        array((0 until dOut).map(j => col(s"p_$j")): _*).as("pv"))
    val av = corpus(spark, sfDir).select(col("vec_id"), col("v"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
      .join(pv, "vec_id")
    av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec1"), col("b.vec_id").as("vec2"),
        col("a.cell").as("cell"),
        round(Vectors.cosine(col("a.pv"), col("b.pv")), 4).as("proj_cosine"),
        col("a.v").as("av"), col("b.v").as("bv"))
      .where(col("proj_cosine") >= preFilter)
      .select(col("vec1"), col("vec2"), col("cell"), col("proj_cosine"),
        round(Vectors.cosine(col("av"), col("bv")), 4).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Contrastive TRIPLET mining over the trained-cell blocking — the
    * training-data generator for embedding-model fine-tuning: per anchor,
    * the most-similar in-cell neighbor at or above `posThr` (the
    * positive) and the HARDEST in-cell negative — the highest-cosine
    * neighbor still strictly below `negThr` (hard negatives are the ones
    * that teach; easy negatives are free but useless). Anchors lacking
    * either side are dropped. Ties break toward the smaller vec_id, so
    * the mined set is engine-deterministic.
    *
    * Scale shape: the pair space is cell-blocked (never n²) and scored
    * once; each argmax is a map-side-combinable `max_by` keyed on anchor
    * — no windows, no sorts.
    */
  def tripletMining(spark: SparkSession, sfDir: String,
      posThr: Double = 0.3, negThr: Double = 0.2): DataFrame = {
    val av = corpus(spark, sfDir).select(col("vec_id"), col("v"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
    val pairs = av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("cand"),
        round(Vectors.cosine(col("a.v"), col("b.v")), 4).as("cosine"))
    val pos = pairs.where(col("cosine") >= posThr)
      .groupBy(col("anchor"))
      .agg(max_by(col("cand"), struct(col("cosine"), -col("cand"))).as("positive"),
        max(col("cosine")).as("pos_cosine"))
    val neg = pairs.where(col("cosine") < negThr)
      .groupBy(col("anchor"))
      .agg(max_by(col("cand"), struct(col("cosine"), -col("cand"))).as("negative"),
        max(col("cosine")).as("neg_cosine"))
    pos.join(neg, "anchor")
      .select(col("anchor"), col("positive"), col("pos_cosine"),
        col("negative"), col("neg_cosine"))
  }

  /** SemDeDup cluster RESOLUTION: turn [[semanticNearDups]]' pair list into
    * per-vector keep/drop verdicts. Pairs are resolved into connected
    * components ([[Curation.connectedComponents]] — near-dup clusters are
    * short chains, singletons never enter the loop), each component gets a
    * deterministic fixed-point centroid, and the kept representative is the
    * member with the LOWEST cosine to its centroid (vec_id tiebreak) — the
    * SemDeDup recipe (Abbas et al. 2023) keeps the least-redundant example
    * of each semantic duplicate group. Output: one row per corpus vector
    * with its component, component size, centroid cosine, and keep flag.
    *
    * Scale shape: component resolution scales with near-dup count, not
    * corpus (edge-touched vertices only); the centroid is a map-side-
    * combinable (component, dim) aggregate reassembled into an in-row
    * array, so the cosine is ONE codegen'd in-row fold (no cross-row
    * double summation — see the determinism note on [[labelCentroids]]);
    * the keep rank windows over components, whose sizes are near-dup
    * cluster sizes (bounded small), never over the corpus.
    */
  def semanticResolution(spark: SparkSession, sfDir: String,
      threshold: Double = 0.3): DataFrame =
    SessionMemo.durable(spark, sfDir, s"semanticResolution|$sfDir|$threshold") {
      semanticResolutionBuild(spark, sfDir, threshold)
    }

  private def semanticResolutionBuild(spark: SparkSession, sfDir: String,
      threshold: Double): DataFrame = {
    val pairs = semanticNearDups(spark, sfDir, threshold)
      .select(col("vec1").as("doc1"), col("vec2").as("doc2"))
    val vecs = corpus(spark, sfDir).select(col("vec_id"), col("v"))
    val comp = Curation
      .connectedComponents(pairs, vecs.select(col("vec_id").as("doc_id")))
      .select(col("doc_id").as("vec_id"), col("component"))
    val members = vecs.join(comp, "vec_id")
    // fixed-point per-dim means (exact, commutative), reassembled into an
    // array<double> ordered by dim so the cosine folds in-row. The mean is
    // NOT re-rounded: long-sum / exact-integer is ONE correctly-rounded
    // IEEE division, bit-identical across engines, whereas rounding it at
    // 6 dp lands 2-member components (odd sum / 2e6 = exact …5 tie) on a
    // boundary where Spark's HALF_UP and DuckDB's round diverge.
    val cent = members
      .select(col("component"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("component"), col("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("x") * 1e6).cast("long")).cast("double")
          / (count(lit(1)) * lit(1e6))).as("c"))
      .groupBy(col("component"))
      .agg(max(col("n")).as("n_members"),
        transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          s => s.getField("c")).as("cv"))
    val scored = members.join(cent, "component")
      .select(col("vec_id"), col("component"), col("n_members"),
        round(Vectors.cosine(col("v"), col("cv")), 4).as("centroid_cosine"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("centroid_cosine"), col("vec_id"))
    scored
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
      .select(col("vec_id"), col("component"), col("n_members"),
        col("centroid_cosine"), col("keep"))
  }

  /** Recall@5 of the two ANN indexes ([[lshTopK]], [[ivfTopK]]) against the
    * exact ranking ([[bruteForceTopK]]) — per (method, query) hit counts
    * and recall. This turns the "how good is the approximate index?"
    * question from a doc note into a hash-gated query: every pipeline is
    * deterministic, so the oracle replays all three and the recall numbers
    * must match exactly.
    *
    * Scale shape: each ANN pipeline keeps its own documented plan; the
    * recall join is top-k-sized (|queries|·k rows/side), i.e. free.
    */
  def annRecallAt5(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val exact = bruteForceTopK(spark, sfDir, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx =
      lshTopK(spark, sfDir, k)
        .select(lit("lsh").as("method"), col("query_id"), col("neighbor_id"))
      .unionByName(ivfTopK(spark, sfDir, k)
        .select(lit("ivf").as("method"), col("query_id"), col("neighbor_id")))
    approx.alias("a")
      .join(broadcast(exact).alias("e"),
        col("a.query_id") === col("e.query_id") &&
          col("a.neighbor_id") === col("e.neighbor_id"), "left")
      .groupBy(col("method"), col("a.query_id").as("query_id"))
      .agg(
        count(lit(1)).as("n_returned"),
        sum(when(col("e.neighbor_id").isNotNull, 1).otherwise(0)).as("n_hits"),
        round(sum(when(col("e.neighbor_id").isNotNull, 1).otherwise(0))
          .cast("double") / k, 4).as("recall_at_5"))
  }

  /** Rank-aware retrieval quality: nDCG@5 of each ANN method (LSH, IVF)
    * against the exact brute-force top-5 — the metric that punishes an
    * index for burying a true neighbor at rank 5 where recall@5 (q67)
    * would call it a hit. Binary relevance (returned neighbor ∈ exact
    * top-5); discounts 1/log₂(i+1) are PINNED ×10¹² integer literals
    * (identical in the oracle), so the DCG is an exact integer sum and
    * the only float op is the final division by the constant ideal DCG.
    *
    * Scale shape: both ANN paths and the exact pass are the established
    * q29/q30/q37 plans; the join to the exact set is broadcast-sized
    * (nQueries·k rows) and the rollup is per (method, query).
    */
  def ndcgAt5(spark: SparkSession, sfDir: String): DataFrame = {
    // round(1e12 / log2(i+1)) for i = 1..5; sum = ideal DCG for 5 hits
    val disc = Seq(1000000000000L, 630929753571L, 500000000000L,
      430676558073L, 386852807235L)
    val idcg = disc.sum
    val discArr = array(disc.map(lit): _*)
    val exact = bruteForceTopK(spark, sfDir, 5)
      .select(col("query_id"), col("neighbor_id"))
    val approx =
      lshTopK(spark, sfDir, 5)
        .select(lit("lsh").as("method"), col("query_id"),
          col("neighbor_id"), col("rank"))
      .unionByName(ivfTopK(spark, sfDir, 5)
        .select(lit("ivf").as("method"), col("query_id"),
          col("neighbor_id"), col("rank")))
    approx.alias("a")
      .join(broadcast(exact).alias("e"),
        col("a.query_id") === col("e.query_id") &&
          col("a.neighbor_id") === col("e.neighbor_id"), "left")
      .groupBy(col("method"), col("a.query_id").as("query_id"))
      .agg(sum(when(col("e.neighbor_id").isNotNull,
        element_at(discArr, col("rank"))).otherwise(0L)).as("dcg_fp"))
      .withColumn("ndcg", round(col("dcg_fp").cast("double") / idcg, 6))
  }

  /** Mutual nearest neighbors over the trained-cell candidate graph: pairs
    * (a, b) where b is a's best cell-mate by cosine AND a is b's — the
    * reciprocal-top-1 criterion bitext mining and cross-corpus alignment
    * use to promote "similar" to "the same item seen twice" (one-sided
    * top-1 is noisy near hubs; mutuality kills hub matches). Candidates
    * come from the q66 trained IVF cells, so the pair space is blocked
    * exactly like q68's semantic near-dups — no threshold, the argmax
    * decides (ties → smaller vec_id).
    *
    * Scale shape: one equality self-join on the trained cell key, a
    * per-vector top-1 (WindowGroupLimit), then the mutuality check is a
    * self-join of the TINY best-edge table (≤ one row per vector) on the
    * reversed key.
    */
  def mutualNearestNeighbors(spark: SparkSession, sfDir: String): DataFrame = {
    val av = corpus(spark, sfDir).select(col("vec_id"), col("v"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
    val pairs = av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec1"), col("b.vec_id").as("vec2"),
        round(Vectors.cosine(col("a.v"), col("b.v")), 4).as("cosine"))
    val directed = pairs
      .select(col("vec1").as("src"), col("vec2").as("dst"), col("cosine"))
      .unionByName(pairs
        .select(col("vec2").as("src"), col("vec1").as("dst"), col("cosine")))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    val best = directed.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("src"), col("dst"), col("cosine"))
    best.as("x").join(best.as("y"),
        col("x.dst") === col("y.src") && col("x.src") === col("y.dst") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("vec1"), col("x.dst").as("vec2"),
        col("x.cosine").as("cosine"))
  }

  /** Class-balance resampling plan over the embedding labels: per label,
    * the integer oversampling factor ⌈max_count/count⌉ that levels the
    * class distribution, with before/after shares — the deterministic
    * upsampling TABLE a training-data pipeline materializes before any
    * balanced epoch (actual row replication is then a hash-free
    * `explode(sequence(1, factor))`). Exact integer arithmetic via
    * ceiling division (max + cnt − 1) DIV cnt.
    *
    * Scale shape: one label-keyed count (map-side combinable), a one-row
    * max broadcast, label-sized output.
    */
  def classBalancePlan(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.embeddings(spark, sfDir)
      .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(max(col("cnt")).as("max_cnt"),
      sum(col("cnt")).as("n_total"))
    val plan = counts.crossJoin(broadcast(tot))
      .select(col("label"), col("cnt"), col("n_total"),
        expr("(max_cnt + cnt - 1) DIV cnt").as("factor"))
      .withColumn("upsampled", col("factor") * col("cnt"))
    plan
      .crossJoin(broadcast(plan.agg(sum(col("upsampled")).as("n_after"))))
      .select(col("label"), col("cnt"), col("factor"), col("upsampled"),
        round(col("cnt").cast("double") / col("n_total"), 6)
          .as("share_before"),
        round(col("upsampled").cast("double") / col("n_after"), 6)
          .as("share_after"))
  }

  /** Label-centroid geometry: pairwise cosine between the
    * [[labelCentroids]] vectors — the class-separability audit a labeled
    * embedding corpus gets before anyone trusts the labels as blocking
    * keys (q28) or contrastive negatives (q117): centroid cosine → 1
    * means two labels are geometrically indistinguishable and
    * label-blocked dedup will miss their cross-label near-dups.
    *
    * Determinism: centroid components are the q60 6-dp grid; per-dim
    * products round once onto a ×10¹² fixed-point grid and sum as longs
    * (order-free); the cosine normalizes fixed-point sums — the scales
    * cancel — with one IEEE division + round. Scale shape: the centroid
    * table is |labels|·dim rows (metadata-sized at any corpus scale);
    * the dim-keyed self-join and label-pair rollup never touch the
    * corpus.
    */
  def centroidGeometry(spark: SparkSession, sfDir: String): DataFrame =
    centroidGeometryOf(labelCentroids(spark, sfDir))

  /** [[centroidGeometry]] over an arbitrary (label, dim, mean_v) centroid
    * frame — the fixture-testable core.
    */
  def centroidGeometryOf(centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("label"), col("dim"), col("mean_v"))
    def fp(x: org.apache.spark.sql.Column) = round(x * lit(1e12)).cast("long")
    c.as("a").join(c.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label1"), col("b.label").as("label2"))
      .agg(sum(fp(col("a.mean_v") * col("b.mean_v"))).as("sxy"),
        sum(fp(col("a.mean_v") * col("a.mean_v"))).as("sxx"),
        sum(fp(col("b.mean_v") * col("b.mean_v"))).as("syy"))
      .select(col("label1"), col("label2"),
        round(col("sxy").cast("double")
          / (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))),
          6).as("centroid_cosine"))
  }

  /** Symmetric int8 quantization of the embedding column — the standard
    * 4× memory reduction applied before ANN serving at corpus scale.
    * Per-vector max-abs scaling: q_i = round(x_i / scale · 127), with the
    * max reconstruction error reported per vector (≤ scale/254 by
    * construction, modulo the final rounding). Pure map-side projection —
    * no shuffle at any corpus size — and every step (division,
    * multiplication, half-away-from-zero rounding) is IEEE-deterministic,
    * so the DuckDB oracle reproduces the quantized codes bit-for-bit.
    */
  def quantizeEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val v = col("v")
    val rawScale = array_max(transform(v, x => abs(x)))
    val scale = when(rawScale === 0.0, 1.0).otherwise(rawScale) // all-zero guard
    corpus(spark, sfDir)
      .withColumn("scale", scale)
      .select(col("vec_id"),
        round(col("scale"), 6).as("q_scale"),
        // serialized (comma-joined) rather than array<int>: the verification
        // harness compares scalar columns only, and the string is the same
        // bit-exact information
        array_join(transform(v,
          x => round(x / col("scale") * 127).cast("int").cast("string")), ",").as("q_codes"),
        round(array_max(zip_with(v,
          transform(v, x => round(x / col("scale") * 127)),
          (x, q) => abs(x - q * col("scale") / 127.0))), 6).as("max_abs_err"))
  }

  /** Per-label embedding centroids (mean pooling): the class-prototype /
    * codebook-seeding aggregation. One row per (label, dimension) keeps the
    * output scalar-columned for engine-portable verification; reassembling
    * the centroid vector is a `collect_list` over dim order downstream.
    *
    * Scale shape: posexplode multiplies rows by the (fixed, small)
    * dimensionality, then one shuffle on (label, dim) with map-side partial
    * sums — the classic commutative-aggregate plan; no vector ever needs to
    * fit anywhere special.
    *
    * The mean sums FIXED-POINT longs (each element scaled ×10⁶ and rounded
    * once), not raw doubles: double summation is accumulation-order-
    * dependent, and Spark's partial-aggregate order differs from the
    * oracle's scan order, so a raw sum landing within an ulp of a rounding
    * boundary could flip the 6-dp output nondeterministically. Long
    * addition is exact and commutative, and the single final division is
    * one deterministic double op — order-independent by construction (no
    * overflow risk: unit-norm components ×10⁶ sum well below 2⁶³ for any
    * realistic group).
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.SessionMemo.durable(spark, sfDir, s"labelCentroids|$sfDir") {
      Tables.embeddingsSpread(spark, sfDir)
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vectors"),
          round(sum(round(col("v") * 1e6).cast("long")).cast("double")
            / (count(lit(1)) * lit(1e6)), 6).as("mean_v"))
    }

  /** Johnson–Lindenstrauss random projection to `dOut` dimensions with a
    * SEEDLESS sign matrix: s_ij = ±1 derived from the pinned md5-prefix
    * hash of (i, j), so no projection matrix is stored, shipped, or
    * random-seeded — any engine recomputes the identical matrix cell-by-
    * cell (Achlioptas, "Database-friendly random projections", PODS'01:
    * ±1 entries satisfy the JL lemma; p_j = Σᵢ vᵢ·s_ij / √dOut).
    * The dimensionality-reduction front end for ANN/clustering at scale:
    * 96 → 8 dims cuts every downstream distance computation ~12×.
    *
    * Scale shape: posexplode → dOut conditional sums — one map-side-
    * combinable aggregate, one shuffle on vec_id, nothing else; the sign
    * hash is computed in-row (md5 here for cross-engine verification;
    * swap `Hashing.stableHash32` for `xxhash64` in a non-oracle path to
    * drop the digest cost). Determinism: components sum as ×10⁶
    * fixed-point longs (exact, commutative — see [[labelCentroids]]), one
    * double division + round at the end.
    *
    * [[SessionMemo.durable]] family (keyed by dOut): the projection is
    * deterministic, n×(dOut+1)-sized, and consumed by both its own gate
    * (q79) and the JL-accelerated near-dup loop (q115) — r15 verdict
    * item 2: re-deriving the n·d_in·d_out md5 sign products per consumer
    * was most of q115's uncached cold.
    */
  def randomProjection(spark: SparkSession, sfDir: String,
      dOut: Int = 8): DataFrame =
    SessionMemo.durable(spark, sfDir, s"randomProjection|$sfDir|$dOut") {
      import graft.functions.Hashing
      // embeddingsSpread: the d_in x d_out hash projection is compute-bound
      val comp = Tables.embeddingsSpread(spark, sfDir)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i", "v")))
        .select(col("vec_id"), col("i"),
          round(col("v") * 1e6).cast("long").as("fx"))
      def sign(j: Int) = when(
        pmod(Hashing.stableHash32(concat(col("i").cast("string"),
          lit(":"), lit(j.toString))), lit(2L)) === 0, lit(1L))
        .otherwise(lit(-1L))
      val aggs = (0 until dOut).map(j => sum(col("fx") * sign(j)).as(s"fxs_$j"))
      val scale = lit(1e6) * sqrt(lit(dOut.toDouble))
      comp.groupBy(col("vec_id"))
        .agg(aggs.head, aggs.tail: _*)
        .select(col("vec_id") +: (0 until dOut).map(j =>
          round(col(s"fxs_$j").cast("double") / scale, 6).as(s"p_$j")): _*)
    }

  /** Product-quantization geometry: `PqSubspaces` sub-blocks of
    * `PqSubDim` dims each (64-dim embeddings → 8×8), `PqK`-entry codebook
    * per subspace. The per-subspace codebooks are the [[ivfCentroids]]
    * deterministic sample sliced per block, so the oracle regenerates them
    * from the data with no pinned constants.
    */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqK = 16

  /** Squared L2 distance over two pre-sliced `PqSubDim`-element arrays,
    * UNROLLED into scalar arithmetic: (a₁−b₁)² + … left-associated — the
    * identical IEEE sum the fold/`list_dot_product` forms produce (the
    * fold's 0.0 seed is exact), but fully inside whole-stage codegen.
    * The `aggregate(zip_with(...))` composition is a CodegenFallback
    * evaluated interpretively per row — measured 29 s vs ~3 s for the
    * 200k×8×16 stress assignment.
    */
  private def unrolledSqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to PqSubDim).map { i =>
      val d = element_at(a, i) - element_at(b, i)
      d * d
    }.reduce(_ + _)

  /** The corpus (or codebook) exploded to one row per (id, subspace) with
    * its sub-vector sliced ONCE — downstream distance rows then carry
    * 8-dim arrays instead of re-slicing the full vector per centroid.
    */
  private def subSliced(df: DataFrame, id: String): DataFrame =
    df.select(col(id), col("v"),
        explode(sequence(lit(0), lit(PqSubspaces - 1))).as("sub"))
      .select(col(id), col("sub"),
        slice(col("v"), col("sub") * PqSubDim + 1, lit(PqSubDim)).as("sv"))

  /** Per-(vector, subspace) PQ code assignment: argmin rounded sub-block
    * distance to the 16 sampled sub-centroids, cid tiebreak. Memoized —
    * [[pqEncode]] (the q92 gate) and [[pqTopK]] (the q93 ADC query) share
    * one corpus pass per session.
    *
    * Scale shape: the codebook is one broadcast of PqK·PqSubspaces
    * sub-vectors; the corpus explodes to n·m sub-vector rows in the same
    * stage and meets the codebook in a broadcast join on `sub`; the only
    * shuffle is the groupBy(vec_id, sub) argmin — n·m rows with map-side
    * partials, never the n·m·k scored pairs.
    */
  private[graft] def pqAssign(spark: SparkSession, sfDir: String): DataFrame =
    SessionMemo.durable(spark, sfDir, s"pqAssign|$sfDir") {
      val cents = broadcast(
        subSliced(ivfCentroids(spark, sfDir, PqK)
          .select(col("cid"), col("cv").as("v")), "cid")
          .select(col("cid"), col("sub"), col("sv").as("csv")))
      subSliced(corpus(spark, sfDir), "vec_id")
        .join(cents, "sub")
        .select(col("vec_id"), col("sub"), col("cid"),
          round(unrolledSqDist(col("sv"), col("csv")), 6).as("d2"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("code"),
          min(col("d2")).as("md2"))
    }

  /** Product quantization (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI'11): each vector compresses to one code per
    * subspace — 8 codes ≈ 8 bytes instead of 64 floats, the 32× memory
    * step that makes billion-vector ANN serving fit in RAM. Output: the
    * code word (comma-joined, q53-style scalar serialization) plus the
    * total quantization error (fixed-point sum of the per-subspace rounded
    * residuals — order-independent).
    */
  def pqEncode(spark: SparkSession, sfDir: String): DataFrame =
    pqAssign(spark, sfDir)
      .groupBy(col("vec_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("sub"), col("code")))),
          e => e.getField("code").cast("string")), ",").as("pq_codes"),
        round(sum(round(col("md2") * 1e6).cast("long")).cast("double") / 1e6, 6)
          .as("pq_error"))

  /** PQ asymmetric-distance (ADC) top-k: queries stay exact, the corpus is
    * its PQ codes; distance ≈ Σ_sub lut(query, sub, code) where the lookup
    * table holds the rounded sub-block distance from the query to every
    * sub-centroid. THE serving plan at 10⁹+ vectors: the corpus never
    * rematerializes floats — it streams 8-byte codes against a broadcast
    * LUT of |queries|·m·k entries.
    *
    * Scale shape: LUT = queries × codebook × subspaces (all broadcast-
    * sized); one equality join of the code stream against it on (sub,
    * code); per-(query, vec) rollup sums already-rounded entries as
    * fixed-point longs; rank via per-query WindowGroupLimit. Deterministic
    * throughout, so the oracle replays it exactly.
    */
  def pqTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10): DataFrame = {
    val scored = pqAssign(spark, sfDir)
      .join(broadcast(pqLut(spark, sfDir, nQueries)), Seq("sub", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(sum(round(col("d") * 1e6).cast("long")).cast("double") / 1e6, 6)
        .as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The ADC lookup table shared by [[pqTopK]] and [[ivfPqTopK]]:
    * (query_id, sub, code, d) — the rounded sub-block distance from each
    * query's sub-vector to every sub-centroid. |queries|·m·k rows,
    * broadcast-sized by construction.
    */
  private def pqLut(spark: SparkSession, sfDir: String,
      nQueries: Int): DataFrame = {
    val q = subSliced(corpus(spark, sfDir).where(col("vec_id") < nQueries),
      "vec_id").select(col("vec_id").as("query_id"), col("sub"),
      col("sv").as("qsv"))
    q.join(
        subSliced(ivfCentroids(spark, sfDir, PqK)
          .select(col("cid"), col("cv").as("v")), "cid")
          .select(col("cid"), col("sub"), col("sv").as("csv")), "sub")
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        round(unrolledSqDist(col("qsv"), col("csv")), 6).as("d"))
  }

  /** IVF-PQ — the two approximations COMPOSED, which is the production
    * billion-vector serving architecture (FAISS's IVFPQ default): the
    * inverted file prunes WHICH vectors are scored (only the `nProbe`
    * probed cells' members), and product quantization prunes HOW each
    * survivor is scored (8-byte codes against the broadcast ADC LUT
    * instead of 64 floats). Neither the corpus floats nor the unprobed
    * cells are ever touched at query time.
    *
    * Scale shape: cell assignment and the PQ code stream are the
    * existing one-map-pass plans (both reuse the memoized [[pqAssign]] /
    * codebook); the probe list and LUT are query-set-sized broadcasts;
    * the only shuffled stream is the candidate rollup, bounded by
    * nProbe/k of the corpus per query. Deterministic end to end, so the
    * oracle replays it exactly.
    */
  def ivfPqTopK(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10, nProbe: Int = 4): DataFrame = {
    val all = corpus(spark, sfDir)
    val cents = ivfCentroids(spark, sfDir, PqK)
    val assigned = all.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        round(Vectors.cosine(col("v"), col("cv")), 6).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cell"))
    val q = all.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("cid"),
        round(Vectors.cosine(col("qv"), col("cv")), 6).as("qcos"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("cid").as("cell"))
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val scored = pqAssign(spark, sfDir)
      .join(cand, Seq("vec_id"))
      .join(broadcast(pqLut(spark, sfDir, nQueries)),
        Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(round(sum(round(col("d") * 1e6).cast("long")).cast("double") / 1e6, 6)
        .as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Recall@5 of the PQ ADC ranking ([[pqTopK]]) against the EXACT
    * squared-L2 top-k — the distance ADC approximates, so this is the
    * number a PQ user actually cares about (the q67 recall-gate recipe
    * applied to the compressed index). Deterministic end to end: both
    * rankings round at 6 dp with vec_id tiebreaks, so the oracle replays
    * the recall exactly.
    *
    * Scale shape: the exact side is the [[bruteForceTopK]] plan (query set
    * broadcast, corpus streamed once, per-query WindowGroupLimit); the
    * recall join is top-k-sized — free.
    */
  def pqRecallAt5(spark: SparkSession, sfDir: String,
      k: Int = 5, nQueries: Int = 10): DataFrame = {
    val all = corpus(spark, sfDir)
    val q = all.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(sqDist(col("qv"), col("v")), 6).as("d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    val exact = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    pqTopK(spark, sfDir, k, nQueries).alias("a")
      .join(broadcast(exact).alias("e"),
        col("a.query_id") === col("e.query_id") &&
          col("a.neighbor_id") === col("e.neighbor_id"), "left")
      .groupBy(col("a.query_id").as("query_id"))
      .agg(
        count(lit(1)).as("n_returned"),
        sum(when(col("e.neighbor_id").isNotNull, 1).otherwise(0)).as("n_hits"),
        round(sum(when(col("e.neighbor_id").isNotNull, 1).otherwise(0))
          .cast("double") / k, 4).as("recall_at_5"))
  }

  /** Cluster-balanced sampling: cap each [[ivfAssignTrained]] semantic
    * cell at `cap` members, chosen by pinned hash (vec_id tiebreak) — the
    * diversity-preserving down-sampling step of embedding-aware curation
    * (DoReMi/SemDeDup-adjacent: sample BY semantic cluster, so one dense
    * region cannot dominate the training mix the way it would under a
    * uniform draw). The q51 stratified-sample recipe with strata = learned
    * cells instead of metadata columns.
    *
    * Scale shape: assignment is one broadcast-codebook map pass; the
    * rank-≤-cap filter compiles to `WindowGroupLimit` with the partial
    * limit below the exchange — each map partition forwards at most `cap`
    * rows per cell, so a mega-cell cannot hot-spot its reducer.
    */
  def clusterBalancedSample(spark: SparkSession, sfDir: String,
      cap: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("cell"))
      .orderBy(graft.functions.Hashing.stableHash32(
        concat(lit("cbs:"), col("vec_id").cast("string"))), col("vec_id"))
    ivfAssignTrained(spark, sfDir)
      .select(col("vec_id"), col("cell"))
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= cap)
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

  /** Embedding-integrity audit, per label: vector count, dimension range,
    * degenerate (≈zero-norm) count, and the rounded L2-norm envelope
    * (min/mean/max). Zero or collapsed embeddings silently poison every
    * downstream cosine (they score 0 against everything and cluster
    * together under any index) — this is the data-quality gate an
    * embedding pipeline runs before building ANN structures from a new
    * encoder drop.
    *
    * Determinism: each per-row norm is rounded once at 6 dp (the engines'
    * IEEE dot-product folds match element order), then the mean is a ×10⁶
    * fixed-point long sum. Scale shape: one map-side pass, one partial
    * aggregate on the (vocabulary-sized) label key — no shuffle of vector
    * payloads, no join.
    */
  def embeddingAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.embeddingsSpread(spark, sfDir)
      .select(col("label"),
        round(Vectors.l2Norm(col("embedding")), 6).as("norm"),
        size(col("embedding")).as("dim"))
    n.groupBy(col("label")).agg(
      count(lit(1)).as("n_vecs"),
      sum(when(col("norm") < 0.000001, 1L).otherwise(0L)).as("n_degenerate"),
      min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
      min(col("norm")).as("min_norm"), max(col("norm")).as("max_norm"),
      round(sum(round(col("norm") * 1e6).cast("long")).cast("double")
        / 1e6 / count(lit(1)), 6).as("mean_norm"))
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    * Buettcher, SIGIR 2009): fuse a lexical BM25 ranking
    * ([[graft.analytics.TextAnalytics.bm25Rank]], pinned query terms) with
    * a semantic cosine ranking (corpus vs the pinned query vector, vec_id
    * = `queryVec`; embeddings row i embeds document i). RRF(d) =
    * Σ_rankers 1/(c + rank_r(d)) — RANK-based, so the two rankers'
    * incomparable score scales never matter; c = 60 per the paper. The
    * standard fusion behind every "hybrid search" mode in production
    * vector stores.
    *
    * Determinism: ranks are integers; each 1/(c+rank) contribution is a
    * ×10⁶ fixed-point long (half-up, identical in both engines) and the
    * fused score one rounded sum — no cross-engine float drift possible.
    * Absent ranks contribute 0 and surface as the −1 sentinel.
    *
    * Scale shape: each ranker ends in a TakeOrderedAndProject top-k (the
    * corpus is never globally sorted); the fusion is a full outer join of
    * two ≤k-row frames — driver-trivial at any corpus size. Ranks are
    * assigned by a window over the already-limited k rows, so the
    * single-partition window is bounded by k, not the corpus.
    */
  /** Embedding isotropy: the EXACT mean pairwise cosine between all unit
    * vectors, WITHOUT scoring a single pair — via the sum-vector
    * identity Σᵢ≠ⱼ cos(vᵢ,vⱼ) = ‖Σᵢûᵢ‖² − Σᵢ‖ûᵢ‖², so the n² pair space
    * collapses into one componentwise sum. A mean near 0 is an isotropic
    * (healthy) embedding space; a large positive mean is the anisotropy
    * / hubness pathology (Ethayarajh, EMNLP 2019) that q168's histogram
    * diagnoses per-vector — this is the corpus-level single number.
    *
    * Determinism: each unit component is rounded once to ×10⁹
    * fixed-point (the identity is then evaluated over EXACTLY the same
    * integers in both engines); component sums, their squares and the
    * per-component square sum accumulate as decimal(38,0) (HUGEINT in
    * the oracle — a component sum over 10⁹ vectors squares past a
    * long); the one division happens on the final one-row frame.
    *
    * Scale shape: one posexplode pass collapsed by a map-side-combinable
    * per-component aggregate (64 output rows), one scalar aggregate for
    * the square mass, one count — no joins except one-row broadcasts.
    */
  def isotropy(spark: SparkSession, sfDir: String): DataFrame = {
    val norm2 = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (a, e) => a + e)
    // ONE pass over the exploded stream: per component j, the coordinate
    // sum (for Q = Σ sj²), the square sum (T = Σ_j Σ_i rij² — same total,
    // grouped by j first: Decimal sums are exact so regrouping cannot
    // move the hash), and the row count (= n_vecs for every j, since a
    // unit vector emits all 64 positions). The previous form aggregated
    // the same exploded stream twice and re-normalized for the count.
    //
    // Normalization happens AFTER the explode, via the `nrm` ATTRIBUTE
    // computed once per vector in the Generate's child projection: the
    // earlier `transform(v, x -> x/nrm…)` form let CollapseProject inline
    // the whole norm FOLD into the per-element lambda — d re-evaluations
    // of a d-element fold per row, 18 s of interpreted-HOF CPU at sf0.1
    // (StageMetrics r13; now ~0.6 s). The degenerate-vector guard is
    // `exists(x² > 0) ∧ ¬exists(isnan(x))` (r13 advice 3: the earlier
    // `exists(x ≠ 0)` kept NaN vectors — NaN ≠ 0 — and all-subnormal
    // vectors whose squares underflow to 0, feeding NaN/∞-derived longs
    // into the exact decimal sums). For NaN-free vectors the first arm
    // is EXACTLY the oracle's `nrm > 0`: Σx² > 0 ⇔ some x² > 0
    // (positive FP addition never rounds a positive operand back to 0,
    // and squares cannot cancel; per-element underflow drops exactly
    // the terms that contribute 0 to the sum). NaN vectors are DROPPED
    // outright — the only total semantic: both engines order NaN above
    // 0, so a literal `nrm > 0` would KEEP the row and the oracle then
    // DIES on `CAST(NaN AS BIGINT)` (no defined oracle value exists to
    // match; the gate corpus is NaN-free either way). Both arms are
    // short-circuiting array scans, so unlike a post-projection
    // `nrm > 0` re-filter — which PushDownPredicates would substitute
    // back into a per-row fold below the spread exchange — the guard
    // stays cheap when pushdown drags it into the serial scan stage.
    val ex = corpus(spark, sfDir)
      .where(exists(col("v"), x => x * x > 0.0) &&
        !exists(col("v"), x => isnan(x)))
      .select(col("vec_id"), sqrt(norm2).as("nrm"),
        posexplode(col("v")).as(Seq("j", "x")))
      .select(col("j"),
        round(col("x") / col("nrm") * lit(1e9)).cast("long").as("rij"))
    val per = ex.groupBy(col("j"))
      .agg(sum(dec(col("rij"))).as("sj"),
        sum(dec(col("rij")) * dec(col("rij"))).as("tj"),
        count(lit(1)).as("cj"))
    val qt = per.agg(sum(col("sj") * col("sj")).as("q"),
      sum(col("tj")).as("t"), max(col("cj")).as("n_vecs"))
    qt.select(col("n_vecs"),
      round((col("q") - col("t")).cast("double")
        / (col("n_vecs") * (col("n_vecs") - lit(1L))).cast("double")
        / lit(1e18), 6).as("mean_pairwise_cos"))
  }

  /** Embedding NORM-band histogram per label: vectors bucketed by
    * ⌊‖v‖ / 0.25⌋ — the norm-distribution audit run before cosine-only
    * pipelines assume away magnitude (a label whose norms cluster
    * differently is a scaling artifact of its encoder batch, and dot-
    * product retrieval would rank it systematically differently than
    * cosine).
    *
    * Determinism: the squared norm is an in-row left fold in array order
    * (identical on both engines — the q29 precedent); sqrt is correctly
    * rounded; banding a continuous value has measure-zero edge risk.
    *
    * Scale shape: one map-side pass into a (label × ≤ ~40 band) rollup.
    */
  def normBands(spark: SparkSession, sfDir: String): DataFrame = {
    val n2 = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (a, e) => a + e)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
    corpus(spark, sfDir)
      .select(col("label"), floor(sqrt(n2) / 0.25).cast("int").as("norm_band"))
      .groupBy(col("label"), col("norm_band"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("n_label", sum(col("n_vecs")).over(tot))
      .select(col("label"), col("norm_band"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n_label"), 6)
          .as("share_of_label"))
  }

  /** IVF cell label purity: per trained cell, the majority class, its
    * share, and the label entropy — the clustering-quality audit read
    * against the codebook (a low-purity cell means the index routes
    * mixed neighborhoods, degrading q37/q125 recall at a given nprobe;
    * q158 measures the centroids' geometry, this measures what actually
    * landed in them).
    *
    * Determinism: the q146 entropy recipe — per-label terms rounded once
    * at 6 dp then ×10⁶ fixed-point summed; the majority argmax breaks
    * ties toward the smaller label.
    *
    * Scale shape: the assignment join is the memoized trained-cell
    * stage; then one (cell, label) aggregate (≤ cells × labels rows —
    * metadata-sized) and bounded rollups with a broadcast total.
    */
  def cellPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val av = corpus(spark, sfDir).select(col("vec_id"), col("label"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
    val cl = av.groupBy(col("cell"), col("label")).agg(count(lit(1)).as("n"))
    val tot = cl.groupBy(col("cell")).agg(sum(col("n")).as("n_vecs"))
    val p = col("n").cast("double") / col("n_vecs")
    cl.join(broadcast(tot), "cell")
      .select(col("cell"), col("label"), col("n"), col("n_vecs"),
        round(-p * log(p), 6).as("term"))
      .groupBy(col("cell"))
      .agg(min(col("n_vecs")).as("n_vecs"),
        max_by(col("label"), struct(col("n"), -col("label")))
          .as("majority_label"),
        max(col("n")).as("n_majority"),
        round(sum(round(col("term") * 1e6).cast("long")).cast("double") / 1e6, 6)
          .as("label_entropy"))
      .select(col("cell"), col("n_vecs"), col("majority_label"),
        round(col("n_majority").cast("double") / col("n_vecs"), 6)
          .as("majority_share"),
        col("label_entropy"))
  }

  /** Per-dimension embedding moments: mean and variance of every
    * coordinate across the corpus — the dead-dimension audit (a
    * near-zero-variance coordinate carries no information but still
    * costs memory, distance flops, and quantization budget in every
    * q29/q92 plan downstream; a large-mean one signals an uncentered
    * space, the common cause of q171's anisotropy).
    *
    * Determinism: coordinates are fixed-pointed once at ×10⁹; Σr and
    * Σr² accumulate as decimal(38,0) (HUGEINT in the oracle — the
    * square sum passes a long at ~10⁴ vectors already); mean and the
    * exact-numerator variance divide once per output row, rounded at
    * 6 dp.
    *
    * Scale shape: one posexplode pass collapsed by a
    * map-side-combinable per-dimension aggregate — dim rows out,
    * nothing else.
    */
  def dimVariance(spark: SparkSession, sfDir: String): DataFrame = {
    corpus(spark, sfDir)
      .select(posexplode(transform(col("v"),
        x => round(x * lit(1e9)).cast("long"))).as(Seq("dim", "r")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(dec(col("r"))).as("s1"),
        sum(dec(col("r")) * dec(col("r"))).as("s2"))
      .select(col("dim"), col("n_vecs"),
        round(col("s1").cast("double") / col("n_vecs") / lit(1e9), 6)
          .as("mean_val"),
        round((dec(col("n_vecs")) * col("s2") - col("s1") * col("s1"))
          .cast("double") / col("n_vecs").cast("double")
          / col("n_vecs").cast("double") / lit(1e18), 6).as("variance"))
  }

  /** kNN hubness audit: the in-degree histogram of the directed
    * cell-blocked kNN graph — for each vector, how many OTHER vectors
    * list it among their top-`k` in-cell neighbors, bucketed into
    * (in_degree → n_vecs) rows including the never-chosen in_degree-0
    * mass. Hub vectors (in-degree ≫ k) are the classic symptom of
    * degenerate/anisotropic embeddings (Radovanović et al., JMLR 2010):
    * they dominate retrieval results and silently skew ANN-based dedup,
    * so the histogram's tail is the one-glance health read on an
    * embedding column before trusting q68/q86-style semantic dedup.
    *
    * Scale shape: the pair space is cell-blocked via the trained
    * codebook (never n²); per-anchor top-k is a window INSIDE cells
    * (rank ≤ k prunes with WindowGroupLimit); in-degree and its
    * histogram are two hash-keyed aggregates, the second over rows
    * bounded by the max in-degree — bins, never vectors. The zero-row
    * arithmetic is a broadcast of two one-row aggregates.
    */
  def knnHubness(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val av = corpus(spark, sfDir).select(col("vec_id"), col("v"))
      .join(ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell")),
        "vec_id")
    val pairs = av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("anchor"), col("b.vec_id").as("neighbor"),
        round(Vectors.cosine(col("a.v"), col("b.v")), 4).as("cosine"))
    val w = Window.partitionBy(col("anchor"))
      .orderBy(col("cosine").desc, col("neighbor"))
    val edges = pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    // memoized: the histogram AND the covered-count read it, and without
    // the memo each branch would re-run the cell-blocked kNN stage
    val indeg = SessionMemo.durable(spark, sfDir, s"knnHubnessIndeg|$sfDir|$k") {
      edges.groupBy(col("neighbor")).agg(count(lit(1)).as("in_degree"))
    }
    val hist = indeg.groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vecs"))
    // total needs no join — every vector is assigned exactly one cell
    val total = corpus(spark, sfDir).agg(count(lit(1)).as("n_total"))
    val covered = indeg.agg(count(lit(1)).as("n_covered"))
    val zero = broadcast(total).crossJoin(broadcast(covered))
      .select(lit(0L).as("in_degree"),
        (col("n_total") - col("n_covered")).as("n_vecs"))
      .where(col("n_vecs") > 0)
    hist.unionByName(zero)
  }

  def hybridRetrievalRRF(spark: SparkSession, sfDir: String,
      k: Int = 50, queryVec: Long = 0L, c: Int = 60): DataFrame = {
    val lexTop = graft.analytics.TextAnalytics.bm25Rank(spark, sfDir, k = k)
      .select(col("doc_id"), col("bm25"))
    val lex = lexTop.withColumn("rank_lex", row_number().over(
      Window.orderBy(col("bm25").desc, col("doc_id"))).cast("int"))
    val all = corpus(spark, sfDir)
    val qv = all.where(col("vec_id") === queryVec)
      .select(col("v").as("qv"))
    val semTop = all.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(Vectors.cosine(col("qv"), col("v")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(k)
    val sem = semTop.withColumn("rank_sem", row_number().over(
      Window.orderBy(col("cosine").desc, col("doc_id"))).cast("int"))
    def contrib(rank: org.apache.spark.sql.Column) =
      coalesce(round(lit(1e6) / (lit(c) + rank)).cast("long"), lit(0L))
    lex.select(col("doc_id"), col("rank_lex"))
      .join(sem.select(col("doc_id"), col("rank_sem")), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_lex"), lit(-1)).as("rank_lex"),
        coalesce(col("rank_sem"), lit(-1)).as("rank_sem"),
        round((contrib(col("rank_lex")) + contrib(col("rank_sem")))
          .cast("double") / 1e6, 6).as("rrf"))
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick `k` results from each query's top-`nCand`
    * cosine candidates maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    * the diversity-aware final stage of a retrieval pipeline, which keeps
    * a near-duplicate-rich corpus from filling all k slots with copies of
    * one document. Output: the selection order per query with each pick's
    * relevance, its similarity to the already-picked set, and its MMR
    * score at selection time.
    *
    * Determinism: relevance and pairwise sims are the 4-dp-rounded cosine
    * (the q29 contract); the MMR combination runs in doubles with the
    * identical expression shape on both engines and ties break by vec_id.
    *
    * Scale shape: the SCALABLE stage is candidate generation (per-query
    * k-heap over the corpus — here brute-force cosine, in production any
    * ANN route: q30/q37/q125 drop in unchanged); the greedy selection then
    * touches only the (nCand + nCand²)-row grid per query — re-rank cost
    * is independent of corpus size, which is the whole point of MMR-over-
    * candidates. Selection is ONE flatMapGroups pass keyed on query_id
    * (groups parameter-bounded, mutually independent, embarrassingly
    * parallel — linear in the query count), not a driver-side loop and
    * not the former k−1 join rounds with their k−1 job barriers.
    *
    * The candidate grid — top-nCand relevances plus their nCand²-per-query
    * pairwise sims, the ONLY corpus-touching work here — is one packed
    * [[SessionMemo.durable]] family (kind 0 = relevance rows, kind 1 =
    * pairwise-sim rows), keyed by (nCand, nQueries) since k and λ only
    * shape the corpus-free greedy loop. r15 verdict item 1: the grid
    * re-derived per bench pass, leaving q197 the only query outside the
    * ~1.4× median/min band (median 3.98 vs min 1.17).
    */
  def mmrRerank(spark: SparkSession, sfDir: String, k: Int = 5,
      nCand: Int = 20, nQueries: Int = 3, lambda: Double = 0.7): DataFrame = {
    val packed = SessionMemo.durable(spark, sfDir,
        s"mmrCand|$sfDir|$nCand|$nQueries") {
      val all = corpus(spark, sfDir)
      val q = all.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val candW = Window.partitionBy(col("query_id"))
        .orderBy(col("rel").desc, col("cid"))
      val cands = all.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cid"), col("v"),
          round(Vectors.cosine(col("qv"), col("v")), 4).as("rel"))
        .withColumn("crank", row_number().over(candW))
        .where(col("crank") <= nCand)
        .drop("crank")
        .localCheckpoint()
      // candidate-grid pairwise sims: nCand² rows per query, corpus-free
      val sims = cands.as("a")
        .join(cands.as("b"),
          col("a.query_id") === col("b.query_id") && col("a.cid") =!= col("b.cid"))
        .select(col("a.query_id").as("query_id"), col("a.cid").as("cid"),
          col("b.cid").as("other"),
          round(Vectors.cosine(col("a.v"), col("b.v")), 4).as("sim"))
      // the greedy loop never needs the vectors again — pack only the
      // k·nCand relevances and the nCand² sims into one tagged frame
      cands.select(lit(0).as("kind"), col("query_id"), col("cid"),
          lit(null).cast("long").as("other"), col("rel").as("x"))
        .unionByName(sims.select(lit(1).as("kind"), col("query_id"),
          col("cid"), col("other"), col("sim").as("x")))
    }
    mmrSelect(spark, packed, k, lambda)
  }

  /** The MMR greedy selection over a packed candidate-grid frame
    * (kind 0 = (query_id, cid, x=relevance), kind 1 = (query_id, cid,
    * other, x=pairwise sim)) — the distributed second half of
    * [[mmrRerank]], factored out so any candidate source (an ANN route,
    * a synthetic stress grid) can feed it.
    *
    * Scale shape: the selection runs PER QUERY over its own
    * parameter-bounded grid — groups are mutually independent, so one
    * flatMapGroups pass replaces the former k−1 join/window rounds (each
    * a full job barrier: ~1.5 s of scheduling at gate scale, k−1 global
    * syncs at any scale). One shuffle on query_id, then embarrassingly
    * parallel — re-rank cost stays linear in the query count
    * (tools.Stress15 drives 200k queries through this exact operator).
    * The object stage is Catalyst-opaque by design: its input is the
    * bounded grid, never the corpus.
    *
    * Double semantics mirror the former SQL form exactly: λ·rel −
    * (1−λ)·max_sim on the 4-dp-rounded grid values (λ and 1−λ are the
    * same driver-side literals the join form fed to `lit`), argmax ties
    * break to the smaller cid, and −0.0 normalizes to +0.0 before
    * comparison (Spark orders ±0.0 as equal; Ordering[Double] does not).
    */
  private[graft] def mmrSelect(spark: SparkSession, packed: DataFrame,
      k: Int, lambda: Double): DataFrame = {
    val s2 = spark
    import s2.implicits._
    val lam = lambda
    val oneMinus = 1.0 - lambda
    val kk = k
    val out = packed
      .select(col("kind"), col("query_id"), col("cid"), col("other"), col("x"))
      .as[(Int, Long, Long, Option[Long], Double)]
      .groupByKey(_._2)
      .flatMapGroups { (qid, it) =>
        val rowsArr = it.toArray
        val rel = rowsArr.iterator.filter(_._1 == 0)
          .map(r => r._3 -> r._5).toMap
        val sim = rowsArr.iterator.filter(_._1 == 1)
          .map(r => (r._3, r._4.get) -> r._5).toMap
        val cids = rel.keys.toArray.sorted
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val picked = scala.collection.mutable.HashSet.empty[Long]
        val outRows = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Long, Double, Option[Double], Double)]
        var step = 1
        var exhausted = false
        while (step <= kk && !exhausted) {
          var bestCid = -1L
          var bestRel = 0.0
          var bestMs: Option[Double] = None
          var bestMmr = 0.0
          var found = false
          for (c <- cids if !picked.contains(c)) {
            val r = rel(c)
            // a candidate with NO sim entry to any selected pick mirrors
            // the former inner join: it sits out this step (unreachable —
            // the grid carries every in-grid pair — but exact-by-shape)
            var m = Double.NegativeInfinity
            if (step > 1) selected.foreach { s =>
              sim.get((c, s)).foreach(v => if (v > m) m = v)
            }
            if (step == 1 || m != Double.NegativeInfinity) {
              val (ms, mmr) =
                if (step == 1) (None: Option[Double], r)
                else (Some(m), lam * r - oneMinus * m)
              val mmrN = if (mmr == 0.0) 0.0 else mmr // fold −0.0
              val cmp =
                if (!found) 1
                else java.lang.Double.compare(mmrN, bestMmr)
              if (cmp > 0 || (cmp == 0 && c < bestCid)) {
                bestCid = c; bestRel = r; bestMs = ms; bestMmr = mmrN
                found = true
              }
            }
          }
          if (!found) exhausted = true
          else {
            selected += bestCid
            picked += bestCid
            outRows += ((qid, step, bestCid, bestRel, bestMs, bestMmr))
            step += 1
          }
        }
        outRows.iterator
      }
      .toDF("query_id", "step", "vec_id", "rel", "max_sim_sel", "mmr_raw")
    out.select(col("query_id"), col("step"), col("vec_id"),
      col("rel"), col("max_sim_sel"), round(col("mmr_raw"), 6).as("mmr"))
  }

  /** Nearest-centroid (Rocchio) confusion matrix (q341): classify every
    * embedding by the closest per-label mean vector and emit the
    * (true_label, predicted_label, n) cells — the cheapest supervised
    * probe of an embedding space and the classic strong baseline kNN
    * (q204) must beat to justify its cost. Fully exact: coordinates
    * quantize to ×10⁶ fixed point at the scan (the q199 contract), each
    * centroid coordinate is a truncating integer division of exact sums,
    * and every squared distance is an exact integer — argmin ties break
    * to the smallest label, so the matrix is bit-identical cross-engine
    * with no float anywhere.
    *
    * Scale shape: one posexplode scan into a (label, dim)-keyed
    * map-side-combinable centroid aggregate (|labels|·d rows — broadcast
    * side), one dim-keyed join back, one (vec, label)-grain partial sum,
    * a |labels|-bounded per-vector argmin window. No pairwise stage at
    * all — corpus cost is linear.
    */
  def centroidConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val dims = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
      .select(col("vec_id"), col("label"), col("i"),
        round(col("x") * 1e6, 0).cast("long").as("xq"))
      .localCheckpoint() // shared by the centroid build and the scoring join
    val centroids = dims.groupBy(col("label").as("cl"), col("i"))
      .agg(sum(col("xq")).as("sx"), count(lit(1)).as("n"))
      .select(col("cl"), col("i"), expr("sx div n").as("cq"))
    val d2 = dims.join(broadcast(centroids), "i")
      .groupBy(col("vec_id"), col("label"), col("cl"))
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("cl"))
    d2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .groupBy(col("label").as("true_label"),
        col("cl").as("predicted_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-label retrieval quality (q339): MRR@k and precision@k of the
    * exact cosine ranking with same-label-as-query relevance, macro per
    * label — the retrieval-side complement of q204's kNN vote accuracy
    * (one number per query) and q302/q204's global views: a label whose
    * MRR is low marks a class the embedding space cannot retrieve even
    * when it can classify. Reciprocal ranks are ×10⁶ TRUNCATING fixed
    * point (1000000 div rank — the q311 contract), so every per-label
    * sum is an exact integer and only the final two ratios round at 6 dp;
    * queries with no relevant neighbor in the top k contribute rr = 0
    * (standard MRR@k).
    *
    * Scale shape: the ranking IS [[bruteForceTopK]] (broadcast query
    * side, q29 contract — swap any ANN route in unchanged); per-query
    * reduction runs on k-bounded rows, the label rollup on ≤ |labels|.
    */
  def retrievalLabelMetrics(spark: SparkSession, sfDir: String,
      k: Int = 10, nQueries: Int = 100): DataFrame = {
    val labels = corpus(spark, sfDir).select(col("vec_id"), col("label"))
    val nb = bruteForceTopK(spark, sfDir, k, nQueries)
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nl")), Seq("neighbor_id"))
      .join(broadcast(labels.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("label").as("ql"))),
        Seq("query_id"))
      .withColumn("rel", (col("nl") === col("ql")).cast("long"))
    val perQuery = nb.groupBy(col("query_id"), col("ql"))
      .agg(min(when(col("rel") === 1L, col("rank"))).as("first_rel"),
        sum(col("rel")).as("hits"))
      .withColumn("rr_fp",
        coalesce(expr("1000000 div first_rel"), lit(0L)))
    perQuery.groupBy(col("ql").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("first_rel").isNotNull.cast("long")).as("n_hit_queries"),
        sum(col("rr_fp")).as("srr"), sum(col("hits")).as("sh"))
      .select(col("label"), col("n_queries"), col("n_hit_queries"),
        round(col("srr").cast("double")
          / (col("n_queries").cast("double") * 1e6), 6).as("mrr_at_k"),
        round(col("sh").cast("double")
          / (col("n_queries").cast("double") * k), 6).as("precision_at_k"))
  }

  /** kNN label-prediction evaluation: for each query vector, the majority
    * label among its top-`k` cosine neighbors (excluding self) against
    * its true label — the standard embedding-quality probe (a space whose
    * neighbors can't vote the right label won't serve retrieval either),
    * and the eval loop behind weak-label propagation over an embedded
    * corpus. Ties break to the smallest label; ranking uses the q29
    * contract (4-dp cosine, vec_id tiebreak).
    *
    * Scale shape: the query set broadcasts onto one corpus scan (the q29
    * plan); the vote and the argmax run on k-bounded per-query rows via
    * a partial WindowGroupLimit-able rank. In production the brute-force
    * candidate stage swaps for any ANN route (q30/q37/q125) unchanged.
    */
  def knnLabelEval(spark: SparkSession, sfDir: String, k: Int = 10,
      nQueries: Int = 100): DataFrame = {
    // the neighbor ranking IS bruteForceTopK — one definition of the q29
    // contract (4-dp cosine, vec_id tiebreak), so q204 cannot drift from
    // q29/q30 if the rounding or tiebreak ever changes
    val labels = corpus(spark, sfDir).select(col("vec_id"), col("label"))
    val neighbors = bruteForceTopK(spark, sfDir, k, nQueries)
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    neighbors
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(voteW))
      .where(col("vr") === 1)
      .join(broadcast(labels
        .where(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("label").as("true_label"))),
        Seq("query_id"))
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted_label"), col("votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
  }

  /** Dominant principal direction of the embedding cloud by power
    * iteration on the EXACT scatter matrix M = n·Σxxᵀ − (Σx)(Σx)ᵀ (n²
    * times the covariance — the n·Σ−ΣΣ trick keeps mean-centering in
    * integer arithmetic): `iters` rounds of w = M·v with ∞-NORM
    * normalization (divide by max|wᵢ|, an order-independent exact
    * integer, where an L2 norm would need an order-sensitive float sum).
    * The dominant direction is the anisotropy axis — the "rogue
    * dimension" diagnosis that tells an embedding user whether cosine
    * scores are being eaten by one direction (cf. the q171 isotropy
    * gate, which measures the symptom; this names the axis).
    *
    * Determinism: coordinates quantize to ×10⁶ fixed point at the scan;
    * scatter entries and every matrix-vector product are exact integer
    * sums (Decimal(38,0)/HUGEINT); normalization is truncating integer
    * division (both engines truncate toward zero); the only doubles are
    * final 6-dp-rounded loadings.
    *
    * Scale shape: the corpus-scale stage is the scatter accumulation —
    * one (i,j)-keyed partial aggregate over per-vector outer products
    * generated IN-ROW (d² = 4096 cells, map-side combined; the d² blowup
    * is per ROW, the aggregate output is dimension-bounded). The
    * iteration then runs on the driver over the collected d²-cell M —
    * METADATA-sized at any corpus scale (the q172/TrainedCodebook
    * discipline; a distributed loop pays two jobs of cluster latency per
    * round for 64-row arithmetic, measured 3.5 s → 1.3 s at sf0.1).
    */
  def dominantComponent(spark: SparkSession, sfDir: String,
      iters: Int = 8): DataFrame = {
    // embeddingsSpread: the chained outer-product explodes below generate
    // n·d² rows from the scan stage — serial on the one-split gate table
    val vf = Tables.embeddingsSpread(spark, sfDir)
      .select(transform(col("embedding").cast("array<double>"),
        x => round(x * 1e6, 0).cast("long")).as("vf"))
    val n = vf.groupBy().agg(dec(count(lit(1))).as("n"))
    val sx = vf.select(posexplode(col("vf")))
      .groupBy(col("pos").as("i")).agg(sum(dec(col("col"))).as("sx"))
    // outer products are generated IN-ROW (two chained explodes over the
    // quantized array) so the only exchange on the corpus-sized stream is
    // the map-side-combined (i,j) aggregate — a self-join on vec_id would
    // shuffle the exploded table twice for the same cells
    val sxy = vf.select(col("vf"), posexplode(col("vf")))
      .select(col("vf"), col("pos").as("i"), col("col").as("xi"))
      .select(col("i"), col("xi"), posexplode(col("vf")))
      // the product of two x10^6 coordinates fits a long exactly (<=1e12),
      // so the hot multiply stays codegen'd long arithmetic; only the
      // unbounded accumulation is carried as decimal
      .groupBy(col("i"), col("pos").as("j"))
      .agg(sum(dec(col("xi") * col("col"))).as("sxy"))
    val m = sxy
      .join(broadcast(sx.select(col("i"), col("sx").as("sx_i"))), Seq("i"))
      .join(broadcast(sx.select(col("i").as("j"), col("sx").as("sx_j"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        (col("n") * col("sxy") - col("sx_i") * col("sx_j")).as("m"))
    // the scatter matrix is d^2 cells — METADATA-sized at any corpus
    // scale — so the matrix-vector rounds run on the driver (the
    // q172/TrainedCodebook discipline): distributing them would pay two
    // jobs of cluster latency per round for 64-row arithmetic
    val cells = m.collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    val d = cells.keys.map(_._1).max + 1
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 0 until iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cells.getOrElse((i, j), BigInt(0)) * v(j)).sum)
      val mx = w.map(_.abs).max
      // BigInt / truncates toward zero — the same quotient DuckDB's
      // HUGEINT (a - a % b) // b computes
      v = w.map(x => x * 1000000 / mx)
    }
    val sess = spark
    import sess.implicits._
    v.zipWithIndex.toSeq.map { case (x, i) => (i, x.toLong) }
      .toDF("dim", "loading_fp")
      .select(col("dim"), col("loading_fp"),
        round(col("loading_fp").cast("double") / 1e6, 6).as("loading"))
  }

  /** Diagonal-covariance Mahalanobis outliers (q302): top-k vectors by
    * Σ_j (x_j − μ_j)²/σ²_j — the per-dimension-standardized distance a
    * curation pipeline uses to flag corrupt/degenerate embeddings before
    * they poison ANN structures (complements q131's norm audit, which
    * only sees magnitude, and q171's isotropy, which only sees the bulk).
    *
    * Determinism: components are fixed-pointed per element
    * (round(x·10⁶) → long), so per-dim sums S_j, Q_j are exact integers;
    * each dimension's term is evaluated with exact-integer numerators
    * ((n·x_fp − S_j)² over the exact denominator n·Q_j − S_j²) and
    * ROUNDED TO A ×10⁶ LONG PER DIMENSION — the cross-dimension sum is
    * then integer addition, immune to fold order in either engine.
    * Zero-variance dimensions contribute 0 by guard.
    *
    * Scale shape: one posexplode aggregate builds the d-row stats table
    * (map-side combinable; d is a constant), packed into sorted arrays
    * and broadcast; the scoring pass is a single in-row fold over the
    * corpus scan; top-k via TakeOrderedAndProject (per-partition k-heaps
    * — no global sort materializes; NOT a rank<=k filter, because Spark
    * only infers WindowGroupLimit for partitioned windows) with the rank
    * window running over the k kept rows only.
    */
  def mahalanobisOutliers(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame = {
    val emb = Tables.embeddingsSpread(spark, sfDir)
      .select(col("vec_id"), col("label"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 1000000, 0) AS BIGINT))")
          .as("xfp"))
    val stats = emb
      .select(posexplode(col("xfp")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(col("x")).as("s"),
        sum(dec(col("x")) * col("x")).as("q"))
    val nRow = emb.agg(count(lit(1)).as("nv"))
    val packed = stats.crossJoin(broadcast(nRow))
      .select(col("j"), col("s"),
        (dec(col("nv")) * col("q") - dec(col("s")) * col("s"))
          .cast("double").as("d"))
      .agg(sort_array(collect_list(struct(col("j"), col("s"), col("d"))))
        .as("arr"))
      .select(expr("transform(arr, t -> t.s)").as("s_arr"),
        expr("transform(arr, t -> t.d)").as("d_arr"))
    val scored = emb.crossJoin(broadcast(packed)).crossJoin(broadcast(nRow))
      .withColumn("m2_fp", expr(
        """aggregate(sequence(0, size(xfp) - 1), 0L, (acc, i) -> acc +
          | CASE WHEN element_at(d_arr, i + 1) <= 0.0 THEN 0L
          | ELSE CAST(round(
          |   (CAST(nv * element_at(xfp, i + 1) - element_at(s_arr, i + 1) AS DOUBLE)
          |    * CAST(nv * element_at(xfp, i + 1) - element_at(s_arr, i + 1) AS DOUBLE)
          |    / element_at(d_arr, i + 1)) * 1000000, 0) AS BIGINT) END)""".stripMargin))
    // top-k via TakeOrderedAndProject (per-partition k-heaps, no global
    // sort); the rank window then runs over the k surviving rows only.
    // A bare rank<=k filter would NOT get WindowGroupLimit here: Spark's
    // InferWindowGroupLimit only fires for PARTITIONED rank filters, so
    // the unpartitioned form would funnel the whole corpus into one task.
    val w = Window.orderBy(col("m2_fp").desc, col("vec_id"))
    scored
      .orderBy(col("m2_fp").desc, col("vec_id"))
      .limit(k)
      .withColumn("outlier_rank", row_number().over(w).cast("int"))
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("m2_fp"),
        round(col("m2_fp").cast("double") / 1e6, 6).as("m2"),
        col("outlier_rank"))
  }

  /** The trained-codebook assignment with each vector snapped to the
    * exact 10⁻³ integer grid — the shared base of the q357 silhouette and
    * q360 dispersion audits (squared distances on the grid are exact
    * BIGINTs, so both cluster-quality metrics are engine-free integer
    * arithmetic until their final ratios). Coordinates shift by +10³
    * (|x| ≤ 1 for these unit-scale embeddings) so every grid value — and
    * therefore every centroid-mean dividend downstream — is POSITIVE:
    * truncating and flooring integer division only agree on non-negative
    * operands, and distances are shift-invariant. Memoized per session.
    */
  private def quantizedAssignment(spark: SparkSession,
      sfDir: String): DataFrame =
    SessionMemo.durable(spark, sfDir, s"quantizedAssignment|$sfDir") {
      ivfAssignTrained(spark, sfDir).select(col("vec_id"), col("cell"))
        .join(corpus(spark, sfDir).select(col("vec_id"), col("v")),
          Seq("vec_id"))
        .select(col("vec_id"), col("cell"),
          transform(col("v"),
            x => round(x * 1e3).cast("long") + lit(1000L)).as("vq"))
    }

  /** Per-vector silhouette (q357, Rousseeuw 1987) of the trained-codebook
    * cells, in the squared-euclidean variant on the 10⁻³ grid (the coarser grid keeps
    * every ×10⁶ fixed-point numerator inside INT64 — sums of ~500
    * pairwise squared distances reach ~10¹⁰, × 10⁶ ≈ 10¹⁶): a(i) =
    * mean squared distance to own-cell peers, b(i) = min over other
    * cells of the mean squared distance, s(i) = (b−a)/max(a,b) as a ×10⁶
    * truncating fixed point with the sign split out explicitly (Spark's
    * `div` truncates toward zero while a floor-division engine would
    * round down — dividing magnitudes and applying the sign afterwards
    * pins both to the same integer). Singletons publish s = 0 (the
    * standard convention).
    *
    * Scale shape: the pairwise stage is a broadcast of the (id, cell,
    * vector) table against itself — quadratic by definition of the
    * metric; at corpus scale you silhouette a pinned-hash SAMPLE (the
    * q51 draw) and this operator is exactly that computation on the
    * sample. Everything after the pair scores is (i, cell)-grouped
    * map-side-combinable aggregation.
    */
  def silhouette(spark: SparkSession, sfDir: String): DataFrame =
    silhouetteOf(quantizedAssignment(spark, sfDir))

  /** [[silhouette]] over an arbitrary (vec_id, cell, vq) frame. */
  def silhouetteOf(a0: DataFrame): DataFrame = {
    // d2 = |x|^2 + |y|^2 - 2 x.y with the codegen'd integer dot: the
    // interpreted zip_with fold is a ~12x tax on the quadratic stage
    val a = a0.withColumn("n2",
      graft.functions.Vectors.dotLong(col("vq"), col("vq")))
    val pairs = a.as("x").join(broadcast(a.as("y")),
        col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("i"), col("x.cell").as("ci"),
        col("y.cell").as("cj"),
        (col("x.n2") + col("y.n2")
          - graft.functions.Vectors.dotLong(col("x.vq"), col("y.vq")) * 2)
          .as("d2"))
    val grp = pairs.groupBy(col("i"), col("ci"), col("cj"))
      .agg(sum(col("d2")).as("s"), count(lit(1)).as("c"))
    val own = grp.where(col("ci") === col("cj"))
      .select(col("i"), expr("(s * 1000000) div c").as("a_fp"),
        (col("c") + 1).as("n_own"))
    val other = grp.where(col("ci") =!= col("cj"))
      .select(col("i"), expr("(s * 1000000) div c").as("bc"))
      .groupBy(col("i")).agg(min(col("bc")).as("b_fp"))
    a.select(col("vec_id").as("i"), col("cell"))
      .join(own, Seq("i"), "left")
      .join(other, Seq("i"), "left")
      .select(col("i").as("vec_id"), col("cell"),
        coalesce(col("n_own"), lit(1L)).as("n_own"),
        col("a_fp"), col("b_fp"),
        when(col("a_fp").isNull || col("b_fp").isNull
            || greatest(col("a_fp"), col("b_fp")) === 0L, lit(0L))
          .otherwise(when(col("b_fp") >= col("a_fp"),
            expr("((b_fp - a_fp) * 1000000) div greatest(a_fp, b_fp)"))
            .otherwise(-expr(
              "((a_fp - b_fp) * 1000000) div greatest(a_fp, b_fp)")))
          .as("s_fp"))
  }

  /** Top principal direction by integer power iteration (q369): the
    * dominant eigenvector of the embedding scatter matrix ΣᵢxᵢxᵢᵀT
    * (mean-centered on the 10⁻³ grid), computed with EIGHT rounds of
    * exact BigInt matrix-vector products and ×10⁶ max-normalization —
    * the q91-PageRank discipline applied to PCA. No float accumulates
    * anywhere: the scatter build is exact BIGINT sums (distributed, one
    * dim-pair fan-out), the iteration runs on the collected d×d matrix
    * (4096 rows — metadata-sized like every codebook here, the
    * documented d²-not-n driver solve), normalization divides POSITIVE
    * magnitudes only (sign split out), and the Rayleigh-quotient
    * eigenvalue is one double division of two exact integers.
    *
    * Scale shape: the corpus is touched once by the d² accumulator
    * (map-side combinable on (d,e)); everything after is O(d²·rounds)
    * independent of corpus size. The d²-row scatter/mean table is a
    * [[SessionMemo.durable]] family (r14 verdict item 2: q369's 11.4 s
    * driver cold was this n·d² self-join aggregate re-run per pass; the
    * table is a deterministic exact-integer aggregate, metadata-sized,
    * and independent of `rounds`, so memoizing it — attributed in Bench's
    * prebuild — leaves each call only the O(d²·rounds) driver iteration).
    */
  def principalDirection(spark: SparkSession, sfDir: String,
      rounds: Int = 8): DataFrame = {
    import spark.implicits._
    val stats = SessionMemo.durable(spark, sfDir, s"principalCov|$sfDir") {
      val base = quantizedAssignment(spark, sfDir)
        .select(col("vec_id"), col("vq"))
      val n = base.count()
      val dims = base.select(col("vec_id"),
        posexplode(col("vq")).as(Seq("d", "x")))
      val mean = dims.groupBy(col("d"))
        .agg(expr("sum(x) div count(1)").as("m"))
      val cd = dims.join(broadcast(mean), Seq("d"))
        .select(col("vec_id"), (col("d") + 1).as("d"),
          (col("x") - col("m")).as("c"))
      val cov = cd.as("a").join(cd.as("b"),
          col("a.vec_id") === col("b.vec_id"))
        .groupBy(col("a.d").as("d"), col("b.d").as("e"))
        .agg(sum(col("a.c") * col("b.c")).as("cov"))
      // one packed d²-row frame: cov cell + its row-dim mean + corpus n,
      // so the memo family is a single durable entry
      cov.join(broadcast(mean.select((col("d") + 1).as("d"), col("m"))),
          Seq("d"))
        .withColumn("n_vecs", lit(n))
    }
    // d x d collect — the same metadata-sized driver solve as the OLS /
    // codebook paths; corpus-scale work ended at the memoized aggregate
    val rows = stats.collect()
    // empty embeddings table → empty typed frame, not rows.head throwing
    // (r15 verdict item 3: unreachable at gate scales, robustness guard)
    if (rows.isEmpty)
      return Seq.empty[(Int, Long, Long, Long, Double)]
        .toDF("dim", "mean_grid", "v_fp", "n_vecs", "lambda_rayleigh")
    val a = rows.map(r => (r.getInt(r.fieldIndex("d")),
      r.getInt(r.fieldIndex("e")), r.getLong(r.fieldIndex("cov"))))
    val n = rows.head.getLong(rows.head.fieldIndex("n_vecs"))
    val d = a.map(_._1).max
    val m = Array.ofDim[BigInt](d + 1, d + 1)
    a.foreach { case (i, j, v) => m(i)(j) = BigInt(v) }
    var v = Array.fill(d + 1)(BigInt(1000000))
    for (_ <- 1 to rounds) {
      val w = (1 to d).map(i =>
        (1 to d).map(j => m(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = (BigInt(0) +: w.map(x =>
        if (x.signum >= 0) (x.abs * 1000000) / mx
        else -((x.abs * 1000000) / mx))).toArray
    }
    val av = (1 to d).map(i => (1 to d).map(j => m(i)(j) * v(j)).sum)
    val num = (1 to d).map(i => v(i) * av(i - 1)).sum
    val den = (1 to d).map(i => v(i) * v(i)).sum
    val lambda = BigDecimal(num.toDouble / den.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val meanMap = rows.map(r => r.getInt(r.fieldIndex("d")) ->
      r.getLong(r.fieldIndex("m"))).toMap
    (1 to d).map(i => (i, meanMap(i), v(i).toLong, n, lambda))
      .toDF("dim", "mean_grid", "v_fp", "n_vecs", "lambda_rayleigh")
  }

  /** Quadratic-kernel MMD² (q370, Gretton et al. JMLR'12) between the
    * label-0-4 and label-5-9 embedding populations: the biased
    * V-statistic E[k(X,X′)] + E[k(Y,Y′)] − 2E[k(X,Y)] under the
    * polynomial kernel k(x,y) = (x·y)² evaluated on the UNSHIFTED 10⁻³
    * integer grid — every kernel value is an exact BIGINT (dot ≤ d·10⁶·
    * ~4, squared ≤ ~10¹⁷) and the three cell sums are exact DECIMAL(38)
    * accumulations, so the two-sample discrepancy is engine-free until
    * its final three double divisions. The kernel two-sample test a
    * training pipeline runs to answer "did the embedding distribution
    * move between snapshots" with more power than per-dimension KS.
    *
    * Scale shape: one pairwise stage (quadratic by definition — the
    * scale path is the pinned-hash sample, as with q357/q362), probe
    * side repartitioned so the broadcast join parallelizes; cell sums
    * are map-side combinable.
    */
  def mmdQuadratic(spark: SparkSession, sfDir: String): DataFrame =
    mmdQuadraticOf(spark, corpus(spark, sfDir)
      .select(col("vec_id"), when(col("label") < 5, lit("x"))
        .otherwise(lit("y")).as("g"),
        transform(col("v"), x => round(x * 1e3).cast("long")).as("vq")))

  /** [[mmdQuadratic]] over an arbitrary tagged (vec_id, g, vq) frame. */
  def mmdQuadraticOf(spark: SparkSession, tagged: DataFrame): DataFrame = {
    // PINNED partition count: with the count left to AQE the coalescer
    // folds this sub-MB exchange to one partition BEFORE the checkpoint
    // materializes it, and the n² kernel-dot probe below then runs as a
    // single task (StageMetrics r13)
    val vecs = tagged.repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt, col("vec_id"))
      .localCheckpoint()
    val k = graft.functions.Vectors.dotLong(col("a.vq"), col("b.vq"))
    // project k ONCE before squaring: a duplicated higher-order-function
    // expression is evaluated twice per row (no CSE for interpreted HOFs)
    val cells = vecs.as("a").join(broadcast(vecs.as("b")), lit(true))
      .select(col("a.g").as("ga"), col("b.g").as("gb"), k.as("k"))
      .select(col("ga"), col("gb"),
        (col("k") * col("k"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("kk"))
      .groupBy(col("ga"), col("gb")).agg(sum(col("kk")).as("s"))
    val nx = vecs.where(col("g") === "x").count()
    val ny = vecs.where(col("g") === "y").count()
    import spark.implicits._
    // degrade like the other *Of entry points: an empty group has no MMD
    // (the kernel expectations divide by n_x·n_y) — null metrics, not a
    // NoSuchElementException / divide-by-zero
    if (nx == 0 || ny == 0) {
      Seq((nx, ny)).toDF("n_x", "n_y")
        .select(col("n_x"), col("n_y"),
          lit(null).cast("double").as("e_kxx_t"),
          lit(null).cast("double").as("e_kyy_t"),
          lit(null).cast("double").as("e_kxy_t"),
          lit(null).cast("double").as("mmd2_t"))
    } else {
      val byCell = cells.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDecimal(2))
        .toMap
      def cell(a: String, b: String): BigDecimal =
        byCell.get((a, b)).map(BigDecimal(_)).getOrElse(BigDecimal(0))
      val sxx = cell("x", "x").toDouble
      val syy = cell("y", "y").toDouble
      val sxy = (cell("x", "y") + cell("y", "x")).toDouble
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val exx = sxx / (nx.toDouble * nx.toDouble)
      val eyy = syy / (ny.toDouble * ny.toDouble)
      val exy = sxy / (2.0 * nx.toDouble * ny.toDouble)
      Seq((nx, ny, r6(exx / 1e12), r6(eyy / 1e12), r6(exy / 1e12),
        r6((exx + eyy - 2.0 * exy) / 1e12)))
        .toDF("n_x", "n_y", "e_kxx_t", "e_kyy_t", "e_kxy_t", "mmd2_t")
    }
  }

  /** Cluster dispersion audit (q360): per-cell within-cluster squared
    * scatter around the truncating integer-mean centroid, between-cluster
    * scatter n_c·‖centroid_c − centroid_global‖², and the
    * Calinski-Harabasz index (between/(k−1)) / (within/(n−k)) — the
    * variance-ratio score that says whether the trained codebook's cells
    * actually separate the corpus. All scatters are exact BIGINTs on the
    * 10⁻³ grid; the CH ratio is the one 6-dp double, repeated per row.
    *
    * Scale shape: centroids are per-(cell, dim) map-side-combinable
    * means rebuilt into arrays (k·d rows — codebook-sized); each scatter
    * is one broadcast-join map pass over the corpus; no pairwise stage
    * at all (contrast q357 — this is the quality metric that stays
    * linear at 100 TB).
    */
  def clusterDispersion(spark: SparkSession, sfDir: String): DataFrame =
    // NOTE: a pinned repartition of the memo read-back was tried here
    // (r13) and REGRESSED 2.1 → 4.5 s — the collect_list centroids and
    // broadcast passes below are |cells|-grain, so the extra exchange
    // only adds scheduling; the one-split read is not this query's cost
    clusterDispersionOf(quantizedAssignment(spark, sfDir))

  /** [[clusterDispersion]] over an arbitrary (vec_id, cell, vq) frame. */
  def clusterDispersionOf(a: DataFrame): DataFrame = {
    val dims = a.select(col("cell"), posexplode(col("vq")).as(Seq("dim", "x")))
    def centroidOf(grouped: DataFrame): DataFrame = grouped
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        e => e.getField("m")).as("cv"))
    val cents = centroidOf(dims.groupBy(col("cell"), col("dim"))
      .agg(expr("sum(x) div count(1)").as("m")))
    val global = centroidOf(dims.select(lit(-1L).as("cell"), col("dim"),
        col("x"))
      .groupBy(col("cell"), col("dim"))
      .agg(expr("sum(x) div count(1)").as("m")))
      .select(col("cv").as("gv"))
    def d2(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
      aggregate(zip_with(u, v, (p, q) => (p - q) * (p - q)), lit(0L),
        (acc, e) => acc + e)
    val wss = a.join(broadcast(cents), Seq("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_c"), sum(d2(col("vq"), col("cv"))).as("wss_c"))
    val perCell = wss.join(broadcast(cents), Seq("cell"))
      .crossJoin(broadcast(global))
      .select(col("cell"), col("n_c"), col("wss_c"),
        (col("n_c") * d2(col("cv"), col("gv"))).as("bgd_c"))
    val tot = perCell.agg(sum(col("wss_c")).as("wss"),
      sum(col("bgd_c")).as("bgd"), count(lit(1)).as("k"),
      sum(col("n_c")).as("n"))
    perCell.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_c"), col("wss_c"), col("bgd_c"),
        col("k"), col("n"),
        round((col("bgd").cast("double") * (col("n") - col("k"))
            .cast("double"))
          / (col("wss").cast("double") * (col("k") - 1).cast("double")), 6)
          .as("ch_index"))
  }
}
