package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loader for the driver-generated testdata star schema (TESTDATA.md).
  *
  * One parquet file per table under an sf directory. At 100 TB these would be
  * directories of many files (possibly partitioned / bucketed); `load` takes
  * the path as-is so both layouts work — Spark's parquet source handles
  * file-or-directory transparently and parallelizes by row-group.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ under
    * Spark 4's NTZ inference. The engine's session runs pinned to UTC
    * ([[GraftSession]]), so the NTZ local datetimes ARE the UTC instants;
    * cast them back to TimestampType so every downstream instant function
    * (`unix_micros`, watermarks, tz-aware windows) keeps working regardless
    * of which flavor the generator wrote.
    */
  /** Inferred-schema cache: `spark.read.parquet(path)` re-reads footers to
    * infer the schema on EVERY call — measured 0.08-0.13 s of driver time
    * per load at sf0.1 vs 0.02 s with an explicit schema, and a bench pass
    * calls load 1-3 times per query × 383 queries (guide §5: driver-side
    * single-threaded work is invisible in task metrics). Keyed by
    * path + file mtime so a rewritten file re-infers; values are schema
    * METADATA only — never data, never results.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(path)).toMillis
      catch { case _: Exception => -1L }
    val schema = schemaCache.computeIfAbsent(s"$path@$mtime",
      _ => spark.read.parquet(path).schema)
    val raw = spark.read.schema(schema).parquet(path)
    raw.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark reads only as a
    * long (spark.sql.legacy.parquet.nanosAsLong). Convert ns→µs with integer
    * division (a double division would lose precision at ~1.7e18) and expose
    * a proper TimestampType column. Sub-µs digits are zero in this data
    * (generated at µs resolution), so the truncation is lossless.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** [[documents]] repartitioned by doc_id to the session's shuffle
    * parallelism — for COMPUTE-BOUND per-row text pipelines (shingle+md5
    * hashing, posexplode rebuilds) over the gate-scale corpus, which
    * lands in ONE parquet split (594 KB, one row group) and would
    * otherwise run its entire hot path as a single serial task while 31
    * cores idle (r13 StageMetrics: q118 3.6 → 1.2 s, q75 via the same
    * move). The count is PINNED (REPARTITION_BY_NUM): AQE's bytes-based
    * coalescer sees a sub-MB exchange and folds it back to one
    * partition, re-serializing exactly the stage the shuffle exists to
    * spread — bytes are the wrong oracle for compute-bound stages. A
    * 100 TB corpus arrives in thousands of splits and SKIPS the shuffle
    * (see [[spreadBy]]), so compute-bound consumers can route through
    * this form unconditionally.
    */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spreadBy(s, documents(s, d), "doc_id")

  /** Repartition `df` by `key` to the session's shuffle parallelism —
    * ONLY when its scan arrives with less than half that parallelism.
    * A gate-scale single-split table gets the pinned-count spread; a
    * corpus-scale table (thousands of splits at 100 TB) skips the
    * shuffle entirely, so compute-bound consumers can use the spread
    * form unconditionally without paying a corpus-wide exchange at
    * scale.
    *
    * The split count comes from the LEAF FileSourceScan of the physical
    * plan (no job runs) rather than `df.rdd.getNumPartitions`, which
    * built a throwaway whole-plan RDD lineage + deserializer per call
    * (r13 verdict item 4 / advice 5); the spread/skip DECISION is then
    * cached per (scan root paths, total bytes, target), so the ~34 call
    * sites re-plan the probe at most once per distinct table layout per
    * JVM. A non-file-scan input (not produced by [[load]]) skips the
    * spread: blindly repartitioning an unknown layout is exactly the
    * corpus-wide exchange this helper exists to avoid at scale.
    */
  private val spreadDecisions =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[graft] def spreadBy(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val target = s.conf.get("spark.sql.shuffle.partitions").toInt
    val rels = df.queryExecution.analyzed.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation] =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
    }
    val needsSpread = if (rels.isEmpty) false else {
      // key carries every split-affecting input we can read without a
      // job, folded over ALL file-scan leaves (r15 advice 2: the min-fold
      // decision in splitsOf reads every leaf, so a first-relation-only
      // key would alias two plans that share a first scan but differ in
      // the others — e.g. a join with a one-split side inheriting a
      // cached skip): per relation its paths, total bytes and FILE COUNT
      // (an in-place rewrite that keeps total bytes but changes the file
      // set re-keys — listing is already cached in the FileIndex), then
      // the full split-sizing state (FilePartition math reads
      // maxPartitionBytes, openCostInBytes AND the context's default
      // parallelism — r15 review: a sibling session with a different
      // openCostInBytes must not inherit this one's cached decision), and
      // the spread target. Counts come from the index's cached FileStatus
      // list, NOT `inputFiles` — that helper materializes a fresh
      // path-string array per call, an O(#files) allocation on every
      // lookup at exactly the corpus scale this helper protects (r14
      // advice 2).
      val relKey = rels.map { rel =>
        val fileCount = rel.location match {
          case p: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
            p.allFiles().length
          case other => other.inputFiles.length
        }
        rel.location.rootPaths.mkString(",") +
          s"|${rel.location.sizeInBytes}|$fileCount"
      }.mkString(";")
      val cacheKey = relKey +
        s"|${s.conf.get("spark.sql.files.maxPartitionBytes")}" +
        s"|${s.conf.get("spark.sql.files.openCostInBytes", "4194304")}" +
        s"|${s.sparkContext.defaultParallelism}|$target"
      spreadDecisions.computeIfAbsent(cacheKey,
        _ => java.lang.Boolean.valueOf(scanSplits(df).toLong * 2 < target))
        .booleanValue()
    }
    if (needsSpread) df.repartition(target, col(key)) else df
  }

  /** Partition count of the plan's leaf file scan — computed from the
    * scan's own input RDD (file listing is already cached in the
    * relation's FileIndex; nothing executes). Probes `sparkPlan` (the
    * physical plan BEFORE the adaptive preparation wraps it): on an
    * exchange- or subquery-bearing input, `executedPlan` is a single
    * AdaptiveSparkPlanExec LEAF that hides the scan, which would silently
    * skip — and cache — the wrong decision (r14 advice 1); the pre-AQE
    * plan always exposes the FileSourceScan, and the defensive
    * AdaptiveSparkPlanExec case recurses into its input should one ever
    * surface here. `MaxValue` when the leaf is not a file scan, so the
    * caller skips the spread.
    */
  private def scanSplits(df: DataFrame): Int =
    splitsOf(df.queryExecution.sparkPlan).getOrElse(Int.MaxValue)

  /** Min split count over ALL file-scan leaves (min-fold, not
    * collectFirst — r15 review: committing to the first matching leaf
    * would let a scanless AQE-wrapped subtree shadow a sibling one-split
    * scan and cache the wrong skip); None when no leaf is a file scan.
    */
  private def splitsOf(
      p: org.apache.spark.sql.execution.SparkPlan): Option[Int] =
    p.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Some(f.inputRDD.getNumPartitions)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        splitsOf(a.inputPlan)
      case _ => None
    }.minOption
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** [[embeddings]] repartitioned by vec_id to the session's shuffle
    * parallelism — the vector analogue of [[documentsSpread]]: the gate
    * embeddings table is one parquet split, so per-row vector math
    * (fold/zip dot products, quantization, outer-product explodes) would
    * otherwise run single-task; same pinned-count rationale.
    */
  def embeddingsSpread(s: SparkSession, d: String): DataFrame =
    spreadBy(s, embeddings(s, d), "vec_id")
}
