package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types._

/** Distributed global rank / running totals WITHOUT a single-partition
  * window (VERDICT r10 item 1).
  *
  * `Window.orderBy(...)` with no partitionBy is the one window shape that
  * cannot scale: Spark moves the ENTIRE input through one task ("moving
  * all data to a single partition" — the executor-OOM class at 100 TB).
  * Yet a handful of statistics genuinely need a total order over an
  * unbounded grain: the Lorenz curve ranks every user by spend (q367),
  * the Qini curve ranks every experiment unit by model score (q375), the
  * Mann-Whitney U walks cumulative counts up the distinct-score grain
  * (q218).
  *
  * This helper computes the same `row_number` and inclusive prefix sums
  * with the classic two-pass ranged decomposition a distributed sort
  * already uses for file-boundary assignment:
  *
  *  1. ONE range shuffle (`repartitionByRange` on the order key) + a
  *     per-partition sort — partition i holds an order-contiguous block,
  *     so global rank = local rank + (rows in partitions < i).
  *  2. Pass A: per-partition row counts and column totals — ONE row per
  *     partition, collected to the driver (≤ spark.sql.shuffle.partitions
  *     rows: metadata-sized by construction at any data scale).
  *  3. Driver: exclusive scan of those totals → per-partition rank/sum
  *     OFFSETS, shipped back in the task closure (broadcast-sized).
  *  4. Pass B: a narrow per-partition walk adds `offset + local prefix`.
  *
  * Both passes derive from the SAME materialized RDD, so the range
  * shuffle executes once (pass B's stage is skipped-as-computed) and the
  * partition assignment the offsets were computed from is the partition
  * assignment pass B walks — consistency by construction, not by
  * exchange-reuse luck. The per-partition walk is the one sanctioned use
  * of the RDD API in this codebase: genuinely imperative per-partition
  * logic (a running counter) that no declarative operator expresses
  * without re-shuffling the full grain a second time.
  *
  * Determinism / bit-exactness: `order` MUST be a total order (callers
  * tie-break with a unique key) — then the rank of a row is a pure
  * function of the data, invariant to where the sampled range boundaries
  * happen to land. Prefix sums accumulate exactly: LongType in Long
  * arithmetic (identical to Spark's non-ANSI `sum`), DecimalType in
  * java.math.BigDecimal re-emitted as Decimal(38, s) (identical to
  * Spark's sum widening). Nulls are ignored, matching `sum` over a
  * running frame.
  */
object RangedRank {

  /** Result of [[withGlobalRank]]: the ranked frame plus the grand
    * totals pass A already computed — `total` (row count) and per
    * prefix-column sums — so callers needing "n" or "sum(x)" alongside
    * the ranks (q367's decile targets, q375's decile cut) get them
    * WITHOUT a second action over the grain.
    */
  final case class Ranked(df: DataFrame, total: Long,
      sumTotals: Map[String, Any]) {
    def totalLong(outCol: String): Long = sumTotals(outCol) match {
      case l: java.lang.Long => l
      case d: java.math.BigDecimal => d.longValueExact()
      case other => sys.error(s"unexpected total type for $outCol: $other")
    }
  }

  /** Appends a global `row_number` column `rankCol` (LongType, 1-based,
    * by `order`) and, per `(srcCol, outCol)` in `prefixSums`, the
    * inclusive running sum of `srcCol` in order — the distributed
    * equivalent of
    * `row_number().over(Window.orderBy(order))` and
    * `sum(src).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))` — with no single-partition stage anywhere.
    *
    * `order` must be a total order; `srcCol`s must be integral or
    * decimal columns of `df`.
    *
    * EAGER: pass A (the range shuffle + partition-totals collect) runs at
    * CALL time, not first-action time — the offsets and `total` are Scala
    * values the result plan embeds. Callers that only want to inspect the
    * returned plan still pay the shuffle; there is no lazy variant
    * because the broadcast offsets cannot be computed executor-side.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      prefixSums: Seq[(String, String)] = Seq.empty): Ranked = {
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val srcIdx: Array[Int] =
      prefixSums.map { case (src, _) => schema.fieldIndex(src) }.toArray
    val srcTypes: Array[DataType] = srcIdx.map(i => schema(i).dataType)
    srcTypes.foreach {
      case LongType | IntegerType | _: DecimalType => ()
      case t => sys.error(s"RangedRank prefix sums support long/int/decimal, got $t")
    }
    val k = srcIdx.length

    // ONE materialized lineage: pass A's shuffle map output is reused by
    // pass B (same RDD object), so pids and offsets can never disagree.
    // The walk stays on InternalRow end to end (queryExecution.toRdd, not
    // .rdd): the .rdd path deserialized EVERY field of EVERY row into a
    // boxed Row both ways; this path reads only the ≤ k prefix columns
    // and projects appended columns into an UnsafeRow.
    //
    // DELIBERATE: the per-partition SORT runs twice (pass A's stage and
    // pass B's — only the shuffle MAP output is reused across jobs), and
    // that is the scale-correct trade. The alternative — persisting the
    // sorted run — was built and measured (r12): at the 100 TB design
    // point it means caching the entire sorted corpus (a non-starter),
    // at 500M rows locally it OOMs the default heap mid-unroll
    // (MEMORY_AND_DISK_SER) or trades sort CPU for an equal disk round
    // trip (DISK_ONLY), and serialized InternalRow caching silently
    // corrupts under JavaSerializer's instance-dedup unless every reused
    // UnsafeRow buffer is copied first (caught bit-exactly by
    // RangedRankPropSpec). Re-sorting deterministic shuffle output wins
    // on every axis.
    val rdd = sorted.queryExecution.toRdd
    val types = srcTypes // avoid capturing `this`-adjacent vals twice
    val idx = srcIdx

    // pass A: per-partition (count, totals) — ≤ p rows to the driver
    val partTotals: Array[(Int, Long, Array[Any])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        val acc = Array.tabulate[Any](idx.length)(j => zeroOf(types(j)))
        it.foreach { r =>
          n += 1
          var j = 0
          while (j < idx.length) {
            acc(j) = addOf(types(j), acc(j), readOf(types(j), r, idx(j)))
            j += 1
          }
        }
        Iterator.single((pid, n, acc))
      }.collect().sortBy(_._1)

    // driver: exclusive scan → offsets per pid (metadata-sized). Sized by
    // the RDD's ACTUAL partition count — AQE or an empty input can plan
    // fewer partitions than requested
    val nParts = rdd.getNumPartitions
    val rankOffsets = new Array[Long](nParts)
    val sumOffsets = Array.fill[Array[Any]](nParts)(null)
    var runN = 0L
    var runS = Array.tabulate[Any](k)(j => zeroOf(srcTypes(j)))
    partTotals.foreach { case (pid, n, sums) =>
      rankOffsets(pid) = runN
      sumOffsets(pid) = runS
      runN += n
      val next = new Array[Any](k)
      var j = 0
      while (j < k) { next(j) = addOf(srcTypes(j), runS(j), sums(j)); j += 1 }
      runS = next
    }
    val total = runN
    val grandTotals = prefixSums.map(_._2).zip(runS.toSeq).toMap

    // pass B: narrow per-partition walk appending rank + running sums
    def outType(t: DataType): DataType = t match {
      case d: DecimalType => DecimalType(38, d.scale) // Spark sum widening
      case _ => LongType
    }
    val outSchema = StructType(schema.fields ++
      (StructField(rankCol, LongType, nullable = false) +:
        prefixSums.zip(srcTypes).map { case ((_, out), t) =>
          StructField(out, outType(t), nullable = false)
        }))
    val ro = rankOffsets
    val so = sumOffsets
    val outTypes: Array[DataType] = srcTypes.map(outType)
    val resRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = ro(pid)
      val acc = so(pid).clone()
      // appended columns ride a small GenericInternalRow joined to the
      // input row; the UnsafeProjection materializes each output into its
      // own (reused) buffer — no per-field boxing of the INPUT columns
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outSchema)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1 + idx.length)
      it.map { row =>
        r += 1
        var j = 0
        while (j < idx.length) {
          acc(j) = addOf(types(j), acc(j), readOf(types(j), row, idx(j)))
          j += 1
        }
        extra.update(0, r)
        j = 0
        while (j < idx.length) {
          extra.update(j + 1, catalystOf(outTypes(j), acc(j))); j += 1
        }
        proj(joined(row, extra))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    Ranked(org.apache.spark.sql.graftbridge.GraftBridge
      .internalCreateDataFrame(spark, resRdd, outSchema), total, grandTotals)
  }

  /** Exact accumulation per source type. Object-level (not nested in the
    * method) so task closures reference the module statically instead of
    * dragging the enclosing method frame into serialization. `addOf`
    * matches `sum` semantics: nulls ignored, Long wraps like non-ANSI
    * sum, Decimal is exact.
    */
  private def zeroOf(t: DataType): Any = t match {
    case _: DecimalType => java.math.BigDecimal.ZERO
    case _ => java.lang.Long.valueOf(0L)
  }

  /** Typed InternalRow read in the accumulator's Java representation
    * (null → null, matching `sum`'s null-skipping via [[addOf]]). Only
    * the ≤ k prefix-sum columns are ever read — the input row's other
    * fields are never touched, which is the point of the InternalRow
    * path.
    */
  private def readOf(t: DataType,
      r: org.apache.spark.sql.catalyst.InternalRow, i: Int): Any =
    if (r.isNullAt(i)) null
    else t match {
      case d: DecimalType =>
        r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
      case LongType => java.lang.Long.valueOf(r.getLong(i))
      case _ => java.lang.Integer.valueOf(r.getInt(i))
    }

  /** Accumulator value → catalyst representation for the OUTPUT type
    * ([[zeroOf]]'s Java types back into InternalRow form).
    */
  private def catalystOf(outT: DataType, v: Any): Any = outT match {
    case d: DecimalType => org.apache.spark.sql.types.Decimal(
      v.asInstanceOf[java.math.BigDecimal], d.precision, d.scale)
    case _ => v // java.lang.Long, stored as a long
  }

  private def addOf(t: DataType, a: Any, v: Any): Any =
    if (v == null) a
    else t match {
      case _: DecimalType =>
        a.asInstanceOf[java.math.BigDecimal]
          .add(v.asInstanceOf[java.math.BigDecimal])
      case LongType => java.lang.Long.valueOf(
        a.asInstanceOf[java.lang.Long].longValue() +
          v.asInstanceOf[java.lang.Long].longValue())
      case _ => java.lang.Long.valueOf(
        a.asInstanceOf[java.lang.Long].longValue() +
          v.asInstanceOf[java.lang.Integer].longValue())
    }
}
