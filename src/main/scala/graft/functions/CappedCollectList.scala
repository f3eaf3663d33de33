package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Size-bounded collect_list as a typed Aggregator: the buffer never grows
  * past `cap`, so the bound holds DURING accumulation — unlike
  * `slice(collect_list(...), 1, cap)`, which materializes the unbounded
  * list first and only trims the final result (the SURVEY §7.4.3 OOM
  * hazard for hot keys at 100 TB).
  *
  * Merge keeps the lexicographically-smallest `cap` elements (sorted
  * semantics) so results are deterministic regardless of partitioning.
  */
class CappedCollectList[T: Ordering](cap: Int)(implicit enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(cap > 0, "cap must be positive")

  override def zero: Seq[T] = Vector.empty

  private def bound(s: Seq[T]): Seq[T] =
    if (s.size <= cap) s else s.sorted.take(cap)

  override def reduce(b: Seq[T], a: T): Seq[T] = bound(b :+ a)

  override def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = bound(b1 ++ b2)

  override def finish(r: Seq[T]): Seq[T] = r.sorted

  override def bufferEncoder: Encoder[Seq[T]] = enc
  override def outputEncoder: Encoder[Seq[T]] = enc
}

object CappedCollectList {
  /** Capped sorted string list for typed aggregation:
    * `ds.groupByKey(...).agg(CappedCollectList.strings(100))`.
    */
  def strings(cap: Int): TypedColumn[String, Seq[String]] = {
    implicit val enc: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    new CappedCollectList[String](cap).toColumn
  }
}
